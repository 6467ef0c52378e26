"""Pallas TPU kernel for the dense Arc* corner mask.

The XLA formulation (corners.corner_mask) materializes 36 rolled copies of
the SAE in HBM (≈88 MB at 640×480) before the arc test.  This kernel tiles
the SAE into VMEM blocks with a 4-pixel halo (pl.Element windows over a
pre-padded array) and evaluates both Bresenham circles entirely on-chip:
HBM traffic drops to one read of the SAE + one write of the mask, and the
36 "shifts" become static VMEM slices.

Same math as corners._circle_ok (reference: EventDetector::isCorner,
/root/reference/feature_tracker/src/event_detector/event_detector.cc:308-544).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esvio_tpu.events.corners import (
    SMALL_CIRCLE, LARGE_CIRCLE, _SMALL_MIN, _SMALL_MAX, _LARGE_MIN,
    _LARGE_MAX)

PAD = 4                      # halo = max circle radius
TILE_H = 32


def _take_planes(planes, idx):
    """planes[idx[y,x]][y,x] — fully-unrolled one-hot select over a static
    plane list (Mosaic has no 3D gather; this is n 2D selects on the VPU)."""
    out = planes[0]
    for k in range(1, len(planes)):
        out = jnp.where(idx == k, planes[k], out)
    return out


def _newest_segment_size_planes(planes, min_thresh: int):
    """corners._newest_segment_size with the circle axis as a Python list of
    2D planes instead of a stacked trailing axis (same math, same first-max
    tie-breaking; loops fully unrolled, n ≤ 20)."""
    n = len(planes)
    seg_min = planes[0]
    start = jnp.zeros(planes[0].shape, jnp.int32)
    for k in range(1, n):
        upd = planes[k] > seg_min          # strict ⇒ first max wins
        seg_min = jnp.where(upd, planes[k], seg_min)
        start = jnp.where(upd, k, start)

    right = (start + 1) % n
    left = (start - 1 + n) % n
    right_val = _take_planes(planes, right)
    left_val = _take_planes(planes, left)
    right_min = right_val
    left_min = left_val

    def extend(go_right, right, left, right_val, left_val, right_min, left_min):
        new_right = (right + 1) % n
        new_left = (left - 1 + n) % n
        nrv = _take_planes(planes, new_right)
        nlv = _take_planes(planes, new_left)
        right = jnp.where(go_right, new_right, right)
        right_val = jnp.where(go_right, nrv, right_val)
        right_min = jnp.where(go_right, jnp.minimum(right_min, nrv), right_min)
        left = jnp.where(go_right, left, new_left)
        left_val = jnp.where(go_right, left_val, nlv)
        left_min = jnp.where(go_right, left_min, jnp.minimum(left_min, nlv))
        return right, left, right_val, left_val, right_min, left_min

    for _ in range(1, min_thresh):
        go_right = right_val > left_val
        seg_min = jnp.where(go_right, jnp.minimum(seg_min, right_min),
                            jnp.minimum(seg_min, left_min))
        right, left, right_val, left_val, right_min, left_min = extend(
            go_right, right, left, right_val, left_val, right_min, left_min)

    seg_size = jnp.full(planes[0].shape, min_thresh, jnp.int32)
    for i in range(min_thresh, n):
        go_right = right_val > left_val
        ext_val = jnp.where(go_right, right_val, left_val)
        ext_min = jnp.where(go_right, right_min, left_min)
        grow = ext_val >= seg_min
        seg_size = jnp.where(grow, i + 1, seg_size)
        seg_min = jnp.where(grow, jnp.minimum(seg_min, ext_min), seg_min)
        right, left, right_val, left_val, right_min, left_min = extend(
            go_right, right, left, right_val, left_val, right_min, left_min)
    return seg_size


def _circle_ok_planes(planes, min_thresh: int, max_thresh: int):
    n = len(planes)
    size = _newest_segment_size_planes(planes, min_thresh)
    return (size <= max_thresh) | (
        (size >= n - max_thresh) & (size <= n - min_thresh))


def _make_kernel(wp: int):
    """Kernel over a full-width strip: block (TILE_H + 2·PAD, wp + 2·PAD).

    TPU block shapes must have the last dim divisible by 128 or equal to the
    array dim, so only H is Element-windowed (40 % 8 == 0); W uses the whole
    padded row and the dx offsets become static in-VMEM slices."""

    def kernel(in_ref, out_ref):
        blk = in_ref[0]

        def circle_planes(circle):
            planes = []
            for k in range(circle.shape[0]):
                dx = int(circle[k, 0])
                dy = int(circle[k, 1])
                # rolled-plane semantics: out[y, x] = sae[y + dy, x + dx]
                planes.append(blk[PAD + dy: PAD + dy + TILE_H,
                                  PAD + dx: PAD + dx + wp])
            return planes

        ok_s = _circle_ok_planes(circle_planes(SMALL_CIRCLE),
                                 _SMALL_MIN, _SMALL_MAX)
        ok_l = _circle_ok_planes(circle_planes(LARGE_CIRCLE),
                                 _LARGE_MIN, _LARGE_MAX)
        out_ref[0] = (ok_s & ok_l).astype(jnp.uint8)

    return kernel


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def corner_mask_pallas(sae, interpret: bool = False):
    """(2, H, W) float32 SAE → (2, H, W) bool Arc* corner mask."""
    H, W = sae.shape[1:]
    Hp = _round_up(H, TILE_H)
    Wp = _round_up(W, 128)
    padded = jnp.pad(sae, ((0, 0), (PAD, PAD + Hp - H), (PAD, PAD + Wp - W)))
    grid = (2, Hp // TILE_H)
    out = pl.pallas_call(
        _make_kernel(Wp),
        grid=grid,
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(TILE_H + 2 * PAD),
             pl.Element(Wp + 2 * PAD)),
            lambda p, i: (p, i * TILE_H, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, Wp), lambda p, i: (p, i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, Hp, Wp), jnp.uint8),
        interpret=interpret,
    )(padded)
    return out[:, :H, :W].astype(bool)
