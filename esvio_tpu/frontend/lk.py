"""Pyramidal Lucas-Kanade optical flow, batched over features (pure JAX).

TPU-native replacement for the cv::calcOpticalFlowPyrLK calls in the
reference front end (feature_tracker.cpp:185,410,490): Bouguet's algorithm —
template window + Scharr gradients from the previous image, Gauss-Newton
iterations sampling the current image bilinearly — batched over all features
with a fixed iteration count and convergence masking (static shapes).

TPU mapping: random-access bilinear gathers scalarize on TPU (measured
~4 ms per (256, 441) gather), so sampling is restructured MXU-first:
one vmapped `dynamic_slice` per level pulls a fixed-size patch around each
feature (block copies, fast), and every bilinear resample inside the GN
loop becomes two small batched matmuls against separable hat-function
weight matrices — pure MXU work, no gathers in the hot loop.

Defaults mirror the reference: 21×21 window, 4 pyramid levels (maxLevel=3),
OpenCV TermCriteria (30, 0.01).  Forward-backward checking is done by the
caller by running `lk_track` twice (feature_tracker.cpp:191-196).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

WIN = 21
HALF = WIN // 2
PATCH = 48              # per-feature patch side (tracking range ≈ ±13 px/level)
_MIN_EIG_THRESH = 1e-4  # OpenCV minEigThreshold (per-pixel normalized)


def _extract_patches(img, oy, ox, Sy, Sx):
    """(N,) int origins → (N, Sy, Sx) patches via vmapped dynamic_slice."""
    return jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(img, (y, x), (Sy, Sx)))(oy, ox)


def _scharr_patches(P):
    """Batched 3×3 Scharr (∂x, ∂y, OpenCV LK's 1/32 normalization) computed
    directly on (N, Sy, Sx) patches with edge replication — same taps on the
    same data as a full-image Scharr for every window ≥ 1 px inside the
    patch (templates are patch-centered, so always), at patch cost instead
    of one full-size derivative image pair per pyramid level."""
    Pp = jnp.pad(P, ((0, 0), (1, 1), (1, 1)), mode="edge")
    rows = 3.0 * Pp[:, :-2, :] + 10.0 * Pp[:, 1:-1, :] + 3.0 * Pp[:, 2:, :]
    ix = (rows[:, :, 2:] - rows[:, :, :-2]) / 32.0
    cols = 3.0 * Pp[:, :, :-2] + 10.0 * Pp[:, :, 1:-1] + 3.0 * Pp[:, :, 2:]
    iy = (cols[:, 2:, :] - cols[:, :-2, :]) / 32.0
    return ix, iy


def _hat_sample(patch, ry, rx):
    """Bilinear resample inside patches via separable hat-weight matmuls.

    patch: (N, Sy, Sx); ry/rx: (N, WIN) float positions in patch coords
    (clamped to the patch like cv borderValue=replicate).
    Returns (N, WIN, WIN) windows [row i = y, col j = x].
    """
    N, Sy, Sx = patch.shape
    dtype = patch.dtype
    ry = jnp.clip(ry, 0.0, Sy - 1.0)
    rx = jnp.clip(rx, 0.0, Sx - 1.0)
    sy = jnp.arange(Sy, dtype=dtype)
    sx = jnp.arange(Sx, dtype=dtype)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry[:, :, None] - sy))   # (N, 21, Sy)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx[:, :, None] - sx))   # (N, 21, Sx)
    V = jnp.einsum("nis,nst->nit", Wy, patch)                    # (N, 21, Sx)
    return jnp.einsum("nit,njt->nij", V, Wx)                     # (N, 21, 21)


def _track_level(img_prev, img_cur, pts_prev, guess,
                 iters, eps, check_status=True, active=None):
    """One pyramid level of LK for ALL features. Returns (new_guess, ok).

    Status (gradient conditioning + borders) is only enforced at level 0,
    matching OpenCV's behavior of tolerating clipped windows at coarse levels.
    `active` lanes start converged=False; padding lanes start converged so the
    early-exit while_loop is paced by real features only (a padding lane at
    (0, 0) oscillates forever and would otherwise force all `iters` rounds).
    """
    H, W = img_prev.shape
    dtype = img_prev.dtype
    N = pts_prev.shape[0]
    Sy = min(PATCH, H)
    Sx = min(PATCH, W)
    off = jnp.arange(-HALF, HALF + 1, dtype=dtype)

    # ---- template windows + gradients (prev image, fixed) -----------------
    px, py = pts_prev[:, 0], pts_prev[:, 1]
    oy_t = jnp.clip(jnp.floor(py).astype(jnp.int32) - Sy // 2, 0, H - Sy)
    ox_t = jnp.clip(jnp.floor(px).astype(jnp.int32) - Sx // 2, 0, W - Sx)
    ry_t = (py - oy_t.astype(dtype))[:, None] + off[None, :]
    rx_t = (px - ox_t.astype(dtype))[:, None] + off[None, :]
    Pp = _extract_patches(img_prev, oy_t, ox_t, Sy, Sx)   # ONE extraction
    Ixp, Iyp = _scharr_patches(Pp)                        # in-patch gradients
    Tp = _hat_sample(Pp, ry_t, rx_t)
    Ix = _hat_sample(Ixp, ry_t, rx_t)
    Iy = _hat_sample(Iyp, ry_t, rx_t)

    g_xx = jnp.sum(Ix * Ix, (1, 2))
    g_xy = jnp.sum(Ix * Iy, (1, 2))
    g_yy = jnp.sum(Iy * Iy, (1, 2))
    det = g_xx * g_yy - g_xy * g_xy
    min_eig = 0.5 * (g_xx + g_yy
                     - jnp.sqrt((g_xx - g_yy) ** 2 + 4.0 * g_xy ** 2))
    ok_grad = (min_eig / (WIN * WIN)) > _MIN_EIG_THRESH
    inv_det = jnp.where(det > 1e-12, 1.0 / jnp.maximum(det, 1e-12), 0.0)

    in_prev = ((px >= HALF) & (px < W - HALF)
               & (py >= HALF) & (py < H - HALF))

    # ---- current-image patches centered on the INITIAL guess --------------
    gx0, gy0 = guess[:, 0], guess[:, 1]
    oy_c = jnp.clip(jnp.floor(gy0).astype(jnp.int32) - Sy // 2, 0, H - Sy)
    ox_c = jnp.clip(jnp.floor(gx0).astype(jnp.int32) - Sx // 2, 0, W - Sx)
    Pc = _extract_patches(img_cur, oy_c, ox_c, Sy, Sx)
    oyf = oy_c.astype(dtype)
    oxf = ox_c.astype(dtype)

    def cond(carry):
        _, converged, it = carry
        return (it < iters) & ~jnp.all(converged)

    def body(carry):
        g, converged, it = carry
        ry = (g[:, 1] - oyf)[:, None] + off[None, :]
        rx = (g[:, 0] - oxf)[:, None] + off[None, :]
        J = _hat_sample(Pc, ry, rx)
        r = J - Tp
        bx = jnp.sum(Ix * r, (1, 2))
        by = jnp.sum(Iy * r, (1, 2))
        dx = -(g_yy * bx - g_xy * by) * inv_det
        dy = -(g_xx * by - g_xy * bx) * inv_det
        delta = jnp.stack([dx, dy], -1)
        new_g = g + delta
        done = jnp.sum(delta * delta, -1) < eps * eps
        g = jnp.where(converged[:, None], g, new_g)
        return g, converged | done, it + 1

    # while_loop: the whole batch usually converges in 5-10 iterations —
    # early exit saves the remaining fixed-iteration work (TermCriteria)
    conv0 = jnp.zeros(N, bool) if active is None else ~active
    guess, _, _ = jax.lax.while_loop(
        cond, body, (guess, conv0, jnp.asarray(0, jnp.int32)))

    in_cur = ((guess[:, 0] >= 0.0) & (guess[:, 0] < W - 1.0)
              & (guess[:, 1] >= 0.0) & (guess[:, 1] < H - 1.0))
    # the GN loop samples inside the patch only; a window that walked out of
    # it read clamped borders, so its result is untrusted
    in_patch = ((guess[:, 0] - oxf >= HALF - 1.0)
                & (guess[:, 0] - oxf <= Sx - HALF)
                & (guess[:, 1] - oyf >= HALF - 1.0)
                & (guess[:, 1] - oyf <= Sy - HALF))
    ok = (ok_grad & in_prev & in_cur & in_patch) | (not check_status)
    return guess, ok


@functools.partial(jax.jit, static_argnames=("iters",))
def lk_track(pyr_prev, pyr_cur, pts_prev, valid, pts_init=None,
             iters: int = 30, eps: float = 0.01):
    """Track features from the previous to the current pyramid.

    Args:
      pyr_prev / pyr_cur: list of (img,) levels (from
        `pyramid.build_lk_pyramid`), level 0 = full resolution.
      pts_prev: (N, 2) float (x, y) at level 0.
      valid: (N,) bool — features to track (padding lanes are skipped).
      pts_init: optional (N, 2) initial guess at level 0 (OPTFLOW_USE_INITIAL_FLOW);
        defaults to pts_prev.
      iters, eps: OpenCV TermCriteria equivalents.

    Returns:
      (pts_out (N, 2), status (N,) bool)
    """
    levels = len(pyr_prev)
    if pts_init is None:
        pts_init = pts_prev
    scale_top = 2.0 ** (levels - 1)
    guess = pts_init / scale_top
    status = jnp.ones(pts_prev.shape[0], bool)

    for lvl in reversed(range(levels)):
        img_p = pyr_prev[lvl][0]
        img_c = pyr_cur[lvl][0]
        if min(img_p.shape) >= WIN:  # skip levels smaller than the window
            s = 2.0 ** lvl
            p_lvl = pts_prev / s
            check = lvl == 0
            new_guess, ok = _track_level(
                img_p, img_c, p_lvl, guess, iters, eps,
                check_status=check, active=valid)
            status = status & ok
            guess = new_guess
        if lvl > 0:
            guess = guess * 2.0

    return guess, status & valid
