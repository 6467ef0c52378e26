"""Pyramidal Lucas-Kanade optical flow, batched over features (pure JAX).

TPU-native replacement for the cv::calcOpticalFlowPyrLK calls in the
reference front end (feature_tracker.cpp:185,410,490): Bouguet's algorithm —
template window + Scharr gradients from the previous image, Gauss-Newton
iterations sampling the current image bilinearly — `vmap`-ed over all
features with a fixed iteration count and convergence masking (static
shapes; no data-dependent control flow).

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
_MIN_EIG_THRESH = 1e-4  # OpenCV minEigThreshold (per-pixel normalized)


def _bilinear(img, ys, xs):
    """Bilinear sample img (H, W) at float coords; clamped at borders."""
    H, W = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0c = jnp.clip(x0, 0, W - 2)
    y0c = jnp.clip(y0, 0, H - 2)
    v00 = img[y0c, x0c]
    v01 = img[y0c, x0c + 1]
    v10 = img[y0c + 1, x0c]
    v11 = img[y0c + 1, x0c + 1]
    return (
        v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx) + v11 * fy * fx
    )


def _window_offsets(dtype):
    r = jnp.arange(-HALF, HALF + 1, dtype=dtype)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return oy.reshape(-1), ox.reshape(-1)


def _track_level(img_prev, ix_prev, iy_prev, img_cur, pt_prev, guess, iters, eps,
                 check_status=True):
    """One pyramid level of LK for a single feature. Returns (new_guess, ok).

    Status (gradient conditioning + border) is only enforced at level 0,
    matching OpenCV's behavior of tolerating clipped windows at coarse levels.
    """
    H, W = img_prev.shape
    dtype = img_prev.dtype
    oy, ox = _window_offsets(dtype)

    ty = pt_prev[1] + oy
    tx = pt_prev[0] + ox
    T = _bilinear(img_prev, ty, tx)
    Ix = _bilinear(ix_prev, ty, tx)
    Iy = _bilinear(iy_prev, ty, tx)

    g_xx = jnp.sum(Ix * Ix)
    g_xy = jnp.sum(Ix * Iy)
    g_yy = jnp.sum(Iy * Iy)
    det = g_xx * g_yy - g_xy * g_xy
    min_eig = 0.5 * (g_xx + g_yy - jnp.sqrt((g_xx - g_yy) ** 2 + 4.0 * g_xy ** 2))
    ok_grad = (min_eig / (WIN * WIN)) > _MIN_EIG_THRESH
    inv_det = jnp.where(det > 1e-12, 1.0 / jnp.maximum(det, 1e-12), 0.0)

    in_prev = (
        (pt_prev[0] >= HALF) & (pt_prev[0] < W - HALF)
        & (pt_prev[1] >= HALF) & (pt_prev[1] < H - HALF)
    )

    def body(_, carry):
        g, converged = carry
        J = _bilinear(img_cur, g[1] + oy, g[0] + ox)
        r = J - T
        bx = jnp.sum(Ix * r)
        by = jnp.sum(Iy * r)
        dx = -(g_yy * bx - g_xy * by) * inv_det
        dy = -(g_xx * by - g_xy * bx) * inv_det
        delta = jnp.stack([dx, dy])
        new_g = g + delta
        done = jnp.sum(delta * delta) < eps * eps
        g = jnp.where(converged, g, new_g)
        return g, converged | done

    guess, _ = jax.lax.fori_loop(0, iters, body, (guess, jnp.asarray(False)))

    in_cur = (
        (guess[0] >= 0.0) & (guess[0] < W - 1.0)
        & (guess[1] >= 0.0) & (guess[1] < H - 1.0)
    )
    ok = (ok_grad & in_prev & in_cur) | jnp.asarray(not check_status)
    return guess, ok


@functools.partial(jax.jit, static_argnames=("iters",))
def lk_track(pyr_prev, pyr_cur, pts_prev, valid, pts_init=None,
             iters: int = 30, eps: float = 0.01):
    """Track features from the previous to the current pyramid.

    Args:
      pyr_prev / pyr_cur: list of (img, ix, iy) per level (from
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
        img_p, ix_p, iy_p = pyr_prev[lvl]
        img_c, _, _ = pyr_cur[lvl]
        if min(img_p.shape) >= WIN:  # skip levels smaller than the window
            s = 2.0 ** lvl
            p_lvl = pts_prev / s
            check = lvl == 0
            track = jax.vmap(
                lambda pp, g: _track_level(
                    img_p, ix_p, iy_p, img_c, pp, g, iters, eps, check_status=check
                )
            )
            new_guess, ok = track(p_lvl, guess)
            status = status & ok
            guess = new_guess
        if lvl > 0:
            guess = guess * 2.0

    return guess, status & valid
