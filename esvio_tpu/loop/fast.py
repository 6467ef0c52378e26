"""FAST-9/16 corner detection as dense shifted-plane arithmetic (pure JAX).

Replaces the cv::FAST call in KeyFrame::computeBRIEFPoint
(/root/reference/pose_graph/src/keyframe.cpp:133-161, threshold 20): the 16
Bresenham-circle samples become 16 rolled copies of the image; the ≥9
contiguous-run test is an AND-reduction over 9 cyclic shifts — all dense VPU
work, no gathers (same design as events/corners.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# FAST-16 circle offsets (dx, dy), standard Bresenham r=3 ordering
_CIRCLE = np.array(
    [[0, -3], [1, -3], [2, -2], [3, -1], [3, 0], [3, 1], [2, 2], [1, 3],
     [0, 3], [-1, 3], [-2, 2], [-3, 1], [-3, 0], [-3, -1], [-2, -2], [-1, -3]],
    dtype=np.int32,
)
_ARC = 9


@functools.partial(jax.jit, static_argnames=("threshold",))
def fast_score(img, threshold: int = 20):
    """(H, W) FAST-9 corner score map (0 where not a corner).

    Score = max over valid arcs of the minimal |difference| in the arc
    (the OpenCV corner strength up to tie-breaking).
    """
    dtype = img.dtype
    planes = jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1))
         for dx, dy in _CIRCLE], axis=0)  # (16, H, W)
    diff = planes - img[None, :, :]
    bright = diff > threshold
    dark = diff < -threshold

    def run_scores(mask, mag):
        # for each arc start i: all 9 of positions i..i+8 set → arc valid;
        # arc score = min magnitude over the 9 positions
        best = jnp.zeros_like(img)
        for i in range(16):
            ok = jnp.ones_like(mask[0])
            m = jnp.full_like(img, jnp.inf)
            for k in range(_ARC):
                j = (i + k) % 16
                ok = ok & mask[j]
                m = jnp.minimum(m, mag[j])
            best = jnp.maximum(best, jnp.where(ok, m, 0.0))
        return best

    score = jnp.maximum(run_scores(bright, diff), run_scores(dark, -diff))
    # kill borders (circle radius 3)
    H, W = img.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inside = (yy >= 3) & (yy < H - 3) & (xx >= 3) & (xx < W - 3)
    return jnp.where(inside, score, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "max_corners"))
def detect_fast(img, threshold: int = 20, max_corners: int = 512):
    """Top-K FAST corners with 3×3 non-maximum suppression.

    Returns (xy (K, 2) float, score (K,), valid (K,) bool).
    """
    score = fast_score(img, threshold)
    # 3×3 NMS via max-pool comparison
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    is_max = (score >= neigh) & (score > 0)
    flat = jnp.where(is_max, score, 0.0).reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_corners)
    W = img.shape[1]
    xy = jnp.stack([(idx % W).astype(img.dtype), (idx // W).astype(img.dtype)],
                   axis=-1)
    return xy, vals, vals > 0
