"""Shi-Tomasi (min-eigenvalue) corner detection — goodFeaturesToTrack analog.

Replaces cv::goodFeaturesToTrack in the image path
(feature_tracker.cpp:228: quality 0.01, MIN_DIST_IMG spacing): structure
tensor from Sobel gradients box-filtered over a 3×3 window, min-eig response,
quality-level gate, 3×3 NMS + top-K — all dense VPU work.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from esvio_tpu.frontend.pyramid import _sep_conv2d

# numpy constants: _sep_conv2d consumes taps as compile-time scalars, so these
# must NOT become tracers inside jit (a jnp constant would).
_SOBEL_D = np.array([-1.0, 0.0, 1.0]) / 2.0
_SOBEL_S = np.array([1.0, 2.0, 1.0]) / 4.0
_BOX3 = np.ones((3,)) / 3.0


@functools.partial(jax.jit, static_argnames=("max_corners", "quality_level"))
def shi_tomasi(img, max_corners: int = 512, quality_level: float = 0.01):
    """Top-K min-eig corners with quality gate and 3×3 NMS.

    Returns (xy (K, 2), response (K,), valid (K,)).
    """
    dtype = img.dtype
    ix = _sep_conv2d(img, _SOBEL_S.astype(dtype), _SOBEL_D.astype(dtype))
    iy = _sep_conv2d(img, _SOBEL_D.astype(dtype), _SOBEL_S.astype(dtype))
    b = _BOX3.astype(dtype)
    gxx = _sep_conv2d(ix * ix, b, b)
    gxy = _sep_conv2d(ix * iy, b, b)
    gyy = _sep_conv2d(iy * iy, b, b)
    min_eig = 0.5 * (gxx + gyy - jnp.sqrt((gxx - gyy) ** 2 + 4.0 * gxy ** 2))

    H, W = img.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inside = (yy >= 3) & (yy < H - 3) & (xx >= 3) & (xx < W - 3)
    min_eig = jnp.where(inside, min_eig, 0.0)

    neigh = jax.lax.reduce_window(min_eig, -jnp.inf, jax.lax.max,
                                  (3, 3), (1, 1), "SAME")
    is_max = (min_eig >= neigh) & (min_eig > 0)
    resp = jnp.where(is_max, min_eig, 0.0)
    gate = quality_level * jnp.max(resp)
    flat = jnp.where(resp >= gate, resp, 0.0).reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_corners)
    xy = jnp.stack([(idx % W).astype(dtype), (idx // W).astype(dtype)], axis=-1)
    return xy, vals, vals > 0
