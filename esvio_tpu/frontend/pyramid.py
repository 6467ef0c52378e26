"""Image pyramids + derivative images for pyramidal LK (pure JAX).

Equivalent role to OpenCV buildOpticalFlowPyramid used by the reference
(feature_tracker.cpp:185): 5-tap Gaussian pyrDown and Scharr derivatives,
expressed as depthwise convolutions so XLA can fuse/tile them.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# kernels as NUMPY constants: their taps become compile-time scalars in the
# unrolled shifted-add convolution below
_GAUSS5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
# Scharr 3×3 (OpenCV cv::Scharr as used inside calcOpticalFlowPyrLK); the
# LK implementation scales by 1/32 when building Ix/Iy
_SCHARR_D = np.array([-1.0, 0.0, 1.0])
_SCHARR_S = np.array([3.0, 10.0, 3.0])


def _sep_conv2d(img, ky, kx):
    """Separable 2-D convolution with edge replication, (H, W) float.

    Unrolled shifted-adds (kernels are 3/5 taps): pure slice+fma chains that
    XLA fuses into one vectorized pass — per-row `jnp.convolve` lowers to
    per-lane loops on TPU and was ~70 ms per pyramid build."""
    H, W = img.shape
    ky = np.asarray(ky, np.float64)
    kx = np.asarray(kx, np.float64)
    py = len(ky) // 2
    px = len(kx) // 2
    pad = jnp.pad(img, ((py, py), (px, px)), mode="edge")
    out = jnp.zeros((H, W + 2 * px), img.dtype)
    for k in range(len(ky)):
        if ky[k] == 0.0:
            continue
        out = out + float(ky[k]) * jax.lax.dynamic_slice(
            pad, (k, 0), (H, W + 2 * px))
    out2 = jnp.zeros((H, W), img.dtype)
    for k in range(len(kx)):
        if kx[k] == 0.0:
            continue
        out2 = out2 + float(kx[k]) * jax.lax.dynamic_slice(
            out, (0, k), (H, W))
    return out2


def pyr_down(img):
    """Gaussian blur + 2× decimation (cv::pyrDown semantics)."""
    g = _GAUSS5.astype(img.dtype)
    return _sep_conv2d(img, g, g)[::2, ::2]


def build_pyramid(img, levels: int) -> List[jnp.ndarray]:
    """Return [level0 (full res), level1, ...] — `levels` entries."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_derivatives(img) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Ix, Iy) with the 1/32 normalization used by OpenCV's LK."""
    d = _SCHARR_D.astype(img.dtype)
    s = _SCHARR_S.astype(img.dtype)
    ix = _sep_conv2d(img, s, d) / 32.0
    iy = _sep_conv2d(img, d, s) / 32.0
    return ix, iy


def build_lk_pyramid(img, levels: int):
    """Pyramid of (image,) levels for LK tracking.

    Gradients are computed in-patch inside lk._track_level (identical taps
    on identical data for every interior window) — building full-size
    Scharr images here doubled the pyramid cost for data LK reads only
    inside per-feature patches (measured 4.4 ms/camera on TPU)."""
    return [(lvl_img,) for lvl_img in build_pyramid(img, levels)]
