"""CLAHE — contrast-limited adaptive histogram equalization (pure JAX).

Equivalent of the cv::createCLAHE() path the reference enables with
`equalize: 1` (feature_tracker.cpp:375-387; OpenCV defaults clipLimit=40,
tiles 8×8).  Per-tile 256-bin histograms via one-hot reduction, clip +
redistribute, CDF → LUTs, bilinear LUT interpolation — all dense ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BINS = 256


@functools.partial(jax.jit, static_argnames=("tiles", "clip_limit"))
def clahe(img, tiles: int = 8, clip_limit: float = 40.0):
    """img: (H, W) float in [0, 255] (H, W divisible by `tiles` after crop)."""
    H, W = img.shape
    th = H // tiles
    tw = W // tiles
    imgc = jnp.clip(img[: th * tiles, : tw * tiles], 0.0, 255.0)
    q = jnp.round(imgc).astype(jnp.int32)
    tiled = q.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3)  # (ty,tx,th,tw)
    flat = tiled.reshape(tiles * tiles, th * tw)

    hist = jax.vmap(lambda v: jnp.bincount(v, length=BINS))(flat).astype(
        jnp.float32)

    # clip + redistribute (OpenCV semantics: clipLimit scaled by tile size)
    limit = jnp.maximum(clip_limit * (th * tw) / BINS, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / BINS

    cdf = jnp.cumsum(hist, axis=1)
    scale = (BINS - 1.0) / (th * tw)
    luts = (cdf * scale).reshape(tiles, tiles, BINS)

    # bilinear interpolation between the 4 neighboring tile LUTs
    yy = jnp.arange(th * tiles, dtype=img.dtype)
    xx = jnp.arange(tw * tiles, dtype=img.dtype)
    ty = jnp.clip((yy - th / 2) / th, 0.0, tiles - 1.0)
    tx = jnp.clip((xx - tw / 2) / tw, 0.0, tiles - 1.0)
    y0 = jnp.floor(ty).astype(jnp.int32)
    x0 = jnp.floor(tx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, tiles - 1)
    x1 = jnp.minimum(x0 + 1, tiles - 1)
    fy = (ty - y0)[:, None]
    fx = (tx - x0)[None, :]

    qc = q
    v00 = luts[y0[:, None], x0[None, :], qc]
    v01 = luts[y0[:, None], x1[None, :], qc]
    v10 = luts[y1[:, None], x0[None, :], qc]
    v11 = luts[y1[:, None], x1[None, :], qc]
    out = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
           + v10 * fy * (1 - fx) + v11 * fy * fx)
    # paste back into full size (uncropped borders keep original values)
    full = jnp.asarray(img)
    return full.at[: th * tiles, : tw * tiles].set(out.astype(img.dtype))
