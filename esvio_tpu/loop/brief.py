"""BRIEF-256 descriptors + MXU Hamming matching.

Replaces DVision::BRIEF + the Hamming searches in KeyFrame
(/root/reference/pose_graph/src/keyframe.cpp:116-161, searchInAera :183-234,
threshold 80).  TPU-first design decisions:

  * the test-pair pattern is generated from a fixed seed (the reference ships
    brief_pattern.yml; any fixed pattern works as long as it is consistent);
  * descriptors are stored as ±1 int8 vectors, so a whole keyframe-vs-keyframe
    match is ONE 256-dim matmul on the MXU: hamming = (256 − A·Bᵀ) / 2 — no
    bit twiddling, no per-descriptor loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BRIEF_BITS = 256
PATCH = 24  # half-size of sampling window (DVision uses 48×48 smoothed patch)

_rng = np.random.default_rng(42)
# gaussian test-pair pattern (σ = PATCH/2, clipped), like BRIEF-GIII
_PAT_A = np.clip(_rng.normal(0, PATCH / 2, (BRIEF_BITS, 2)), -PATCH, PATCH - 1)
_PAT_B = np.clip(_rng.normal(0, PATCH / 2, (BRIEF_BITS, 2)), -PATCH, PATCH - 1)
PATTERN_A = _PAT_A.astype(np.float32)
PATTERN_B = _PAT_B.astype(np.float32)


def _smooth(img):
    """Box blur ≈ the gaussian smoothing DVision applies before sampling."""
    k = jnp.ones((5,), img.dtype) / 5.0
    img = jnp.pad(img, ((2, 2), (2, 2)), mode="edge")
    img = jax.vmap(lambda r: jnp.convolve(r, k, mode="valid"))(img)
    img = jax.vmap(lambda c: jnp.convolve(c, k, mode="valid"),
                   in_axes=1, out_axes=1)(img)
    return img


def _bilinear(img, ys, xs):
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    return (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x0 + 1] * (1 - fy) * fx
            + img[y0 + 1, x0] * fy * (1 - fx) + img[y0 + 1, x0 + 1] * fy * fx)


@jax.jit
def describe(img, xy, valid):
    """BRIEF descriptors at keypoints.

    img: (H, W) grayscale; xy: (N, 2) pixel coords.
    Returns (N, 256) int8 in {−1, +1} (invalid rows are +1s).
    """
    sm = _smooth(img.astype(jnp.float32))
    pa = jnp.asarray(PATTERN_A)
    pb = jnp.asarray(PATTERN_B)

    ax = xy[:, None, 0] + pa[None, :, 0]
    ay = xy[:, None, 1] + pa[None, :, 1]
    bx = xy[:, None, 0] + pb[None, :, 0]
    by = xy[:, None, 1] + pb[None, :, 1]
    va = _bilinear(sm, ay, ax)
    vb = _bilinear(sm, by, bx)
    bits = jnp.where(va < vb, 1, -1).astype(jnp.int8)
    return jnp.where(valid[:, None], bits, 1)


@jax.jit
def hamming_matrix(desc_a, desc_b):
    """(Na, Nb) Hamming distances via one MXU matmul."""
    dot = jnp.dot(desc_a.astype(jnp.float32), desc_b.astype(jnp.float32).T,
                  preferred_element_type=jnp.float32)
    return 0.5 * (BRIEF_BITS - dot)


@functools.partial(jax.jit, static_argnames=("max_dist",))
def match(desc_a, valid_a, desc_b, valid_b, max_dist: int = 80):
    """Best-match indices a→b under the Hamming gate (searchInAera semantics:
    nearest neighbour, distance < 80).  Returns (idx (Na,), ok (Na,))."""
    d = hamming_matrix(desc_a, desc_b)
    d = jnp.where(valid_b[None, :], d, jnp.inf)
    idx = jnp.argmin(d, axis=1)
    best = jnp.min(d, axis=1)
    ok = valid_a & (best < max_dist)
    return idx, ok
