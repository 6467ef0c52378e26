"""Batched fundamental-matrix RANSAC (8-point) — replaces cv::findFundamentalMat.

The reference prunes temporal tracks with FM-RANSAC on points mapped into a
virtual f=460 image (feature_tracker.cpp:910-947).  Here all hypotheses are
evaluated at once: K random 8-tuples → batched SVD null-vectors → rank-2
projection → symmetric epipolar distance scoring, all under vmap (no host
loop, fixed shapes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

FOCAL_VIRTUAL = 460.0  # FOCAL_LENGTH in feature_tracker parameters.cpp


def _normalize_pts(pts, valid):
    """Hartley normalization over valid points: translate to centroid, scale √2."""
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / n
    d = jnp.linalg.norm(pts - mean, axis=-1)
    scale = jnp.sqrt(2.0) / jnp.maximum(
        jnp.sum(jnp.where(valid, d, 0.0)) / n, 1e-9
    )
    T = jnp.array(
        [[scale, 0.0, -scale * mean[0]],
         [0.0, scale, -scale * mean[1]],
         [0.0, 0.0, 1.0]], dtype=pts.dtype
    )
    return (pts - mean) * scale, T


def _eight_point(p1, p2):
    """F from 8 correspondences (rows of p1/p2 are (x, y)). Returns (3,3)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=-1,
    )
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    # rank-2 projection
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return u @ jnp.diag(s) @ vt2


def _epipolar_dist2(F, p1, p2):
    """Symmetric squared point-line distance (OpenCV FM_RANSAC error)."""
    ones = jnp.ones_like(p1[:, :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    l2 = h1 @ F.T       # epipolar line in image 2
    l1 = h2 @ F         # epipolar line in image 1
    num = jnp.sum(h2 * l2, axis=-1) ** 2
    d2 = num / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = num / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    return jnp.maximum(d1, d2)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def fundamental_ransac(key, pts1, pts2, valid, threshold: float = 1.0,
                       num_hypotheses: int = 256):
    """RANSAC inlier mask for correspondences pts1 ↔ pts2.

    Args:
      key: PRNG key.
      pts1, pts2: (N, 2) pixel coordinates (virtual-focal mapped by caller).
      valid: (N,) bool.
      threshold: inlier distance in pixels (reference F_THRESHOLD).

    Returns:
      (inliers (N,) bool, best_F (3,3))  — invalid lanes are False.
    """
    N = pts1.shape[0]
    dtype = pts1.dtype

    n1, T1 = _normalize_pts(pts1, valid)
    n2, T2 = _normalize_pts(pts2, valid)

    # compress valid indices to the front so uniform sampling hits real points
    order = jnp.argsort(~valid, stable=True)
    n_valid = jnp.sum(valid)
    draws = jax.random.randint(
        key, (num_hypotheses, 8), 0, jnp.maximum(n_valid, 8)
    )
    sample_idx = order[draws]  # (K, 8)

    def one_hypothesis(idx):
        F = _eight_point(n1[idx], n2[idx])
        d2 = _epipolar_dist2(F, n1, n2)
        return F, d2

    Fs, d2s = jax.vmap(one_hypothesis)(sample_idx)

    # threshold must be de-normalized per image scale; evaluate in original
    # pixel frame instead: F_px = T2ᵀ F T1, distances on raw pts
    F_px = jnp.einsum("ji,kjl,lm->kim", T2, Fs, T1)
    d2_px = jax.vmap(lambda F: _epipolar_dist2(F, pts1, pts2))(F_px)
    inl = (d2_px < threshold * threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    return inl[best], F_px[best]
