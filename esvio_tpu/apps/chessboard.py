"""Chessboard corner detection for the calibration tool.

TPU-native replacement for the reference's Chessboard.cc (1,982 LoC of
OpenCV-style quad decomposition, camera_model/src/chessboard/Chessboard.cc):
instead of binarize→find-quads→assemble, detect the X-shaped saddle points
directly with a vectorized correlation bank + local-maximum + sub-pixel
refinement, then order them into the (rows, cols) grid by projecting onto
the two dominant lattice directions.  Everything but the final ordering is
jit-compiled array code.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _saddle_response(img: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """X-corner response: correlation with two phase-shifted checkerboard
    templates over a disc (the classic "ChESS"-style detector), max of the
    two polarities, zero at plain edges/corners of single squares."""
    r = radius
    # template masks are compile-time constants (numpy, not traced)
    off = np.arange(-r, r + 1)
    oy, ox = np.meshgrid(off, off, indexing="ij")
    disc = ((oy * oy + ox * ox) <= r * r) & ((oy != 0) | (ox != 0))
    ang = np.arctan2(oy.astype(np.float64), ox.astype(np.float64))
    # checkerboard sign patterns rotated 45° apart
    s1 = np.where(disc, np.sign(np.cos(2 * ang)), 0.0)
    s2 = np.where(disc, np.sign(np.sin(2 * ang)), 0.0)

    H, W = img.shape
    pad = jnp.pad(img, r, mode="edge")
    r1 = jnp.zeros_like(img)
    r2 = jnp.zeros_like(img)
    n = float(disc.sum())
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            if not disc[dy, dx]:
                continue
            w = jax.lax.dynamic_slice(pad, (dy, dx), (H, W))
            r1 += w * float(s1[dy, dx])
            r2 += w * float(s2[dy, dx])
    return jnp.maximum(jnp.abs(r1), jnp.abs(r2)) / n


@functools.partial(jax.jit, static_argnames=("max_corners", "radius"))
def detect_saddles(img, max_corners: int = 128, radius: int = 4):
    """(H, W) image → (xy (N, 2), score (N,), valid (N,)) saddle points with
    3×3 non-max suppression and quadratic sub-pixel refinement."""
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    resp = _saddle_response(img, radius)
    pad = jnp.pad(resp, 1, mode="constant", constant_values=-1.0)
    neigh = jnp.stack([
        jax.lax.dynamic_slice(pad, (dy, dx), (H, W))
        for dy in range(3) for dx in range(3) if not (dy == 1 and dx == 1)])
    is_max = (resp > neigh.max(0)) & (resp > 0.2 * resp.max())
    flat = jnp.where(is_max, resp, 0.0).reshape(-1)
    score, idx = jax.lax.top_k(flat, max_corners)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    valid = score > 0.0

    # sub-pixel: 1D quadratic fits along x and y on the response surface
    yc = jnp.clip(idx // W, 1, H - 2)
    xc = jnp.clip(idx % W, 1, W - 2)
    c = resp[yc, xc]
    dx = (resp[yc, xc + 1] - resp[yc, xc - 1]) * 0.5
    dxx = resp[yc, xc + 1] + resp[yc, xc - 1] - 2 * c
    dy = (resp[yc + 1, xc] - resp[yc - 1, xc]) * 0.5
    dyy = resp[yc + 1, xc] + resp[yc - 1, xc] - 2 * c
    sx = jnp.where(jnp.abs(dxx) > 1e-9, -dx / dxx, 0.0)
    sy = jnp.where(jnp.abs(dyy) > 1e-9, -dy / dyy, 0.0)
    xs = xs + jnp.clip(sx, -0.5, 0.5)
    ys = ys + jnp.clip(sy, -0.5, 0.5)
    return jnp.stack([xs, ys], -1), score, valid


def order_grid(xy, valid, rows: int, cols: int, score=None):
    """Order detected saddles into a (rows·cols, 2) boardrow-major grid.

    Host-side (runs once per calibration view): take the rows·cols strongest
    saddles (true X-corners respond markedly stronger than boundary
    T-junctions), estimate the two lattice directions, project corners onto
    them, and sort by (row, col) rank.  Returns (grid_xy, ok)."""
    valid = np.asarray(valid)
    xy = np.asarray(xy)[valid]
    n = rows * cols
    if len(xy) < n:
        return None, False
    if score is not None:
        sc = np.asarray(score)[valid]
        xy = xy[np.argsort(-sc)[:n]]
    elif len(xy) > n:
        return None, False
    # nearest-neighbor displacement vectors → dominant lattice direction.
    # Neighbors lie along BOTH lattice axes (90° apart): fold angles mod π/2
    # so they vote for one common angle, on the circle (wrap-around safe).
    d2 = np.sum((xy[:, None] - xy[None, :]) ** 2, -1)
    np.fill_diagonal(d2, np.inf)
    nn = xy[np.argmin(d2, 1)] - xy
    ang4 = 4.0 * np.arctan2(nn[:, 1], nn[:, 0])
    a0 = np.arctan2(np.sin(ang4).mean(), np.cos(ang4).mean()) / 4.0
    u = np.array([np.cos(a0), np.sin(a0)])
    v = np.array([-u[1], u[0]])
    pu = xy @ u
    pv = xy @ v
    # rank rows by v-projection into `rows` clusters, then columns by u
    row_rank = np.argsort(np.argsort(pv)) // cols
    order = np.lexsort((pu, row_rank))
    grid = xy[order]
    # sanity: each row strictly increasing in u
    for r_ in range(rows):
        if not np.all(np.diff(grid[r_ * cols:(r_ + 1) * cols] @ u) > 0):
            return None, False
    return grid, True


def find_chessboard(img, rows: int, cols: int, radius: int = 4):
    """Chessboard.cc analog: (H, W) image + inner-corner grid size →
    (corners (rows·cols, 2) row-major, found)."""
    xy, score, valid = detect_saddles(
        img, max_corners=2 * rows * cols, radius=radius)
    return order_grid(np.asarray(xy), np.asarray(valid), rows, cols,
                      score=np.asarray(score))
