"""Occupancy-mask feature spacing (Event_setMask / setMask equivalents).

The reference keeps features min_dist apart by greedily painting filled
circles into a CV_8U mask in track-length order (feature_tracker.cpp:88-151).
Here the greedy pass is a `lax.fori_loop` over a priority-sorted fixed
capacity array, painting a precomputed disc into a padded boolean grid with
read-modify-write dynamic slices (static shapes, jit-safe).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _disc(radius: int):
    r = jnp.arange(-radius, radius + 1)
    yy, xx = jnp.meshgrid(r, r, indexing="ij")
    return (yy * yy + xx * xx) <= radius * radius


@functools.partial(jax.jit, static_argnames=("height", "width", "min_dist", "max_keep"))
def greedy_spacing(priority, xs, ys, valid, height: int, width: int,
                   min_dist: int, max_keep: int, occupied=None):
    """Greedy min-dist selection.

    Args:
      priority: (N,) float — larger = selected first (reference sorts by
        track count, feature_tracker.cpp:96-99).
      xs, ys: (N,) float pixel positions.
      valid: (N,) bool.
      occupied: optional (H, W) bool initial occupancy (True = blocked).

    Returns:
      (keep (N,) bool, occupied_out (H, W) bool) — keep ⊆ valid, at most
      max_keep features, each at least min_dist from any previously kept.
    """
    N = priority.shape[0]
    r = min_dist
    disc = _disc(r)
    grid = jnp.zeros((height + 2 * r, width + 2 * r), bool)
    if occupied is not None:
        grid = grid.at[r:r + height, r:r + width].set(occupied)

    order = jnp.argsort(jnp.where(valid, -priority, jnp.inf), stable=True)
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, height - 1)

    def body(k, carry):
        grid, keep, kept_count = carry
        i = order[k]
        x = xi[i]
        y = yi[i]
        free = ~grid[y + r, x + r]
        take = free & valid[i] & (kept_count < max_keep)
        patch = jax.lax.dynamic_slice(grid, (y, x), (2 * r + 1, 2 * r + 1))
        patch = patch | (disc & take)
        grid = jax.lax.dynamic_update_slice(grid, patch, (y, x))
        keep = keep.at[i].set(take)
        return grid, keep, kept_count + take.astype(jnp.int32)

    grid, keep, _ = jax.lax.fori_loop(
        0, N, body, (grid, jnp.zeros(N, bool), jnp.asarray(0, jnp.int32))
    )
    return keep, grid[r:r + height, r:r + width]


@functools.partial(jax.jit, static_argnames=("height", "width", "min_dist",
                                             "max_keep", "suppress_iters"))
def grid_spacing(priority, xs, ys, valid, height: int, width: int,
                 min_dist: int, max_keep: int, occupied=None,
                 suppress_iters: int = 16):
    """Parallel (TPU-native) min-dist selection — same contract as
    `greedy_spacing` without its O(N) sequential read-modify-write chain.

    Bucket the frame into min_dist-sized cells; one winner per cell (highest
    priority), then iterated winner-take-all suppression among the 8-cell
    neighborhood (points ≥ 2 cells apart are ≥ min_dist apart by
    construction, so only neighbors can conflict), iterated to a fixed
    point (≤ suppress_iters Jacobi rounds) so A-kills-B-revives-C chains
    resolve exactly like the sequential greedy does among cell winners.
    Everything is scatters/gathers over the candidate axis — no serial
    dependency.

    Guarantees: keep ⊆ valid, |keep| ≤ max_keep, pairwise distance ≥
    min_dist among cell winners at fixed point.  No occupancy prior is
    supported (pass occupied only to `greedy_spacing`).

    Known, intentional deviations from the sequential greedy mask
    (feature_tracker.cpp:123-151):
      * two valid points in the same cell are always reduced to one winner
        even when ≥ min_dist apart (diagonal, up to r·√2) — slightly sparser
        selection than greedy in dense corners;
      * if the Jacobi sweeps hit `suppress_iters` while still oscillating
        (cyclic parallel-MIS conflicts — pathological in practice), the
        pairwise guarantee can be violated for the cycling points.
    """
    N = priority.shape[0]
    r = max(min_dist, 1)
    dtype = priority.dtype
    ncx = -(-width // r)
    ncy = -(-height // r)
    ncell = ncx * ncy

    xi = jnp.clip(xs, 0.0, width - 1.0)
    yi = jnp.clip(ys, 0.0, height - 1.0)
    cx = jnp.clip((xi // r).astype(jnp.int32), 0, ncx - 1)
    cy = jnp.clip((yi // r).astype(jnp.int32), 0, ncy - 1)
    cell = cy * ncx + cx

    # rank = global priority order (stable); lower rank = stronger
    order = jnp.argsort(jnp.where(valid, -priority, jnp.inf), stable=True)
    rank = jnp.zeros((N,), jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32))
    rank = jnp.where(valid, rank, N)

    # per-cell winner by min rank
    cell_best = jnp.full((ncell,), N, jnp.int32).at[cell].min(rank)
    is_winner = valid & (rank == cell_best[cell])
    win_of_cell = jnp.full((ncell,), -1, jnp.int32).at[cell].max(
        jnp.where(is_winner, jnp.arange(N, dtype=jnp.int32), -1))

    if occupied is not None:
        raise NotImplementedError(
            "grid_spacing takes no occupancy prior; use greedy_spacing")

    r2 = float(r * r)

    def sweep(live):
        kill = jnp.zeros((N,), bool)
        idx = jnp.arange(N, dtype=jnp.int32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nx = cx + dx
                ny = cy + dy
                inb = (nx >= 0) & (nx < ncx) & (ny >= 0) & (ny < ncy)
                ncell_i = jnp.clip(ny, 0, ncy - 1) * ncx \
                    + jnp.clip(nx, 0, ncx - 1)
                j = win_of_cell[ncell_i]
                jc = jnp.clip(j, 0, N - 1)
                ok = inb & (j >= 0) & live[jc] & (j != idx)
                d2 = (xi - xi[jc]) ** 2 + (yi - yi[jc]) ** 2
                kill = kill | (ok & (d2 < r2) & (rank[jc] < rank))
        return is_winner & ~kill

    # Jacobi iteration of priority-ordered suppression to a fixed point
    # (parallel maximal-independent-set by priority); at convergence no kept
    # point has a live higher-priority neighbor within r, which IS the
    # pairwise guarantee.  Chains longer than the cap are pathological.
    def cond(carry):
        live, prev, it = carry
        return (it < suppress_iters) & jnp.any(live != prev)

    def body(carry):
        live, _, it = carry
        return sweep(live), live, it + 1

    live, _, _ = jax.lax.while_loop(
        cond, body,
        (sweep(is_winner), is_winner, jnp.asarray(1, jnp.int32)))

    # cap at max_keep by priority
    live_rank = jnp.cumsum(live[order].astype(jnp.int32)) - 1
    keep_sorted = live[order] & (live_rank < max_keep)
    keep = jnp.zeros((N,), bool).at[order].set(keep_sorted)

    occ = jnp.zeros((height, width), bool).at[
        jnp.round(yi).astype(jnp.int32), jnp.round(xi).astype(jnp.int32)
    ].max(keep)
    return keep, occ
