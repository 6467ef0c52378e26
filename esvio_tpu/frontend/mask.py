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
