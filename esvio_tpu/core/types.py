"""Shared pytree dataclasses used across subsystems (static-shape design).

JAX requires static shapes under jit, so every variable-size structure in the
reference (event packets, feature books, per-feature track lists) becomes a
fixed-capacity array + validity mask here.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Pose:
    """SE(3) pose: translation + unit quaternion (w, x, y, z)."""

    p: jnp.ndarray  # (..., 3)
    q: jnp.ndarray  # (..., 4)


def identity_pose(dtype=jnp.float32) -> Pose:
    return Pose(p=jnp.zeros(3, dtype), q=jnp.array([1.0, 0, 0, 0], dtype))
