"""Mesh construction + sharding helpers (jax.sharding / shard_map).

The reference's "distribution" is 4 single-machine ROS processes (SURVEY §2.6);
the TPU-native framework instead scales with a device mesh:

  * axis "dp" — data parallel over independent windows/sequences
  * axis "lm" — landmark-sharded distributed bundle adjustment (the Schur
    reduction rides `psum` over ICI; see dist/distributed_ba.py)
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_vma=True):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=check_vma)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs, check_vma=True):
        return _shard_map_legacy(f, mesh, in_specs=in_specs, out_specs=out_specs,
                                 check_rep=check_vma)


def make_mesh(dp: int = 1, lm: int = 1, devices=None) -> Mesh:
    """Mesh with (dp, lm) axes; defaults to all available devices."""
    if devices is None:
        devices = jax.devices()
    n = dp * lm
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(dp, lm)
    return Mesh(dev, ("dp", "lm"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
