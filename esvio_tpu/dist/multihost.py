"""Multi-host launch glue: jax.distributed init + DCN-aware mesh construction.

The reference's communication backbone is single-machine ROS pub/sub
(SURVEY.md §5.8); the TPU-native equivalent scales across hosts with
`jax.distributed` + a hybrid ICI/DCN mesh:

  * axis "dp" (outer, across hosts over DCN): independent sequences/windows —
    embarrassingly parallel, only the final trajectory gather crosses DCN;
  * axis "lm" (inner, within a slice over ICI): landmark-sharded Schur BA
    (dist/distributed_ba.py) — its psum must ride ICI, never DCN.

Launch (one process per host, same command everywhere):

    python -m esvio_tpu.dist.multihost --coordinator HOST0:1234 \
        --num-processes N --process-id $RANK  [--selftest]

or from SLURM/GKE, just call `initialize()` (jax auto-detects the cluster).
On a single host this module degrades to the local mesh (no-op init), so the
same pipeline code runs everywhere.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from esvio_tpu.dist.sharding import make_mesh


def initialize(coordinator: str = None, num_processes: int = None,
               process_id: int = None):
    """jax.distributed.initialize with explicit or auto-detected topology.

    Call once per process BEFORE any other jax API touches the backend.
    No-op when running single-process (num_processes in (None, 1))."""
    if num_processes in (None, 1) and coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_processes,
        process_id=process_id)
    return True


def make_hybrid_mesh(lm: int = None) -> Mesh:
    """("dp", "lm") mesh laid out so "lm" stays INSIDE each process's local
    devices (ICI) and "dp" spans processes (DCN).

    `jax.devices()` orders devices by process, so reshaping to
    (n_processes·per_proc/lm, lm) with lm ≤ devices-per-process keeps every
    lm-group within one host's slice — the collectives of the landmark-
    sharded BA never touch DCN (the scaling-book recipe: innermost mesh axes
    ↔ fastest interconnect)."""
    devs = jax.devices()
    per_proc = max(jax.local_device_count(), 1)
    if lm is None:
        lm = per_proc
    assert per_proc % lm == 0, \
        f"lm={lm} must divide local device count {per_proc} (ICI-only psum)"
    dp = len(devs) // lm
    dev = np.asarray(devs).reshape(dp, lm)
    return Mesh(dev, ("dp", "lm"))


def selftest(mesh: Mesh = None):
    """One distributed-BA solve on the hybrid mesh; every process must print
    the same cost vector (the reduced system is replicated by psum)."""
    import jax.numpy as jnp
    from __graft_entry__ import _make_problem
    from esvio_tpu.dist.distributed_ba import make_sharded_solver

    mesh = mesh or make_hybrid_mesh()
    dp = mesh.shape["dp"]
    lm = mesh.shape["lm"]
    args = _make_problem(jnp.float32, L_img=8, L_evt=8 * lm, batch=dp)
    solver = make_sharded_solver(mesh, iters=4)
    out = solver(*args)
    costs = np.asarray(out[3])
    print(f"[proc {jax.process_index()}] mesh dp={dp} lm={lm} "
          f"costs={costs[:, -1]}")
    return costs


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--lm", type=int, default=None)
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args(argv)
    initialize(args.coordinator, args.num_processes, args.process_id)
    if args.selftest:
        selftest(make_hybrid_mesh(args.lm))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
