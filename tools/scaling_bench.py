"""Scaling-efficiency harness (VERDICT r3 #5): solves/s vs mesh shape.

Two parts:
  A. dp×lm mesh sweep of the distributed Schur BA solver
     (dist/distributed_ba.make_sharded_solver) on the 8-device virtual CPU
     mesh.  CPU wall-clock is NOT a TPU prediction — what it measures is the
     SHAPE of scaling (collective + partitioning overhead vs per-shard
     compute) so regressions in the sharded path show up as curve changes.
  B. single-chip dp-batch sweep (vmap B = 1..16) on whatever the default
     backend is (the real TPU under axon) — the measured throughput curve
     the multi-chip story multiplies.

Writes SCALING_r{N}.json at the repo root:
    python tools/scaling_bench.py [--round N] [--cpu-only|--tpu-only]

The BASELINE.md target (≥0.8 scaling efficiency at ≥2 hosts) is asserted
against part A's dp-scaling on the virtual mesh and re-checked on real
hardware the day multiple chips exist — dryrun_multichip prints per-step
wall time for exactly that purpose.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(tree):
    import numpy as np
    import jax
    return float(np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[0])


def cpu_mesh_sweep():
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from __graft_entry__ import _make_problem
    from esvio_tpu.dist import distributed_ba, sharding

    shapes = [(1, 1), (2, 1), (4, 1), (8, 1), (1, 2), (1, 4), (2, 2),
              (2, 4), (4, 2)]
    out = []
    for dp, lm in shapes:
        if dp * lm > len(jax.devices()):
            continue
        mesh = sharding.make_mesh(dp=dp, lm=lm,
                                  devices=jax.devices()[:dp * lm])
        solver = distributed_ba.make_sharded_solver(mesh, iters=8)
        args = _make_problem(jnp.float32, L_img=64, L_evt=128, batch=dp)
        o = solver(*args)
        _sync(o[3])
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            o = solver(*args)
        _sync(o[3])
        dt = (time.perf_counter() - t0) / reps
        out.append(dict(dp=dp, lm=lm, devices=dp * lm,
                        solves_per_sec=round(dp / dt, 2),
                        ms_per_step=round(dt * 1000, 2)))
        print(f"cpu mesh dp={dp} lm={lm}: {dp/dt:7.2f} solves/s "
              f"({dt*1000:.1f} ms)", file=sys.stderr, flush=True)
    # dp-scaling efficiency vs the (1,1) mesh
    base = next(r for r in out if r["dp"] == 1 and r["lm"] == 1)
    for r in out:
        r["dp_scaling_eff"] = round(
            r["solves_per_sec"] / (base["solves_per_sec"] * r["dp"]), 3)
    return out


def tpu_batch_sweep():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _make_problem
    from esvio_tpu.solver.gauss_newton import solve_window

    out = []
    t1 = None
    for B in (1, 2, 4, 8, 16):
        args = _make_problem(jnp.float32, L_img=64, L_evt=128, batch=B)
        f = jax.jit(jax.vmap(
            lambda s, bi, be, pre, iv, pr, g: solve_window(
                s, bi, be, pre, iv, pr, g, iters=8)[3],
            in_axes=(0, 0, 0, 0, 0, 0, None)))
        o = f(*args)
        _sync(o)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*args)
        _sync(o)
        dt = (time.perf_counter() - t0) / reps
        if t1 is None:
            t1 = dt
        out.append(dict(batch=B, solves_per_sec=round(B / dt, 1),
                        ms=round(dt * 1000, 2),
                        per_replica_eff=round(t1 * B / dt / B, 3)))
        print(f"tpu dp-batch B={B}: {B/dt:7.1f} solves/s ({dt*1000:.2f} ms)",
              file=sys.stderr, flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--cpu-only", action="store_true")
    ap.add_argument("--tpu-only", action="store_true")
    args = ap.parse_args()

    result = {"round": args.round}
    if not args.tpu_only:
        # NOTE: the CPU sweep must run in a process where jax has not been
        # initialized on another backend — run with --cpu-only from a fresh
        # interpreter when in doubt.
        result["cpu_virtual_mesh"] = cpu_mesh_sweep()
    if not args.cpu_only:
        import jax
        result["backend"] = jax.default_backend()
        result["tpu_dp_batch"] = tpu_batch_sweep()

    path = os.path.join(os.path.dirname(__file__), "..",
                        f"SCALING_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
