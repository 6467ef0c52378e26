"""Driver for the 2-process jax.distributed CPU test (one rank per process).

Usage: python tools/_multihost_driver.py RANK NPROC PORT LOCAL_DEVICES

Initializes the coordinator, builds the hybrid ("dp", "lm") mesh with "lm"
inside the process (ICI analog) and "dp" across processes (DCN analog), runs
the landmark-sharded distributed BA, and prints one JSON line with the
per-window costs plus the single-device reference costs for parity checking.
"""
import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    local = int(sys.argv[4])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={local}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from esvio_tpu.dist import multihost
    ok = multihost.initialize(f"localhost:{port}", nproc, rank)
    assert ok
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == local
    assert jax.device_count() == nproc * local

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from __graft_entry__ import _make_problem
    from esvio_tpu.dist.distributed_ba import make_sharded_solver
    from esvio_tpu.solver.gauss_newton import solve_window

    mesh = multihost.make_hybrid_mesh(lm=local)   # dp spans the 2 processes
    assert mesh.shape["dp"] == nproc and mesh.shape["lm"] == local

    B = nproc   # one window per dp shard
    args = _make_problem(jnp.float32, L_img=8, L_evt=8 * local, batch=B)
    solver = make_sharded_solver(mesh, iters=4)
    out = solver(*args)
    costs = np.asarray(multihost_utils.process_allgather(
        out[3], tiled=True)).reshape(B, -1)

    # single-device reference on the same problems (local replay)
    ref = []
    for b in range(B):
        one = jax.tree_util.tree_map(lambda x, b=b: x[b], args[:6])
        r = solve_window(*one, args[6], iters=4)
        ref.append(np.asarray(r[3]))
    ref = np.stack(ref)

    rel = float(np.max(np.abs(costs - ref) / np.maximum(np.abs(ref), 1e-9)))
    print(json.dumps({
        "rank": rank, "processes": jax.process_count(),
        "devices": jax.device_count(), "mesh": dict(mesh.shape),
        "costs": costs[:, -1].tolist(), "ref_costs": ref[:, -1].tolist(),
        "max_rel_diff": rel, "ok": bool(rel < 5e-3),
    }), flush=True)


if __name__ == "__main__":
    main()
