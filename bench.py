"""Benchmark: event front-end throughput + back-end solve latency on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline metric: events/s through the full event front-end compute path
(SAE refractory update → polarity time surface → Arc* corner test), at
DAVIS346 resolution with 128k-event chunks.  Baseline: 10 Mev/s = 5× the
~2 Mev/s real-time stereo DAVIS346 stream the reference must sustain on CPU
(BASELINE.md targets: ≥5× real-time per chip).

Extras report the sliding-window GN solve latency (reference budget: 40 ms,
config/esvio/esvio.yaml:165) and solver iterations/s.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from esvio_tpu.events import sae as sae_mod
    from esvio_tpu.events import corners as cor_mod

    H, W = 260, 346
    E = 1 << 17
    rng = np.random.default_rng(0)

    # realistic event stream: edges sweeping the frame
    t = np.sort(rng.uniform(1.0, 1.05, E)).astype(np.float32)
    x = rng.integers(0, W, E).astype(np.int32)
    y = rng.integers(0, H, E).astype(np.int32)
    p = rng.integers(0, 2, E).astype(np.int32)
    chunk = sae_mod.EventChunk(
        t=jnp.asarray(t), x=jnp.asarray(x), y=jnp.asarray(y),
        p=jnp.asarray(p), valid=jnp.ones(E, bool))
    state = sae_mod.init_sae(H, W)

    @jax.jit
    def frontend(state, chunk, t_now):
        state, _ = sae_mod.update_sae(state, chunk, 0.01)
        ts = sae_mod.time_surface(state, t_now, 20.0, False)
        corners = cor_mod.detect_corners(state, chunk, 10)
        # scalar digest: fetching it from the host is a REAL device sync —
        # under the axon tunnel jax.block_until_ready returns before the
        # computation finishes, so timing must end on a host fetch.
        digest = ts.sum() + corners.sum()
        return state, digest

    # warm up
    st, digest = frontend(state, chunk, 1.05)
    float(digest)

    iters = 20
    t0 = time.perf_counter()
    st = state
    for i in range(iters):
        st, digest = frontend(st, chunk, 1.05)
    float(digest)                      # FIFO queue ⇒ syncs all iterations
    dt_frontend = (time.perf_counter() - t0) / iters
    events_per_sec = E / dt_frontend

    # back-end: one full sliding-window GN solve (8 iterations) in f32
    from __graft_entry__ import _make_problem
    from esvio_tpu.solver.gauss_newton import solve_window

    args = _make_problem(jnp.float32, L_img=64, L_evt=128)
    out = solve_window(*args, iters=8)
    float(out[3].sum())                # real sync (see digest note above)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = solve_window(*args, iters=8)
    float(out[3].sum())
    solve_ms = (time.perf_counter() - t0) / reps * 1000.0

    baseline_events = 10e6  # 5× real-time 2 Mev/s stereo stream (BASELINE.md)
    result = {
        "metric": "frontend_events_per_sec",
        "value": round(events_per_sec),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / baseline_events, 3),
        "extras": {
            "frontend_ms_per_128k_chunk": round(dt_frontend * 1000.0, 3),
            "solve_window_ms": round(solve_ms, 3),
            "solver_ref_budget_ms": 40.0,
            "solver_iters_per_sec": round(8000.0 / solve_ms, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
