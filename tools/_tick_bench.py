"""Microbench: tracker tick on the attached TPU (isolated, no suite)."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from esvio_tpu.core import camera
    from esvio_tpu.events import sae as sae_mod
    from esvio_tpu.frontend import tracker as trk

    H, W = 260, 346
    E = 1 << 16
    cfg = trk.TrackerConfig(width=W, height=H, capacity=256,
                            cand_capacity=1024, max_cnt=150, min_dist=10)
    cam = camera.make_pinhole(fx=226.38, fy=226.15, cx=173.6, cy=133.7,
                              dist=(-0.048, 0.011, -0.0002, 0.0001),
                              width=W, height=H)

    def mk_chunk(seed, t0):
        r = np.random.default_rng(seed)
        return sae_mod.EventChunk(
            t=jnp.asarray(np.sort(r.uniform(t0, t0 + 1 / 15, E))
                          .astype(np.float32)),
            x=jnp.asarray(r.integers(0, W, E).astype(np.int32)),
            y=jnp.asarray(r.integers(0, H, E).astype(np.int32)),
            p=jnp.asarray(r.integers(0, 2, E).astype(np.int32)),
            valid=jnp.ones(E, bool))

    state = trk.init_state(cfg)
    t0 = 1.0
    for k in range(3):
        state, pkt = trk.track_event_stereo(
            cfg, cam, cam, state, mk_chunk(k, t0 + k / 15),
            mk_chunk(100 + k, t0 + k / 15), t0 + (k + 1) / 15)
    float(np.asarray(pkt.un)[0, 0])
    for trial in range(3):
        t1 = time.perf_counter()
        iters = 10
        for k in range(iters):
            state, pkt = trk.track_event_stereo(
                cfg, cam, cam, state, mk_chunk(k % 2, t0 + k / 15),
                mk_chunk(100 + k % 2, t0 + k / 15), t0 + (k + 3) / 15)
        float(np.asarray(pkt.un)[0, 0])
        print(f"trial {trial}: tick {(time.perf_counter()-t1)/iters*1e3:.2f} ms")


if __name__ == "__main__":
    main()
