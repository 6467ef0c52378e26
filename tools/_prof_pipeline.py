"""Profile the MEASURED Pipeline.run on the real chip: stage times +
cProfile cumulative hot spots of the host orchestration.

Usage: python tools/_prof_pipeline.py [--smoke]
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402


def main():
    smoke = "--smoke" in sys.argv
    from synth import planar_vio_sequence_rot
    from esvio_tpu.apps.pipeline import Pipeline
    from esvio_tpu.core import camera
    from esvio_tpu.frontend import tracker as trk
    from esvio_tpu.io.config import SystemConfig
    from esvio_tpu.vio import estimator as est_mod

    H, W, FOCAL, BASELINE, PLANE_Z = ((120, 160, 200.0, 0.10, 4.0) if smoke
                                      else (240, 320, 320.0, 0.10, 4.0))
    duration = 0.8 if smoke else 2.4
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    seq, gt_t, gt_P = planar_vio_sequence_rot(
        rng, H=H, W=W, focal=FOCAL, plane_z=PLANE_Z, baseline=BASELINE,
        duration=duration)
    print(f"synth: {time.perf_counter() - t0:.1f}s", flush=True)
    cam = camera.make_pinhole(fx=FOCAL, fy=FOCAL, cx=W / 2, cy=H / 2,
                              width=W, height=H)
    R_ident = np.eye(3)
    sys_cfg = SystemConfig(
        system_mode=0, event_width=W, event_height=H,
        image_width=W, image_height=H,
        R_body_cam0=R_ident, t_body_cam0=np.zeros(3),
        R_body_cam1=R_ident, t_body_cam1=np.array([BASELINE, 0, 0]),
        R_body_event0=R_ident, t_body_event0=np.zeros(3),
        R_body_event1=R_ident, t_body_event1=np.array([BASELINE, 0, 0]),
        freq=15, max_cnt=60, min_dist=10, loop_closure=1,
    )
    tracker_cfg = trk.TrackerConfig(
        width=W, height=H, capacity=128, cand_capacity=512, max_cnt=60,
        min_dist=10, lk_iters=15)
    est_cfg = est_mod.EstimatorConfig(mode="esio", evt_capacity=256,
                                      img_capacity=8, min_track_for_kf=15)

    def make_pipe():
        return Pipeline(sys_cfg, cams={"event0": cam, "event1": cam},
                        tracker_cfg=tracker_cfg, est_cfg=est_cfg,
                        event_capacity=1 << 15)

    t0 = time.perf_counter()
    make_pipe().run(seq)
    print(f"warmup (compiles): {time.perf_counter() - t0:.1f}s", flush=True)

    pipe = make_pipe()
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    res = pipe.run(seq)
    pr.disable()
    wall = time.perf_counter() - t0
    ticks = max(pipe._tick, 1)
    print(f"MEASURED: {ticks} ticks in {wall:.2f}s = "
          f"{ticks / wall:.2f} ticks/s ({1000 * wall / ticks:.1f} ms/tick)",
          flush=True)
    print("stage_times:", res.stage_times, flush=True)

    s = io.StringIO()
    st = pstats.Stats(pr, stream=s)
    st.sort_stats("cumulative").print_stats(45)
    print(s.getvalue())
    s = io.StringIO()
    st = pstats.Stats(pr, stream=s)
    st.sort_stats("tottime").print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
