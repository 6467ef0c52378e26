"""Golden-trace regression: the full ESIO pipeline on a fixed synthetic
sequence must keep producing the same trajectory (within a re-derivation
tolerance) as the committed golden run.

This is the repo's replacement for the reference's de-facto validation by
rosbag replay + offline ATE comparison (SURVEY.md §4, script/run.sh):
any regression in the front end, initialization, solver, or marginalization
shows up as a trajectory delta here.

Regenerate (after an INTENDED accuracy change) with:
    python tools/make_golden.py
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "esio_planar_rot.npz")


def run_golden_pipeline():
    from esvio_tpu.apps.pipeline import Pipeline
    from esvio_tpu.core import camera
    from esvio_tpu.frontend import tracker as trk
    from esvio_tpu.io.config import SystemConfig
    from esvio_tpu.vio import estimator as est_mod
    from synth import planar_vio_sequence_rot

    H, W, FOCAL, BASELINE, PLANE_Z = 120, 160, 200.0, 0.10, 4.0
    rng = np.random.default_rng(0)
    seq, gt_t, gt_P = planar_vio_sequence_rot(
        rng, H=H, W=W, focal=FOCAL, plane_z=PLANE_Z, baseline=BASELINE,
        duration=1.6)
    cam = camera.make_pinhole(fx=FOCAL, fy=FOCAL, cx=W / 2, cy=H / 2,
                              width=W, height=H)
    R_ident = np.eye(3)
    sys_cfg = SystemConfig(
        system_mode=0, event_width=W, event_height=H,
        R_body_cam0=R_ident, t_body_cam0=np.zeros(3),
        R_body_cam1=R_ident, t_body_cam1=np.array([BASELINE, 0, 0]),
        R_body_event0=R_ident, t_body_event0=np.zeros(3),
        R_body_event1=R_ident, t_body_event1=np.array([BASELINE, 0, 0]),
        freq=15, max_cnt=60, min_dist=10, loop_closure=0,
    )
    tracker_cfg = trk.TrackerConfig(
        width=W, height=H, capacity=128, cand_capacity=512, max_cnt=60,
        min_dist=10, lk_iters=15)
    est_cfg = est_mod.EstimatorConfig(mode="esio", evt_capacity=256,
                                      img_capacity=8, min_track_for_kf=15)
    pipe = Pipeline(sys_cfg, cams={"event0": cam, "event1": cam},
                    tracker_cfg=tracker_cfg, est_cfg=est_cfg,
                    event_capacity=1 << 15)
    res = pipe.run(seq)
    return res, gt_t, gt_P


@pytest.mark.slow
def test_golden_trace_regression():
    assert os.path.exists(GOLDEN), \
        "golden trace missing — run `python tools/make_golden.py`"
    z = np.load(GOLDEN)
    res, gt_t, gt_P = run_golden_pipeline()
    stamps = np.asarray(res.stamps)
    P = np.asarray(res.P)

    # same ticks reach NON_LINEAR
    assert len(stamps) == len(z["stamps"]), (len(stamps), len(z["stamps"]))
    np.testing.assert_allclose(stamps, z["stamps"], atol=1e-6)
    # trajectory within re-derivation tolerance of the golden run (different
    # XLA versions / fusion choices move f32 results by ≪ this)
    dev = np.linalg.norm(P - z["P"], axis=1)
    assert dev.max() < 0.05, f"max deviation {dev.max():.4f} m vs golden"
    # absolute accuracy did not regress
    ate = res.ate(gt_t, gt_P, alignment="yaw")
    assert ate <= float(z["ate"]) * 1.5 + 0.01, (ate, float(z["ate"]))
