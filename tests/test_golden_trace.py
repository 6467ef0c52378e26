"""Golden-trace regression: the full ESIO and ESVIO pipelines on fixed
synthetic sequences must keep producing the same trajectory (within a
re-derivation tolerance) as the committed golden runs.

This is the repo's replacement for the reference's de-facto validation by
rosbag replay + offline ATE comparison (SURVEY.md §4, script/run.sh):
any regression in the front end (event OR image path), initialization,
solver, or marginalization shows up as a trajectory delta here.

Regenerate (after an INTENDED accuracy change) with:
    python tools/make_golden.py
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN = os.path.join(GOLDEN_DIR, "esio_planar_rot.npz")
GOLDEN_ESVIO = os.path.join(GOLDEN_DIR, "esvio_planar_rot.npz")


def run_golden_pipeline(mode="esio"):
    from esvio_tpu.apps.pipeline import Pipeline
    from esvio_tpu.core import camera
    from esvio_tpu.frontend import tracker as trk
    from esvio_tpu.io.config import SystemConfig
    from esvio_tpu.vio import estimator as est_mod
    from synth import planar_vio_sequence_rot

    H, W, FOCAL, BASELINE, PLANE_Z = 120, 160, 200.0, 0.10, 4.0
    rng = np.random.default_rng(0)
    frame_hz = 15 if mode == "esvio" else 0
    seq, gt_t, gt_P = planar_vio_sequence_rot(
        rng, H=H, W=W, focal=FOCAL, plane_z=PLANE_Z, baseline=BASELINE,
        duration=1.6, frame_hz=frame_hz)
    cam = camera.make_pinhole(fx=FOCAL, fy=FOCAL, cx=W / 2, cy=H / 2,
                              width=W, height=H)
    R_ident = np.eye(3)
    sys_cfg = SystemConfig(
        system_mode=0 if mode == "esio" else 1,
        event_width=W, event_height=H, image_width=W, image_height=H,
        R_body_cam0=R_ident, t_body_cam0=np.zeros(3),
        R_body_cam1=R_ident, t_body_cam1=np.array([BASELINE, 0, 0]),
        R_body_event0=R_ident, t_body_event0=np.zeros(3),
        R_body_event1=R_ident, t_body_event1=np.array([BASELINE, 0, 0]),
        freq=15, max_cnt=60, min_dist=10, max_cnt_img=60, min_dist_img=10,
        loop_closure=0,
    )
    tracker_cfg = trk.TrackerConfig(
        width=W, height=H, capacity=128, cand_capacity=512, max_cnt=60,
        min_dist=10, lk_iters=15)
    img_tracker_cfg = trk.TrackerConfig(
        width=W, height=H, capacity=128, cand_capacity=512, max_cnt=60,
        min_dist=10, lk_iters=15) if mode == "esvio" else None
    est_cfg = est_mod.EstimatorConfig(
        mode=mode, evt_capacity=256,
        img_capacity=256 if mode == "esvio" else 8, min_track_for_kf=15)
    cams = {"event0": cam, "event1": cam}
    if mode == "esvio":
        cams.update({"cam0": cam, "cam1": cam})
    pipe = Pipeline(sys_cfg, cams=cams, tracker_cfg=tracker_cfg,
                    img_tracker_cfg=img_tracker_cfg, est_cfg=est_cfg,
                    event_capacity=1 << 15)
    res = pipe.run(seq)
    return res, gt_t, gt_P


def _check_against(golden_path, mode):
    assert os.path.exists(golden_path), \
        "golden trace missing — run `python tools/make_golden.py`"
    z = np.load(golden_path)
    res, gt_t, gt_P = run_golden_pipeline(mode)
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


@pytest.mark.slow
def test_golden_trace_regression():
    _check_against(GOLDEN, "esio")


@pytest.mark.slow
def test_golden_trace_regression_esvio():
    """ESVIO golden: stereo events + stereo frames (the image path is a
    shipped capability — feature_tracker.cpp:164-338)."""
    _check_against(GOLDEN_ESVIO, "esvio")
