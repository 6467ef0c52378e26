"""End-to-end ESIO at DSEC geometry: 640×480 events, 10 Hz, 100 lanes.

Closes VERDICT r4 #8: the blob-texture synthetic could not sustain VIO past
~180×240 (binary edges floor LK noise at ~0.5 px — NOTES_r4/r5), so e2e
accuracy evidence stopped at golden geometry.  The band-limited texture +
ESIM per-pixel contrast event model (tests/synth.py, r5) keeps event
positioning sub-pixel at 640×480, making a DSEC-geometry run (esio_DSEC
budgets: 640×480 events, freq 10, max_cnt 100 — config/esio_dsec/esio.yaml)
CI-viable.  This is the closest attainable stand-in for the reference's
DSEC rosbag replay (SURVEY.md §4) in a dataset-free sandbox.
"""
import numpy as np
import pytest

from synth import planar_vio_sequence_rot


@pytest.mark.slow
def test_esio_dsec_geometry(rng):
    from esvio_tpu.apps.pipeline import Pipeline
    from esvio_tpu.core import camera
    from esvio_tpu.frontend import tracker as trk
    from esvio_tpu.io.config import SystemConfig
    from esvio_tpu.vio import estimator as est_mod

    H, W, FOCAL, BASELINE, PLANE_Z = 480, 640, 560.0, 0.60, 4.0
    duration = 2.0                        # 20 ticks at 10 Hz
    seq, gt_t, gt_P = planar_vio_sequence_rot(
        rng, H=H, W=W, focal=FOCAL, plane_z=PLANE_Z, baseline=BASELINE,
        duration=duration, texture="smooth", event_hz=300,
        gyr_bias=np.array([0.008, -0.01, 0.006]))
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
        freq=10, max_cnt=100, min_dist=10,   # DSEC budgets
        loop_closure=0,
    )
    tracker_cfg = trk.TrackerConfig(
        width=W, height=H, capacity=128, cand_capacity=1024, max_cnt=100,
        min_dist=10, lk_iters=15)
    est_cfg = est_mod.EstimatorConfig(mode="esio", evt_capacity=256,
                                      img_capacity=8, min_track_for_kf=15)
    pipe = Pipeline(sys_cfg, cams={"event0": cam, "event1": cam},
                    tracker_cfg=tracker_cfg, est_cfg=est_cfg,
                    event_capacity=1 << 16)
    res = pipe.run(seq)

    assert res.n_restarts == 0, "watchdog restarted at DSEC geometry"
    assert len(res.stamps) >= 6, \
        f"only {len(res.stamps)} NON_LINEAR ticks — init failed at 640×480"
    ate = res.ate(gt_t, gt_P)
    # the r4 cliff was DIVERGENCE (meters); this gate pins convergent
    # sub-decimeter tracking at full DSEC event geometry
    assert ate < 0.10, f"ATE {ate:.3f} m at DSEC geometry"
