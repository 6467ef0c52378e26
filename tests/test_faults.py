"""Fault injection: stream gaps, IMU dropout, malformed event streams.

SURVEY §5.3 / VERDICT r2 #7: the reference's recovery story is the stream
watchdog (>1 s gap or backwards time → restart topic → estimator reboot,
stereo_event_tracker_node.cpp:163-173, stereo_estimator_node.cpp:231-252)
plus imu-interval gating.  These tests actually execute those paths.
"""
import dataclasses

import numpy as np
import pytest

from esvio_tpu.apps.pipeline import Pipeline
from esvio_tpu.core import camera
from esvio_tpu.frontend import tracker as trk
from esvio_tpu.io import datasets as ds
from esvio_tpu.io import trajectory as traj_io
from esvio_tpu.io.config import SystemConfig
from esvio_tpu.vio import estimator as est_mod

from synth import planar_vio_sequence_rot

H, W = 120, 160
FOCAL = 200.0
BASELINE = 0.10
PLANE_Z = 4.0


def _make_pipeline():
    cam = camera.make_pinhole(fx=FOCAL, fy=FOCAL, cx=W / 2, cy=H / 2,
                              width=W, height=H)
    R_ident = np.eye(3)
    sys_cfg = SystemConfig(
        system_mode=0, event_width=W, event_height=H,
        R_body_cam0=R_ident, t_body_cam0=np.zeros(3),
        R_body_cam1=R_ident, t_body_cam1=np.array([BASELINE, 0, 0]),
        R_body_event0=R_ident, t_body_event0=np.zeros(3),
        R_body_event1=R_ident, t_body_event1=np.array([BASELINE, 0, 0]),
        freq=15, max_cnt=60, min_dist=10,
    )
    tracker_cfg = trk.TrackerConfig(
        width=W, height=H, capacity=128, cand_capacity=512, max_cnt=60,
        min_dist=10, lk_iters=15)
    est_cfg = est_mod.EstimatorConfig(mode="esio", evt_capacity=256,
                                      img_capacity=8, min_track_for_kf=15)
    return Pipeline(sys_cfg, {"event0": cam, "event1": cam},
                    tracker_cfg=tracker_cfg, est_cfg=est_cfg,
                    event_capacity=1 << 15)


def _cut_events(ev: ds.EventStream, t0, t1) -> ds.EventStream:
    keep = (ev.t < t0) | (ev.t >= t1)
    return ds.EventStream(ev.t[keep], ev.x[keep], ev.y[keep], ev.p[keep])


@pytest.mark.slow
def test_event_gap_watchdog_restart(rng):
    """>1 s event dropout mid-sequence on both cameras: the watchdog must
    fire exactly once, the pipeline must re-initialize, and the post-recovery
    segment must deliver a bounded yaw-aligned ATE."""
    seq, gt_t, gt_P = planar_vio_sequence_rot(
        rng, H=H, W=W, focal=FOCAL, plane_z=PLANE_Z, baseline=BASELINE,
        duration=4.5)
    t_start = float(seq.events_left.t[0])
    gap0, gap1 = t_start + 1.4, t_start + 2.6   # 1.2 s dropout
    seq = dataclasses.replace(
        seq,
        events_left=_cut_events(seq.events_left, gap0, gap1),
        events_right=_cut_events(seq.events_right, gap0, gap1))

    pipe = _make_pipeline()
    res = pipe.run(seq)

    assert res.n_restarts == 1, res.n_restarts
    assert pipe.sequence == 1       # new_sequence analog incremented
    stamps = np.asarray(res.stamps)
    assert np.isfinite(np.asarray(res.P)).all()
    # outputs exist on BOTH sides of the gap
    assert (stamps < gap0).sum() >= 3, stamps
    post = stamps > gap1
    assert post.sum() >= 5, f"no post-recovery outputs: {stamps - t_start}"
    # post-recovery accuracy: segment ATE in its own (restarted) gauge
    ate_post = traj_io.ate_rmse(
        stamps[post], np.asarray(res.P)[post], gt_t, gt_P, alignment="se3")
    assert np.isfinite(ate_post) and ate_post < 0.5, ate_post


@pytest.mark.slow
def test_imu_dropout_interval(rng):
    """0.4 s of missing IMU mid-run: the affected intervals drop out of the
    problem via imu_valid gating; the pipeline survives with finite output."""
    seq, gt_t, gt_P = planar_vio_sequence_rot(
        rng, H=H, W=W, focal=FOCAL, plane_z=PLANE_Z, baseline=BASELINE,
        duration=2.5)
    t_start = float(seq.events_left.t[0])
    d0, d1 = t_start + 1.4, t_start + 1.8
    imu = seq.imu
    keep = (imu.t < d0) | (imu.t >= d1)
    seq = dataclasses.replace(
        seq, imu=ds.ImuStream(imu.t[keep], imu.acc[keep], imu.gyr[keep]))

    pipe = _make_pipeline()
    res = pipe.run(seq)
    assert res.n_restarts == 0
    assert len(res.stamps) >= 8
    assert np.isfinite(np.asarray(res.P)).all()
    # drift can grow through the un-constrained interval but must stay sane
    ate = res.ate(gt_t, gt_P, alignment="yaw")
    assert np.isfinite(ate) and ate < 1.0, ate


@pytest.mark.slow
def test_backwards_time_and_duplicate_chunks(rng):
    """Malformed stream: a duplicated chunk (same stamp re-delivered) must
    not restart; a backwards time jump (rosbag replay loop) must restart."""
    seq, gt_t, gt_P = planar_vio_sequence_rot(
        rng, H=H, W=W, focal=FOCAL, plane_z=PLANE_Z, baseline=BASELINE,
        duration=1.5)
    pipe = _make_pipeline()
    freq = 15.0
    pairs = list(zip(
        ds.iterate_chunks(seq.events_left, freq, 1 << 15),
        ds.iterate_chunks(seq.events_right, freq, 1 << 15)))
    n = len(pairs)
    # duplicate a mid-stream pair (exactly re-delivered packet)
    feed = pairs[:n // 2] + [pairs[n // 2 - 1]] + pairs[n // 2:]
    # then replay the first third again → backwards jump
    feed = feed + pairs[:n // 3]

    res = pipe.run(seq, chunk_pairs=iter(feed))
    assert res.n_restarts == 1, res.n_restarts   # only the backwards jump
    assert np.isfinite(np.asarray(res.P)).all()
