"""End-to-end ESIO estimator test on simulated stereo event-feature packets.

Feature packets are synthesized directly from ground-truth geometry (the
event front end is tested separately in test_tracker.py); this exercises the
whole back end: bootstrap initialization, alignment, triangulation, GN solve,
marginalization (both paths), window slide, and output trajectory accuracy.
"""
import dataclasses
import types

import numpy as np
import jax.numpy as jnp
import pytest

from esvio_tpu.core import lie
from esvio_tpu.vio import estimator as est_mod

from synth import simulate_trajectory

BASELINE = 0.10
N_LM = 300


def make_world(rng, traj):
    """Landmarks sprinkled around the trajectory at usable stereo depths."""
    P = traj["P"]
    lms = []
    for k in range(len(P)):
        for _ in range(N_LM // len(P)):
            d = rng.uniform(2.0, 5.5)
            dir_ = rng.normal(size=3)
            dir_[2] = abs(dir_[2]) + 1.0
            dir_ /= np.linalg.norm(dir_)
            lms.append(P[k] + dir_ * d)
    return np.asarray(lms)


def packet_for_frame(traj, k, lms, seen_ids, noise, rng, cap=128):
    """Synthesize a stereo FeaturePacket-like object for frame k."""
    Rb = np.asarray(lie.quat_to_rot(jnp.asarray(traj["Q"][k], jnp.float64)))
    pc = (lms - traj["P"][k]) @ Rb           # left cam == body
    z = pc[:, 2]
    vis = (z > 1.2) & (z < 6.5)
    un = pc[:, :2] / np.where(vis, z, 1.0)[:, None]
    vis &= (np.abs(un[:, 0]) < 0.6) & (np.abs(un[:, 1]) < 0.6)

    pcr = pc - np.array([BASELINE, 0, 0.0])
    zr = pcr[:, 2]
    unr = pcr[:, :2] / np.where(vis, zr, 1.0)[:, None]

    idx = np.nonzero(vis)[0]
    # prefer features already tracked, then new ones (stable feature set)
    tracked = [i for i in idx if i in seen_ids]
    fresh = [i for i in idx if i not in seen_ids]
    chosen = (tracked + fresh)[:cap]

    ids = np.full(cap, -1, np.int32)
    valid = np.zeros(cap, bool)
    un_o = np.zeros((cap, 2))
    unr_o = np.zeros((cap, 2))
    rv = np.zeros(cap, bool)
    for s, i in enumerate(chosen):
        ids[s] = i
        valid[s] = True
        un_o[s] = un[i] + rng.normal(0, noise, 2)
        unr_o[s] = unr[i] + rng.normal(0, noise, 2)
        rv[s] = True
    return types.SimpleNamespace(
        ids=ids, valid=valid, un=un_o, vel=np.zeros((cap, 2)),
        right_valid=rv, un_right=unr_o, vel_right=np.zeros((cap, 2)),
    ), set(chosen)


@pytest.mark.slow
def test_esio_end_to_end():
    rng = np.random.default_rng(3)
    n_frames = 30
    traj = simulate_trajectory(rng, n_frames=n_frames, imu_per_frame=10,
                               frame_dt=0.05)
    lms = make_world(rng, traj)

    ex_p = np.array([[0, 0, 0], [0, 0, 0],
                     [BASELINE, 0, 0], [BASELINE, 0, 0]], float)
    ex_q = np.tile(np.array([1.0, 0, 0, 0]), (4, 1))
    cfg = est_mod.EstimatorConfig(mode="esio", evt_capacity=128,
                                  img_capacity=8, min_track_for_kf=15)
    est = est_mod.Estimator(cfg, ex_p, ex_q)

    outs = []
    seen = set()
    k_imu = traj["imu_per_frame"]
    for f in range(n_frames):
        if f > 0:
            for s in range(k_imu):
                i = (f - 1) * k_imu + s + 1
                est.process_imu(traj["dt"], traj["imu_acc"][i], traj["imu_gyr"][i])
        pkt, seen = packet_for_frame(traj, f, lms, seen, 0.3 / 460.0, rng)
        out = est.process_packets(traj["t"][f], pkt)
        outs.append(out)

    flags = [o.solver_flag for o in outs]
    assert "NON_LINEAR" in flags, "estimator never initialized"
    first_nl = flags.index("NON_LINEAR")
    assert first_nl <= 12

    margs = {o.marg_flag for o in outs[first_nl:]}

    # trajectory accuracy after initialization (same world frame by design)
    err = []
    for f in range(first_nl, n_frames):
        err.append(np.linalg.norm(outs[f].P - traj["P"][f]))
    err = np.asarray(err)
    assert err.max() < 0.12, (err.max(), err)
    assert err[-5:].mean() < 0.10, err[-5:]


@pytest.mark.slow
def test_esio_handles_feature_dropout():
    """Estimator keeps running when half the features vanish mid-sequence."""
    rng = np.random.default_rng(5)
    n_frames = 24
    traj = simulate_trajectory(rng, n_frames=n_frames, imu_per_frame=10,
                               frame_dt=0.05)
    lms = make_world(rng, traj)
    ex_p = np.array([[0, 0, 0], [0, 0, 0],
                     [BASELINE, 0, 0], [BASELINE, 0, 0]], float)
    ex_q = np.tile(np.array([1.0, 0, 0, 0]), (4, 1))
    cfg = est_mod.EstimatorConfig(mode="esio", evt_capacity=128,
                                  img_capacity=8, min_track_for_kf=15)
    est = est_mod.Estimator(cfg, ex_p, ex_q)
    seen = set()
    k_imu = traj["imu_per_frame"]
    outs = []
    for f in range(n_frames):
        if f > 0:
            for s in range(k_imu):
                i = (f - 1) * k_imu + s + 1
                est.process_imu(traj["dt"], traj["imu_acc"][i], traj["imu_gyr"][i])
        pkt, seen = packet_for_frame(traj, f, lms, seen, 0.3 / 460.0, rng)
        if 14 <= f <= 16:  # dropout burst
            keep = np.arange(len(pkt.valid)) % 2 == 0
            pkt.valid &= keep
            pkt.right_valid &= keep
        out = est.process_packets(traj["t"][f], pkt)
        outs.append(out)
    assert outs[-1].solver_flag == "NON_LINEAR"
    err = np.linalg.norm(outs[-1].P - traj["P"][n_frames - 1])
    assert err < 0.25, err


@pytest.mark.slow
def test_mono_init_fallback():
    """With no right-camera observations the stereo bootstrap cannot run;
    the estimator must initialize through the monocular GlobalSFM +
    with-scale alignment path (initialStructure, estimator.cpp:415-558)."""
    rng = np.random.default_rng(7)
    n_frames = 26
    traj = simulate_trajectory(rng, n_frames=n_frames, imu_per_frame=10,
                               frame_dt=0.05)
    lms = make_world(rng, traj)
    ex_p = np.array([[0, 0, 0], [0, 0, 0],
                     [BASELINE, 0, 0], [BASELINE, 0, 0]], float)
    ex_q = np.tile(np.array([1.0, 0, 0, 0]), (4, 1))
    cfg = est_mod.EstimatorConfig(mode="esio", evt_capacity=128,
                                  img_capacity=8, min_track_for_kf=15)
    est = est_mod.Estimator(cfg, ex_p, ex_q)
    seen = set()
    k_imu = traj["imu_per_frame"]
    outs = []
    for f in range(n_frames):
        if f > 0:
            for s in range(k_imu):
                i = (f - 1) * k_imu + s + 1
                est.process_imu(traj["dt"], traj["imu_acc"][i], traj["imu_gyr"][i])
        pkt, seen = packet_for_frame(traj, f, lms, seen, 0.3 / 460.0, rng)
        pkt.right_valid[:] = False          # kill stereo entirely
        out = est.process_packets(traj["t"][f], pkt)
        outs.append(out)
    flags = [o.solver_flag for o in outs]
    assert "NON_LINEAR" in flags, "mono fallback never initialized"
    first_nl = flags.index("NON_LINEAR")
    err = np.linalg.norm(outs[-1].P - traj["P"][n_frames - 1])
    assert err < 0.4, (first_nl, err)


@pytest.mark.slow
def test_keyframe_snapshot_and_relocalization():
    """MARGIN_OLD steps emit keyframe packets (pubKeyframe analog) and a
    registered loop match resolves to a near-zero drift on a drift-free
    simulation (setReloFrame → relo_relative_pose)."""
    rng = np.random.default_rng(11)
    n_frames = 26
    traj = simulate_trajectory(rng, n_frames=n_frames, imu_per_frame=10,
                               frame_dt=0.05)
    lms = make_world(rng, traj)
    ex_p = np.array([[0, 0, 0], [0, 0, 0],
                     [BASELINE, 0, 0], [BASELINE, 0, 0]], float)
    ex_q = np.tile(np.array([1.0, 0, 0, 0]), (4, 1))
    cfg = est_mod.EstimatorConfig(mode="esio", evt_capacity=128,
                                  img_capacity=8, min_track_for_kf=15)
    est = est_mod.Estimator(cfg, ex_p, ex_q)
    seen = set()
    k_imu = traj["imu_per_frame"]
    keyframes = []
    relo_out = None
    for f in range(n_frames):
        if f > 0:
            for s in range(k_imu):
                i = (f - 1) * k_imu + s + 1
                est.process_imu(traj["dt"], traj["imu_acc"][i], traj["imu_gyr"][i])
        pkt, seen = packet_for_frame(traj, f, lms, seen, 0.3 / 460.0, rng)
        if f == 20 and keyframes:
            # fabricate a loop: an "old keyframe" at ground truth of frame 14
            # re-observing currently tracked features
            kf = keyframes[-1]
            old_f = 14
            Rb = np.asarray(lie.quat_to_rot(jnp.asarray(traj["Q"][old_f])))
            pc = (lms[kf["ids"]] - traj["P"][old_f]) @ Rb
            un_old = pc[:, :2] / pc[:, 2:3]
            est.set_relo_frame(traj["t"][est.frame_count and 0] +
                               est.timestamps[est.frame_count - 1] * 0 +
                               est.timestamps[min(est.frame_count, 10) - 1],
                               kf["ids"], un_old,
                               traj["P"][old_f], traj["Q"][old_f])
        out = est.process_packets(traj["t"][f], pkt)
        if out.keyframe is not None:
            keyframes.append(out.keyframe)
            # snapshot sanity: world points near their true landmarks
            err = np.linalg.norm(out.keyframe["pts_w"]
                                 - lms[out.keyframe["ids"]], axis=-1)
            assert np.median(err) < 0.2, np.median(err)
        if out.relo is not None:
            relo_out = out.relo
    assert len(keyframes) >= 5
    assert relo_out is not None, "relocalization never resolved"
    # the resolved old-KF pose and the relative pose (old KF → matched window
    # frame) must match ground truth on this drift-free sim
    i_frame = int(np.argmin(np.abs(traj["t"] - relo_out["frame_stamp"])))
    R_old = np.asarray(lie.quat_to_rot(jnp.asarray(traj["Q"][14])))
    R_i = np.asarray(lie.quat_to_rot(jnp.asarray(traj["Q"][i_frame])))
    yaw_gt = float(np.asarray(lie.rot_to_ypr(jnp.asarray(R_i)))[0]
                   - np.asarray(lie.rot_to_ypr(jnp.asarray(R_old)))[0])
    t_gt = R_old.T @ (traj["P"][i_frame] - traj["P"][14])
    assert abs(relo_out["relative_yaw"] - yaw_gt) < 2.0, \
        (relo_out["relative_yaw"], yaw_gt)
    assert np.linalg.norm(relo_out["relative_t"] - t_gt) < 0.15
    assert np.linalg.norm(relo_out["P_old"] - traj["P"][14]) < 0.15
