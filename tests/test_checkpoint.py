"""Checkpoint/resume: a resumed estimator must continue bit-identically."""
import numpy as np
import pytest

from esvio_tpu.vio import checkpoint as ckpt
from esvio_tpu.vio import estimator as est_mod

from test_estimator import (BASELINE, make_world, packet_for_frame)
from synth import simulate_trajectory


@pytest.mark.slow
def test_checkpoint_resume_bit_exact(tmp_path, rng):
    n_frames = 22
    split = 16
    traj = simulate_trajectory(rng, n_frames=n_frames, imu_per_frame=10,
                               frame_dt=0.05)
    lms = make_world(rng, traj)
    ex_p = np.array([[0, 0, 0], [0, 0, 0],
                     [BASELINE, 0, 0], [BASELINE, 0, 0]], float)
    ex_q = np.tile(np.array([1.0, 0, 0, 0]), (4, 1))
    cfg = est_mod.EstimatorConfig(mode="esio", evt_capacity=128,
                                  img_capacity=8, min_track_for_kf=15)

    def feed(est, f, seen, packets_rng):
        if f > 0:
            for s in range(traj["imu_per_frame"]):
                i = (f - 1) * traj["imu_per_frame"] + s + 1
                est.process_imu(traj["dt"], traj["imu_acc"][i],
                                traj["imu_gyr"][i])
        pkt, seen = packet_for_frame(traj, f, lms, seen, 0.3 / 460.0,
                                     packets_rng)
        return est.process_packets(traj["t"][f], pkt), seen

    # run A: straight through
    est_a = est_mod.Estimator(cfg, ex_p, ex_q)
    seen_a = set()
    rng_a = np.random.default_rng(99)
    outs_a = []
    for f in range(n_frames):
        out, seen_a = feed(est_a, f, seen_a, rng_a)
        outs_a.append(out)

    # run B: checkpoint at `split`, restore into a fresh estimator, continue
    est_b = est_mod.Estimator(cfg, ex_p, ex_q)
    seen_b = set()
    rng_b = np.random.default_rng(99)
    for f in range(split):
        _, seen_b = feed(est_b, f, seen_b, rng_b)
    path = tmp_path / "ckpt.npz"
    ckpt.save_estimator(est_b, path)

    est_c = est_mod.Estimator(cfg, ex_p, ex_q)
    ckpt.load_estimator(est_c, path)
    outs_c = []
    for f in range(split, n_frames):
        out, seen_b = feed(est_c, f, seen_b, rng_b)
        outs_c.append(out)

    assert outs_c[-1].solver_flag == "NON_LINEAR"
    for k, f in enumerate(range(split, n_frames)):
        np.testing.assert_allclose(outs_c[k].P, outs_a[f].P, atol=1e-9)
        np.testing.assert_allclose(outs_c[k].V, outs_a[f].V, atol=1e-9)
