"""Fused estimator tick: parity with the general path + the one-fetch
architecture invariant (VERDICT r4 #2/#9).

The steady-state NON_LINEAR tick must run as ONE device program with ONE
device_get — per-tick blocking round trips are what made the measured
pipeline 0.14× realtime through the device tunnel in r4.  These tests pin:

  1. the fused path produces the same trajectory and keyframe decisions as
     the multi-dispatch path it replaces (process_packets semantics);
  2. steady-state fused ticks make exactly one jax.device_get call
     (dispatch-count regression gate — a new blocking fetch on the tick
     critical path fails this test, not just the bench).
"""
import dataclasses

import numpy as np
import jax
import pytest

from esvio_tpu.vio import estimator as est_mod

from test_estimator import make_world, packet_for_frame
from synth import simulate_trajectory


def _drive_pair(n_frames=26, seed=5):
    rng = np.random.default_rng(seed)
    traj = simulate_trajectory(rng, n_frames=n_frames, dt=0.07)
    lms = make_world(rng, traj)
    cfgA = est_mod.EstimatorConfig(mode="esio", fused=True)
    cfgB = dataclasses.replace(cfgA, fused=False)
    ests = [est_mod.Estimator(c, np.zeros((4, 3)),
                              np.tile(np.array([1.0, 0, 0, 0]), (4, 1)))
            for c in (cfgA, cfgB)]
    outs = [[], []]
    seen = [set(), set()]
    noise = 0.3 / 460.0
    for f in range(n_frames):
        for e, est in enumerate(ests):
            # identical packets for both estimators (same rng seed per frame)
            pkt = packet_for_frame(traj, f, lms, seen[e], noise,
                                   np.random.default_rng(seed * 1000 + f))
            for i in range(8):
                k = min(f * 8 + i, len(traj["imu_t"]) - 1)
                est.process_imu(0.07 / 8, traj["imu_acc"][k],
                                traj["imu_gyr"][k])
            outs[e].append(est.process_packets(traj["t"][f], pkt))
    return ests, outs


@pytest.mark.slow
def test_fused_matches_general_path():
    ests, (outs_f, outs_g) = _drive_pair()
    assert ests[0].solver_flag == "NON_LINEAR"
    assert ests[1].solver_flag == "NON_LINEAR"
    n_fused_ticks = 0
    for of, og in zip(outs_f, outs_g):
        assert of.solver_flag == og.solver_flag
        # keyframe decision must agree tick by tick (same parallax math,
        # host vs device evaluation)
        assert of.marg_flag == og.marg_flag, (of.t, of.marg_flag, og.marg_flag)
        if of.solver_flag == "NON_LINEAR":
            n_fused_ticks += 1
            # same solve, different XLA fusion/ordering — tight but not
            # bit-equal (f32 reductions reorder)
            np.testing.assert_allclose(of.P, og.P, atol=2e-3)
            np.testing.assert_allclose(of.V, og.V, atol=2e-3)
            q_dot = abs(float(np.dot(of.Q, og.Q)))
            assert q_dot > 1.0 - 1e-5, (of.Q, og.Q)
    assert n_fused_ticks >= 10


def test_fused_tick_makes_exactly_one_fetch(monkeypatch):
    rng = np.random.default_rng(7)
    n_frames = 16
    traj = simulate_trajectory(rng, n_frames=n_frames, dt=0.07)
    lms = make_world(rng, traj)
    cfg = est_mod.EstimatorConfig(mode="esio")
    est = est_mod.Estimator(cfg, np.zeros((4, 3)),
                            np.tile(np.array([1.0, 0, 0, 0]), (4, 1)))
    seen = set()
    noise = 0.3 / 460.0

    real_get = jax.device_get
    counter = {"n": 0}

    def counting_get(x):
        counter["n"] += 1
        return real_get(x)

    fetches_per_tick = []
    for f in range(n_frames):
        pkt = packet_for_frame(traj, f, lms, seen, noise,
                               np.random.default_rng(7000 + f))
        for i in range(8):
            k = min(f * 8 + i, len(traj["imu_t"]) - 1)
            est.process_imu(0.07 / 8, traj["imu_acc"][k], traj["imu_gyr"][k])
        was_nonlinear = est.solver_flag == "NON_LINEAR"
        monkeypatch.setattr(est_mod.jax, "device_get", counting_get)
        counter["n"] = 0
        est.process_packets(traj["t"][f], pkt)
        monkeypatch.setattr(est_mod.jax, "device_get", real_get)
        if was_nonlinear:
            fetches_per_tick.append(counter["n"])
    assert len(fetches_per_tick) >= 4, "never reached steady state"
    # THE invariant: one blocking fetch per steady-state tick
    assert max(fetches_per_tick) == 1, fetches_per_tick
