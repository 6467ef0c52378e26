"""Unbounded-trajectory pose-graph path: CG solve parity + DB growth.

VERDICT r2 #5: the reference keeps an unbounded keyframe list and solves the
4-DoF graph sparsely on a cadence (pose_graph.cpp:53-240,423-586); these
tests cover the TPU-native equivalents — geometric KeyFrameDB growth, the
matrix-free PCG solve at 5k keyframes, and its parity with the dense solve.
"""
import time

import numpy as np
import jax.numpy as jnp
import pytest

from esvio_tpu.core import lie
from esvio_tpu.loop import keyframe_db, pose_graph


def _drifting_loop_problem(rng, K, n_loops, drift_per_step=0.002):
    """Ground truth: a closed square loop walked repeatedly; VIO input has
    linear position drift. Loop edges measure the TRUE relative pose."""
    side = max(4, K // 8)   # two laps of the square over K frames
    t_gt = np.zeros((K, 3))
    yaw_gt = np.zeros(K)
    p = np.zeros(3)
    yaw = 0.0
    for k in range(K):
        t_gt[k] = p
        yaw_gt[k] = yaw
        step = np.array([np.cos(np.deg2rad(yaw)), np.sin(np.deg2rad(yaw)), 0])
        p = p + 0.05 * step
        if (k + 1) % side == 0:
            yaw += 90.0
    # VIO drift: accumulated position error + small yaw drift
    drift = np.cumsum(
        rng.normal(0, drift_per_step, (K, 3)) + [[drift_per_step, 0, 0]], 0)
    t_vio = t_gt + drift
    yaw_vio = yaw_gt + np.cumsum(rng.normal(0, 0.01, K) + 0.002)

    period = 4 * side
    li, lj, lt, ly = [], [], [], []
    for j in rng.choice(np.arange(period, K), min(n_loops, K - period),
                        replace=False):
        i = j - period          # same place one lap earlier
        Ri = np.asarray(lie.ypr_to_rot(jnp.asarray([yaw_gt[i], 0.0, 0.0])))
        lt.append(Ri.T @ (t_gt[j] - t_gt[i]))
        ly.append(yaw_gt[j] - yaw_gt[i])
        li.append(i)
        lj.append(j)
    return (t_gt, yaw_gt, t_vio, yaw_vio,
            np.asarray(li, np.int32), np.asarray(lj, np.int32),
            np.asarray(lt), np.asarray(ly))


def _pad_edges(li, lj, lt, ly, E):
    out_i = np.zeros(E, np.int32)
    out_j = np.zeros(E, np.int32)
    out_t = np.zeros((E, 3))
    out_y = np.zeros(E)
    v = np.zeros(E, bool)
    n = len(li)
    out_i[:n] = li
    out_j[:n] = lj
    out_t[:n] = lt
    out_y[:n] = ly
    v[:n] = True
    return out_i, out_j, out_t, out_y, v


def test_cg_matches_dense(rng):
    K = 256
    (t_gt, yaw_gt, t_vio, yaw_vio, li, lj, lt, ly) = _drifting_loop_problem(
        rng, K, n_loops=12)
    li, lj, lt, ly, lv = _pad_edges(li, lj, lt, ly, 32)
    valid = np.ones(K, bool)
    first = int(li[lv].min())
    args = (jnp.asarray(yaw_vio), jnp.asarray(t_vio),
            jnp.zeros(K), jnp.zeros(K), jnp.asarray(valid),
            jnp.asarray(first), jnp.asarray(li), jnp.asarray(lj),
            jnp.asarray(lt), jnp.asarray(ly), jnp.asarray(lv))
    yaw_d, t_d = pose_graph.optimize_4dof(*args, iters=5)
    yaw_c, t_c = pose_graph.optimize_4dof_cg(*args, iters=5, cg_iters=400)
    assert np.abs(np.asarray(yaw_c) - np.asarray(yaw_d)).max() < 0.05, \
        np.abs(np.asarray(yaw_c) - np.asarray(yaw_d)).max()
    assert np.abs(np.asarray(t_c) - np.asarray(t_d)).max() < 0.01, \
        np.abs(np.asarray(t_c) - np.asarray(t_d)).max()


@pytest.mark.slow
def test_cg_5000_keyframes(rng):
    """5k-keyframe graph with loops completes in one compile and reduces the
    VIO drift (the capacity-2048 assert of r2 is gone)."""
    K = 5000
    Kp = 8192
    (t_gt, yaw_gt, t_vio, yaw_vio, li, lj, lt, ly) = _drifting_loop_problem(
        rng, K, n_loops=64)
    yaw_p = np.zeros(Kp)
    t_p = np.zeros((Kp, 3))
    yaw_p[:K] = yaw_vio
    t_p[:K] = t_vio
    valid = np.arange(Kp) < K
    li, lj, lt, ly, lv = _pad_edges(li, lj, lt, ly, 128)
    first = int(li[lv].min())
    args = (jnp.asarray(yaw_p), jnp.asarray(t_p),
            jnp.zeros(Kp), jnp.zeros(Kp), jnp.asarray(valid),
            jnp.asarray(first), jnp.asarray(li), jnp.asarray(lj),
            jnp.asarray(lt), jnp.asarray(ly), jnp.asarray(lv))
    t0 = time.perf_counter()
    yaw_o, t_o = pose_graph.optimize_4dof_cg(*args, iters=5, cg_iters=200)
    t_o = np.asarray(t_o)
    wall = time.perf_counter() - t0

    # drift at looped frames should collapse towards ground truth
    err_vio = np.linalg.norm(t_vio[lj[lv]] - t_gt[lj[lv]], axis=1)
    err_opt = np.linalg.norm(t_o[lj[lv]] - t_gt[lj[lv]], axis=1)
    assert err_opt.mean() < 0.5 * err_vio.mean(), \
        (err_opt.mean(), err_vio.mean())
    assert np.isfinite(t_o[:K]).all()
    assert wall < 300.0, wall     # one compile + solve, no blowup


def test_keyframe_db_grows_past_capacity():
    db = keyframe_db.KeyFrameDB(capacity=4, n_window=8, n_extra=8)
    rng = np.random.default_rng(3)
    for k in range(21):
        db.add(float(k), rng.normal(0, 1, 3), np.array([1.0, 0, 0, 0]),
               np.zeros((8, 3)), np.zeros((8, 2)),
               np.ones((8, 256), np.int8), np.ones(8, bool),
               np.zeros((8, 2)), np.ones((8, 256), np.int8),
               np.ones(8, bool), sequence=0)
    assert db.count == 21
    assert db.capacity >= 21
    assert db.stamp[20] == 20.0
    assert (db.loop_target[:db.count] == -1).all()
    # retrieval arrays stayed aligned through growth
    assert np.isfinite(db.gdesc[:21]).all()
