"""Sequence parallelism (SURVEY §5.7): a long trajectory refined as a BATCH
of overlapping windows, then stitched — error must drop vs the noisy input
and the stitched trajectory must be continuous."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esvio_tpu.core import lie
from esvio_tpu.dist import sequence_parallel as sp
from esvio_tpu.imu import preintegration as pre

from synth import simulate_trajectory
from test_estimator import make_world, BASELINE


def build_long_log(rng, T=38, n_lm=240, noise_px=0.3 / 460.0, p_noise=0.06):
    traj = simulate_trajectory(rng, n_frames=T, imu_per_frame=10,
                               frame_dt=0.05)
    lms = make_world(rng, traj)[:n_lm]
    L = len(lms)

    un = np.zeros((L, T, 2))
    un_r = np.zeros((L, T, 2))
    obs = np.zeros((L, T), bool)
    stereo = np.zeros((L, T), bool)
    for f in range(T):
        Rb = np.asarray(lie.quat_to_rot(jnp.asarray(traj["Q"][f],
                                                    jnp.float64)))
        pc = (lms - traj["P"][f]) @ Rb
        z = pc[:, 2]
        vis = (z > 1.2) & (z < 6.5)
        u = pc[:, :2] / np.where(vis, z, 1.0)[:, None]
        vis &= (np.abs(u[:, 0]) < 0.6) & (np.abs(u[:, 1]) < 0.6)
        pcr = pc - np.array([BASELINE, 0, 0.0])
        ur = pcr[:, :2] / np.where(vis, pcr[:, 2], 1.0)[:, None]
        obs[:, f] = vis
        stereo[:, f] = vis
        un[:, f] = u + rng.normal(0, noise_px, (L, 2))
        un_r[:, f] = ur + rng.normal(0, noise_px, (L, 2))

    # IMU interval arrays (interval f: frame f → f+1)
    k = traj["imu_per_frame"]
    C = k + 2
    imu_dt = np.zeros((T - 1, C))
    imu_acc = np.zeros((T - 1, C, 3))
    imu_gyr = np.zeros((T - 1, C, 3))
    imu_n = np.full(T - 1, k, np.int32)
    for f in range(T - 1):
        for s in range(k):
            i = f * k + s + 1
            imu_dt[f, s] = traj["dt"]
            imu_acc[f, s] = traj["imu_acc"][i]
            imu_gyr[f, s] = traj["imu_gyr"][i]

    # noisy initial guess (what an online pass would hand to refinement)
    P0 = traj["P"] + rng.normal(0, p_noise, traj["P"].shape)
    long_state = dict(
        P=P0, Q=traj["Q"], V=traj["V"], Ba=np.zeros((T, 3)),
        Bg=np.zeros((T, 3)),
        ex_p=np.array([[0, 0, 0], [0, 0, 0],
                       [BASELINE, 0, 0], [BASELINE, 0, 0]]),
        ex_q=np.tile(np.array([1.0, 0, 0, 0]), (4, 1)),
        imu_dt=imu_dt, imu_acc=imu_acc, imu_gyr=imu_gyr, imu_n=imu_n)
    long_book = dict(un=un, un_r=un_r, vel=np.zeros_like(un),
                     vel_r=np.zeros_like(un), obs=obs, stereo=stereo)
    return traj, long_state, long_book


@pytest.mark.slow
def test_long_sequence_batched_refinement(rng):
    T = 38
    traj, long_state, long_book = build_long_log(rng, T=T)
    starts = sp.window_starts(T, overlap=2)
    assert starts[-1] + sp.WINDOW_FRAMES >= T
    params = pre.make_imu_params(dtype=jnp.float64)
    states, books, preints, imu_valid = sp.gather_windows(
        long_state, long_book, starts, params, dtype=jnp.float64)
    B = len(starts)
    assert states.P.shape == (B, 11, 3)

    g = jnp.asarray([0.0, 0.0, 9.80766], jnp.float64)
    rrl = jnp.eye(3, dtype=jnp.float64)
    trl = jnp.asarray([-BASELINE, 0.0, 0.0], jnp.float64)
    st, be, costs = sp.solve_windows_batched(
        states, books, preints, imu_valid, g, iters=8, rrl=rrl, trl=trl)
    costs = np.asarray(costs)
    assert np.isfinite(costs).all()
    assert (costs[:, -1] <= costs[:, 0]).all()

    P_out, Q_out = sp.stitch(st, starts, T, overlap=2)
    err_in = np.linalg.norm(long_state["P"] - traj["P"], axis=1)
    err_out = np.linalg.norm(P_out - traj["P"], axis=1)
    # batched refinement must beat the noisy input clearly
    assert err_out.mean() < err_in.mean() * 0.6, \
        (err_out.mean(), err_in.mean())
    # stitched trajectory is continuous (no window-boundary jumps)
    step = np.linalg.norm(np.diff(P_out, axis=0), axis=1)
    gt_step = np.linalg.norm(np.diff(traj["P"], axis=0), axis=1)
    assert np.abs(step - gt_step).max() < 0.1, np.abs(step - gt_step).max()
