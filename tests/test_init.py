"""Initialization geometry: relative pose, global SFM, mono alignment,
extrinsic-rotation calibration (reference: esvio_estimator/src/initial/)."""
import numpy as np
import jax
import jax.numpy as jnp

from esvio_tpu.core import lie
from esvio_tpu.imu import preintegration as pre
from esvio_tpu.init import alignment, ex_rotation, relative_pose, sfm

from synth import simulate_trajectory, project_landmarks


def _two_view(rng, n=60, noise=0.0):
    """Synthetic two-view scene.  Returns normalized obs + ground truth."""
    pts = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n),
    ], -1)
    # camera 2 pose: moderate baseline + rotation
    w = np.array([0.05, -0.08, 0.03])
    R21 = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float64)))
    t21 = np.array([0.4, 0.1, -0.05])
    p1 = pts[:, :2] / pts[:, 2:3]
    X2 = pts @ R21.T + t21
    p2 = X2[:, :2] / X2[:, 2:3]
    if noise:
        p1 = p1 + rng.normal(0, noise, p1.shape)
        p2 = p2 + rng.normal(0, noise, p2.shape)
    return p1, p2, pts, R21, t21


def test_relative_rt_recovers_pose(rng):
    p1, p2, _, R21, t21 = _two_view(rng)
    key = jax.random.PRNGKey(0)
    ok, R, t, n_good = relative_pose.solve_relative_rt(
        key, jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), bool))
    assert bool(ok)
    # output convention: frame2→frame1 (R = R21ᵀ, t = camera-2 center in f1)
    assert np.allclose(np.asarray(R), R21.T, atol=1e-4)
    t_dir = np.asarray(t) / np.linalg.norm(np.asarray(t))
    t_gt = -(R21.T @ t21)
    t_gt = t_gt / np.linalg.norm(t_gt)
    assert np.allclose(t_dir, t_gt, atol=1e-3)


def test_relative_rt_with_outliers(rng):
    p1, p2, _, R21, t21 = _two_view(rng, n=80, noise=2e-4)
    # corrupt 20% of matches
    bad = rng.choice(80, 16, replace=False)
    p2[bad] += rng.normal(0, 0.2, (16, 2))
    key = jax.random.PRNGKey(1)
    ok, R, t, _ = relative_pose.solve_relative_rt(
        key, jnp.asarray(p1), jnp.asarray(p2), jnp.ones(80, bool))
    assert bool(ok)
    dR = np.asarray(R) @ R21
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0


def test_relative_hybrid_metric_translation(rng):
    p1, p2, pts, R21, t21 = _two_view(rng, noise=2e-4)
    depth1 = pts[:, 2].copy()
    depth1[rng.choice(len(pts), 10, replace=False)] = -1.0  # some unknown
    key = jax.random.PRNGKey(2)
    ok, R, t, _ = relative_pose.solve_relative_hybrid(
        key, jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(depth1),
        jnp.ones(len(p1), bool))
    assert bool(ok)
    # hybrid recovers t with SCALE (not just direction)
    t_gt = -(R21.T @ t21)
    assert np.linalg.norm(np.asarray(t) - t_gt) < 0.02


def test_global_sfm(rng):
    traj = simulate_trajectory(rng, n_frames=8)
    n_lm = 50
    landmarks = np.stack([
        rng.uniform(-3, 3, n_lm), rng.uniform(-3, 3, n_lm),
        rng.uniform(4, 9, n_lm)], -1)
    obs_f, vis_f = project_landmarks(
        traj, landmarks, np.zeros(3), np.array([1.0, 0, 0, 0]))
    obs = np.transpose(obs_f, (1, 0, 2))      # (L, F, 2)
    mask = np.transpose(vis_f, (1, 0))
    key = jax.random.PRNGKey(3)
    l, R_rel, t_rel = sfm.find_frame_l(key, obs, mask, parallax_px=1.0)
    assert l is not None
    ok, R, t, pts, ptv = sfm.construct(key, obs, mask, l, R_rel, t_rel)
    assert ok and ptv.sum() >= n_lm * 0.8
    # check up-to-scale consistency: camera centers vs ground truth (body ==
    # cam here), aligned by the l-anchored similarity
    C = np.stack([-(R[f].T @ t[f]) for f in range(len(R))])
    P_gt = traj["P"] - traj["P"][l]
    R_gt0 = np.asarray(lie.quat_to_rot(jnp.asarray(traj["Q"][l])))
    P_gt = P_gt @ R_gt0       # ground truth in frame-l coords: R_l^T applied
    s = np.linalg.norm(C[-1]) / max(np.linalg.norm(P_gt[-1]), 1e-9)
    err = np.linalg.norm(C / max(s, 1e-9) - P_gt, axis=-1).max()
    assert err < 0.05, err


def test_mono_linear_alignment_recovers_scale_and_gravity(rng):
    traj = simulate_trajectory(rng, n_frames=11)
    F = len(traj["P"])
    ipf = traj["imu_per_frame"]
    dts, accs, gyrs = [], [], []
    for k in range(F - 1):
        sl = slice(k * ipf, (k + 1) * ipf + 1)
        n = ipf
        dts.append(np.full(n, traj["dt"]))
        accs.append(traj["imu_acc"][sl][1:])
        gyrs.append(traj["imu_gyr"][sl][1:])
    params = pre.make_imu_params(dtype=jnp.float64)
    a0 = np.stack([traj["imu_acc"][k * ipf] for k in range(F - 1)])
    g0 = np.stack([traj["imu_gyr"][k * ipf] for k in range(F - 1)])
    pres = pre.preintegrate_batch(
        jnp.asarray(np.stack(dts)), jnp.asarray(np.stack(accs)),
        jnp.asarray(np.stack(gyrs)), jnp.asarray(a0), jnp.asarray(g0),
        jnp.zeros((F - 1, 3)), jnp.zeros((F - 1, 3)), params,
        jnp.ones((F - 1, ipf), bool))

    Rs = np.asarray(lie.quat_to_rot(jnp.asarray(traj["Q"])))
    scale_gt = 4.0
    tic = np.array([0.05, -0.02, 0.01])
    # camera positions in a scaled visual frame: T_cam = (P + R tic) / scale
    T_cam = (traj["P"] + np.einsum("fij,j->fi", Rs, tic)) / scale_gt

    ok, g, v, s = alignment.linear_alignment(
        jnp.asarray(Rs), jnp.asarray(T_cam), pres.delta_p, pres.delta_v,
        pres.sum_dt, jnp.asarray(tic), 9.80766)
    assert bool(ok)
    assert abs(float(s) - scale_gt) / scale_gt < 0.02
    g_w = traj["g"]
    assert np.linalg.norm(np.asarray(g) - g_w) < 0.1
    v_world = np.einsum("fij,fj->fi", Rs, np.asarray(v))
    assert np.abs(v_world - traj["V"]).max() < 0.05


def test_ex_rotation_calibration(rng):
    # ground-truth cam→body rotation
    q_bc = np.asarray(lie.quat_normalize(
        jnp.asarray([0.9, 0.1, -0.2, 0.15], jnp.float64)))
    R_bc = np.asarray(lie.quat_to_rot(jnp.asarray(q_bc)))
    N = 30
    q_imu, q_cam = [], []
    for _ in range(N):
        w = rng.normal(0, 0.3, 3)
        Rb = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float64)))
        Rc = R_bc.T @ Rb @ R_bc          # camera rotation = R_cb Rb R_bc
        q_imu.append(np.asarray(lie.rot_to_quat(jnp.asarray(Rb))))
        q_cam.append(np.asarray(lie.rot_to_quat(jnp.asarray(Rc))))
    q, ok, sv = ex_rotation.calibrate_ex_rotation(
        jnp.asarray(np.stack(q_cam)), jnp.asarray(np.stack(q_imu)),
        jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float64))
    assert bool(ok)
    d = np.asarray(lie.quat_mul(lie.quat_inv(jnp.asarray(q)),
                                jnp.asarray(q_bc)))
    ang = 2 * np.degrees(np.arctan2(np.linalg.norm(d[1:]), abs(d[0])))
    assert ang < 0.5, ang
