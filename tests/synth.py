"""Tiny event-camera simulator + scene generators for tests (ESIM-lite).

Generates events from a translating textured scene: at fine time steps, any
pixel whose log-ish intensity changes beyond a contrast threshold emits an
event with the sign of the change.  Deterministic given the rng.
"""
import numpy as np


def blob_texture(rng, H, W, n_blobs=120, margin=80):
    """Binary-ish blob texture with sharp edges, padded by `margin`."""
    img = np.zeros((H + 2 * margin, W + 2 * margin))
    for _ in range(n_blobs):
        cx = rng.uniform(0, W + 2 * margin)
        cy = rng.uniform(0, H + 2 * margin)
        s = rng.uniform(2, 5)
        y, x = np.mgrid[0:H + 2 * margin, 0:W + 2 * margin]
        img += np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s))
    img = (img > np.percentile(img, 88)).astype(np.float64) * 200.0 + 20.0
    return img, margin


def sample_texture(tex, margin, H, W, off_x, off_y):
    """View of the texture at sub-pixel offset (bilinear)."""
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    xs = x + margin + off_x
    ys = y + margin + off_y
    x0 = np.clip(xs.astype(int), 0, tex.shape[1] - 2)
    y0 = np.clip(ys.astype(int), 0, tex.shape[0] - 2)
    fx = xs - x0
    fy = ys - y0
    return (
        tex[y0, x0] * (1 - fy) * (1 - fx) + tex[y0, x0 + 1] * (1 - fy) * fx
        + tex[y0 + 1, x0] * fy * (1 - fx) + tex[y0 + 1, x0 + 1] * fy * fx
    )


def events_from_motion(tex, margin, H, W, t0, t1, vel, n_steps=20,
                       thresh=8.0, offset0=(0.0, 0.0), jitter_rng=None):
    """Emit events for a camera translating at `vel` (px/s) over [t0, t1].

    Returns (t, x, y, p) arrays sorted by time.
    """
    ts, xs, ys, ps = [], [], [], []
    prev = sample_texture(tex, margin, H, W,
                          offset0[0] + vel[0] * 0.0, offset0[1] + vel[1] * 0.0)
    times = np.linspace(t0, t1, n_steps + 1)
    for k in range(1, n_steps + 1):
        dt_off = times[k] - t0
        cur = sample_texture(tex, margin, H, W,
                             offset0[0] + vel[0] * dt_off, offset0[1] + vel[1] * dt_off)
        diff = cur - prev
        yy, xx = np.nonzero(np.abs(diff) > thresh)
        n = len(yy)
        if n:
            tt = np.full(n, times[k])
            if jitter_rng is not None:
                tt = tt + jitter_rng.uniform(-2e-4, 2e-4, n)
            ts.append(tt)
            xs.append(xx)
            ys.append(yy)
            ps.append((diff[yy, xx] > 0).astype(np.int32))
        prev = cur
    if not ts:
        return (np.zeros(0), np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.int32))
    t = np.concatenate(ts)
    x = np.concatenate(xs).astype(np.int32)
    y = np.concatenate(ys).astype(np.int32)
    p = np.concatenate(ps)
    order = np.argsort(t, kind="stable")
    return t[order], x[order], y[order], p[order]


# ---------------------------------------------------------------------------
# 3-D visual-inertial simulator (for solver / estimator tests)
# ---------------------------------------------------------------------------

def simulate_trajectory(rng, n_frames=11, imu_per_frame=20, frame_dt=0.05,
                        g_w=(0.0, 0.0, 9.80766)):
    """Simulate a smooth 6-DoF trajectory with consistent IMU measurements.

    Returns dict with per-frame states (P/Q/V), per-interval IMU samples
    (dts, accs, gyrs), all float64 numpy. Body accelerometer measures
    R^T (a_world + g).
    """
    import jax.numpy as jnp
    from esvio_tpu.core import lie

    g_w = np.asarray(g_w)
    dt = frame_dt / imu_per_frame
    n_samples = (n_frames - 1) * imu_per_frame + 1

    # smooth world accel / gyro built from a few sinusoids
    tt = np.arange(n_samples) * dt
    def smooth(seed_row, scale):
        w = rng.normal(size=(3, 3)) * scale
        ph = rng.uniform(0, 2 * np.pi, (3, 3))
        fr = rng.uniform(0.3, 1.5, (3, 3))
        return sum(w[:, k][None, :] * np.sin(2 * np.pi * fr[:, k][None, :] * tt[:, None]
                                             + ph[:, k][None, :]) for k in range(3))
    a_w = smooth(0, 1.2)     # (n_samples, 3) world acceleration
    w_b = smooth(1, 0.5)     # body angular velocity

    P = [np.zeros(3)]
    V = [np.array([0.3, -0.2, 0.1])]
    Q = [np.array([1.0, 0, 0, 0])]
    accs = [None] * n_samples
    for k in range(n_samples):
        Rk = np.asarray(lie.quat_to_rot(jnp.asarray(Q[-1], jnp.float64)))
        accs[k] = Rk.T @ (a_w[k] + g_w)
        if k == n_samples - 1:
            break
        # midpoint propagation (matches estimator.cpp:191-198 given these meas)
        w_mid = 0.5 * (w_b[k] + w_b[k + 1])
        q = jnp.asarray(Q[-1], jnp.float64)
        q_new = np.asarray(lie.quat_normalize(lie.quat_mul(
            q, lie.delta_q(jnp.asarray(w_mid * dt, jnp.float64)))))
        R_new = np.asarray(lie.quat_to_rot(jnp.asarray(q_new, jnp.float64)))
        a0_w = Rk @ accs[k] - g_w
        a1_w = R_new @ (R_new.T @ (a_w[k + 1] + g_w)) - g_w
        un_acc = 0.5 * (a0_w + a1_w)
        P.append(P[-1] + V[-1] * dt + 0.5 * un_acc * dt * dt)
        V.append(V[-1] + un_acc * dt)
        Q.append(q_new)

    frames = list(range(0, n_samples, imu_per_frame))
    return dict(
        P=np.asarray([P[i] for i in frames]),
        Q=np.asarray([Q[i] for i in frames]),
        V=np.asarray([V[i] for i in frames]),
        t=np.asarray([tt[i] for i in frames]),
        imu_t=tt, imu_acc=np.asarray(accs), imu_gyr=w_b, dt=dt,
        imu_per_frame=imu_per_frame, g=g_w,
    )


def project_landmarks(traj, landmarks, ex_p, ex_q, noise=0.0, rng=None):
    """Normalized-plane observations of world landmarks from body poses.

    ex: body_T_cam (p, q wxyz). Returns (n_frames, n_lm, 2) and a visibility
    mask (z > 0.1).
    """
    import jax.numpy as jnp
    from esvio_tpu.core import lie

    n_f = len(traj["P"])
    obs = np.zeros((n_f, len(landmarks), 2))
    vis = np.zeros((n_f, len(landmarks)), bool)
    Rq = np.asarray(lie.quat_to_rot(jnp.asarray(traj["Q"], jnp.float64)))
    Rex = np.asarray(lie.quat_to_rot(jnp.asarray(ex_q, jnp.float64)))
    for f in range(n_f):
        pw = landmarks - traj["P"][f]
        p_body = pw @ Rq[f]          # R^T @ pw
        p_cam = (p_body - ex_p) @ Rex
        z = p_cam[:, 2]
        ok = z > 0.1
        obs[f, ok] = p_cam[ok, :2] / z[ok, None]
        vis[f] = ok
    if noise and rng is not None:
        obs += rng.normal(0, noise, obs.shape)
    return obs, vis
