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


def bandlimited_texture(rng, H, W, margin=250, cell=6, octaves=3):
    """Smooth band-limited random texture (multi-octave value noise,
    bicubic-upsampled): C¹ gradients everywhere, no step edges.

    The blob texture's binary edges quantize event positions to the pixel
    grid, which floors LK tracking noise at ~0.5 px and starves stereo-scale
    observability at ≥180×240 (NOTES_r4 synthetic-fidelity cliff).  This
    field keeps |∇I| informative at every pixel so time-surface LK stays
    sub-pixel at DSEC geometry.
    """
    import jax
    import jax.numpy as jnp
    HH, WW = H + 2 * margin, W + 2 * margin
    img = np.zeros((HH, WW))
    amp = 1.0
    for o in range(octaves):
        c = cell * (2 ** o)
        gh, gw = HH // c + 2, WW // c + 2
        g = rng.normal(size=(gh, gw))
        up = np.asarray(jax.image.resize(
            jnp.asarray(g, jnp.float32), (gh * c, gw * c), "bicubic"))
        img += amp * up[:HH, :WW]
        amp *= 0.6
    img -= img.min()
    img /= max(img.max(), 1e-9)
    return img * 200.0 + 20.0, margin


class ContrastEventModel:
    """ESIM-style per-pixel contrast-threshold event camera.

    Each pixel holds a reference intensity; an event fires every time the
    current intensity departs from the reference by more than `C`, and the
    reference steps toward the new value in multiples of C.  Unlike a plain
    frame-diff, slow sub-threshold motion ACCUMULATES until it crosses the
    threshold — required for smooth (band-limited) textures.
    """

    def __init__(self, img0, C=8.0):
        self.ref = img0.astype(np.float64).copy()
        self.C = float(C)

    def step(self, img, t, rng=None):
        d = img - self.ref
        n = np.floor(np.abs(d) / self.C)
        yy, xx = np.nonzero(n >= 1)
        if not len(yy):
            return (np.zeros(0), np.zeros(0, np.int32),
                    np.zeros(0, np.int32), np.zeros(0, np.int32))
        sgn = np.sign(d[yy, xx])
        self.ref[yy, xx] += sgn * n[yy, xx] * self.C
        tt = np.full(len(yy), t)
        if rng is not None:
            tt = tt + rng.uniform(-1e-4, 1e-4, len(yy))
        return tt, xx.astype(np.int32), yy.astype(np.int32), \
            (sgn > 0).astype(np.int32)


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


def events_from_path(tex, margin, H, W, times, offsets, thresh=8.0,
                     jitter_rng=None):
    """Events for an arbitrary sub-pixel offset path (offsets[k] at times[k])."""
    ts, xs, ys, ps = [], [], [], []
    prev = sample_texture(tex, margin, H, W, offsets[0][0], offsets[0][1])
    for k in range(1, len(times)):
        cur = sample_texture(tex, margin, H, W, offsets[k][0], offsets[k][1])
        diff = cur - prev
        yy, xx = np.nonzero(np.abs(diff) > thresh)
        if len(yy):
            tt = np.full(len(yy), times[k])
            if jitter_rng is not None:
                tt = tt + jitter_rng.uniform(-1e-4, 1e-4, len(yy))
            ts.append(tt)
            xs.append(xx)
            ys.append(yy)
            ps.append((diff[yy, xx] > 0).astype(np.int32))
        prev = cur
    if not ts:
        return (np.zeros(0), np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.int32))
    t = np.concatenate(ts)
    order = np.argsort(t, kind="stable")
    return (t[order], np.concatenate(xs).astype(np.int32)[order],
            np.concatenate(ys).astype(np.int32)[order],
            np.concatenate(ps)[order])


def planar_vio_sequence(rng, H=120, W=160, focal=200.0, plane_z=4.0,
                        baseline=0.10, duration=2.0, imu_hz=200,
                        fine_steps_per_s=400, g_norm=9.80766):
    """Full stereo-event + IMU sequence: camera translating above a textured
    plane at depth `plane_z` (identity rotation ⇒ exact event generation via
    texture shifts).  Returns (SequenceData, gt_t, gt_P)."""
    from esvio_tpu.io import datasets as ds

    tex, margin = blob_texture(rng, H, W, n_blobs=int(H * W / 90), margin=200)

    # smooth analytic trajectory (x, y); z fixed
    w1, w2 = 0.7, 0.4
    a1, a2 = 0.55, 0.4

    def pos(t):
        return np.stack([a1 * np.sin(2 * np.pi * w1 * t),
                         a2 * (1 - np.cos(2 * np.pi * w2 * t)),
                         np.zeros_like(t)], -1)

    def accel(t):
        return np.stack([-a1 * (2 * np.pi * w1) ** 2 * np.sin(2 * np.pi * w1 * t),
                         a2 * (2 * np.pi * w2) ** 2 * np.cos(2 * np.pi * w2 * t),
                         np.zeros_like(t)], -1)

    t0 = 1.0
    fine_t = np.arange(t0, t0 + duration, 1.0 / fine_steps_per_s)
    fine_p = pos(fine_t - t0)
    scale = focal / plane_z
    off_l = fine_p[:, :2] * scale + np.array([W + 50, H + 50])
    disp = focal * baseline / plane_z
    off_r = off_l + np.array([disp, 0.0])  # right cam at +x: u_r = u_l − disp

    tl, xl, yl, pl = events_from_path(tex, margin, H, W, fine_t, off_l,
                                      jitter_rng=rng)
    tr, xr, yr, pr = events_from_path(tex, margin, H, W, fine_t, off_r,
                                      jitter_rng=rng)

    imu_t = np.arange(t0, t0 + duration, 1.0 / imu_hz)
    acc = accel(imu_t - t0) + np.array([0.0, 0.0, g_norm])
    gyr = np.zeros((len(imu_t), 3))

    seq = ds.SequenceData(
        events_left=ds.EventStream(tl, xl, yl, pl),
        events_right=ds.EventStream(tr, xr, yr, pr),
        imu=ds.ImuStream(imu_t, acc, gyr),
        ground_truth=(imu_t, pos(imu_t - t0)),
    )
    return seq, imu_t, pos(imu_t - t0)


def render_plane(tex, margin, H, W, focal, cx, cy, R_wc, t_wc, plane_z,
                 tex_scale, tex_cx, tex_cy):
    """Render a textured plane z=plane_z seen from camera pose (R_wc, t_wc).

    Texture pixel of world (x, y): (x*tex_scale + tex_cx, y*tex_scale + tex_cy).
    """
    v, u = np.mgrid[0:H, 0:W].astype(np.float64)
    rays = np.stack([(u - cx) / focal, (v - cy) / focal, np.ones_like(u)], -1)
    rays_w = rays @ R_wc.T
    lam = (plane_z - t_wc[2]) / rays_w[..., 2]
    X = t_wc[0] + lam * rays_w[..., 0]
    Y = t_wc[1] + lam * rays_w[..., 1]
    tx = X * tex_scale + tex_cx
    ty = Y * tex_scale + tex_cy
    x0 = np.clip(tx.astype(int), 0, tex.shape[1] - 2)
    y0 = np.clip(ty.astype(int), 0, tex.shape[0] - 2)
    fx = np.clip(tx - x0, 0, 1)
    fy = np.clip(ty - y0, 0, 1)
    return (tex[y0, x0] * (1 - fy) * (1 - fx) + tex[y0, x0 + 1] * (1 - fy) * fx
            + tex[y0 + 1, x0] * fy * (1 - fx) + tex[y0 + 1, x0 + 1] * fy * fx)


def planar_vio_sequence_rot(rng, H=120, W=160, focal=200.0, plane_z=4.0,
                            baseline=0.10, duration=2.0, imu_hz=200,
                            event_hz=400, g_norm=9.80766, rot_amp_deg=4.0,
                            frame_hz=0, img_H=None, img_W=None,
                            img_focal=None, texture="blob",
                            gyr_bias=None, acc_bias=None,
                            imu_noise_rng=None, gyr_n=0.0, acc_n=0.0):
    """Stereo events + IMU from a camera over a textured plane WITH rotational
    excitation (pitch/roll wobble) so gravity/bias are observable.

    texture="smooth" uses the band-limited field + ESIM contrast model
    (sub-pixel event fidelity at large geometries); "blob" keeps the legacy
    binary texture + frame-diff events that the committed goldens pin.

    gyr_bias / acc_bias: constant sensor biases (rad/s, m/s²) added to the
    measurements — real IMUs have them, VIO must estimate them, and without
    them the e2e tests never exercise the bias chain and accumulate no drift
    for loop closure to fix.  gyr_n / acc_n: white-noise std per sample
    (needs imu_noise_rng).
    """
    import jax.numpy as jnp
    from esvio_tpu.core import lie
    from esvio_tpu.io import datasets as ds

    if texture == "smooth":
        tex, margin = bandlimited_texture(rng, H * 2, W * 2, margin=250)
    else:
        tex, margin = blob_texture(rng, H * 2, W * 2, n_blobs=int(H * W / 25),
                                   margin=250)
    tex_scale = focal / plane_z
    tex_cx = tex.shape[1] / 2
    tex_cy = tex.shape[0] / 2
    cx, cy = W / 2, H / 2

    # constant-speed circular translation: optical flow never vanishes, so
    # the event stream has no blackouts (reversal blackouts are a degenerate
    # case for any event-based tracker, reference included)
    wc, wr = 0.5, 0.9
    radius = 0.4
    amp = np.deg2rad(rot_amp_deg)

    def pos(t):
        th = 2 * np.pi * wc * t
        return np.stack([radius * np.sin(th), radius * (np.cos(th) - 1.0),
                         np.zeros_like(t)], -1)

    def accel_w(t):
        th = 2 * np.pi * wc * t
        k = (2 * np.pi * wc) ** 2
        return np.stack([-k * radius * np.sin(th), -k * radius * np.cos(th),
                         np.zeros_like(t)], -1)

    def rotvec(t):
        return np.stack([amp * np.sin(2 * np.pi * wr * t),
                         amp * np.sin(2 * np.pi * wr * 0.77 * t + 1.0),
                         np.zeros_like(t)], -1)

    def rot(t):
        import numpy as _np
        return np.asarray(lie.so3_exp(jnp.asarray(rotvec(np.atleast_1d(t)))))

    t0 = 1.0
    # IMU: gyro from discrete log of relative rotations (matches the
    # estimator's discrete propagation closely at 200 Hz)
    imu_t = np.arange(t0, t0 + duration, 1.0 / imu_hz)
    Rs = rot(imu_t - t0)
    acc = np.einsum("kij,kj->ki", Rs.transpose(0, 2, 1),
                    accel_w(imu_t - t0) + np.array([0, 0, g_norm]))
    gyr = np.zeros((len(imu_t), 3))
    dt_imu = 1.0 / imu_hz
    for k in range(len(imu_t) - 1):
        dR = Rs[k].T @ Rs[k + 1]
        gyr[k] = np.asarray(lie.so3_log(jnp.asarray(dR))) / dt_imu
    gyr[-1] = gyr[-2]
    if gyr_bias is not None:
        gyr = gyr + np.asarray(gyr_bias)[None, :]
    if acc_bias is not None:
        acc = acc + np.asarray(acc_bias)[None, :]
    if imu_noise_rng is not None:
        if gyr_n:
            gyr = gyr + imu_noise_rng.normal(0, gyr_n, gyr.shape)
        if acc_n:
            acc = acc + imu_noise_rng.normal(0, acc_n, acc.shape)

    # events from frame diffs of the homography renders
    ev_t = np.arange(t0, t0 + duration, 1.0 / event_hz)

    def gen_events(cam_offset):
        ts, xs, ys, ps = [], [], [], []
        model = None
        prev = None
        for k, t in enumerate(ev_t):
            tt = t - t0
            R = rot(tt)[0]
            p = pos(np.atleast_1d(tt))[0] + R @ cam_offset
            img = render_plane(tex, margin, H, W, focal, cx, cy, R, p,
                               plane_z, tex_scale, tex_cx, tex_cy)
            if texture == "smooth":
                # ESIM contrast model: sub-threshold motion accumulates
                if model is None:
                    model = ContrastEventModel(img, C=8.0)
                else:
                    et, ex, ey, ep = model.step(img, t, rng)
                    if len(et):
                        ts.append(et)
                        xs.append(ex)
                        ys.append(ey)
                        ps.append(ep)
            elif prev is not None:
                diff = img - prev
                yy, xx = np.nonzero(np.abs(diff) > 8.0)
                if len(yy):
                    tstamp = np.full(len(yy), t) + rng.uniform(-1e-4, 1e-4,
                                                               len(yy))
                    ts.append(tstamp)
                    xs.append(xx)
                    ys.append(yy)
                    ps.append((diff[yy, xx] > 0).astype(np.int32))
            prev = img
        t_all = np.concatenate(ts)
        order = np.argsort(t_all, kind="stable")
        return (t_all[order], np.concatenate(xs).astype(np.int32)[order],
                np.concatenate(ys).astype(np.int32)[order],
                np.concatenate(ps)[order])

    tl, xl, yl, pl = gen_events(np.zeros(3))
    tr, xr, yr, pr = gen_events(np.array([baseline, 0.0, 0.0]))

    # optional stereo FRAMES at their own (possibly different) geometry —
    # exercises the ESVIO image path with image_width/height ≠ event dims
    images_l = images_r = None
    if frame_hz:
        fH = img_H or H
        fW = img_W or W
        ff = img_focal or focal * (fW / W)   # same FOV by default
        fcx, fcy = fW / 2, fH / 2
        f_t = np.arange(t0 + 0.5 / frame_hz, t0 + duration, 1.0 / frame_hz)

        def render_frames(cam_offset):
            frames = np.zeros((len(f_t), fH, fW), np.float32)
            for k, t in enumerate(f_t):
                tt = t - t0
                R = rot(tt)[0]
                p = pos(np.atleast_1d(tt))[0] + R @ cam_offset
                frames[k] = render_plane(tex, margin, fH, fW, ff, fcx, fcy,
                                         R, p, plane_z, tex_scale, tex_cx,
                                         tex_cy)
            return frames

        images_l = (f_t, render_frames(np.zeros(3)))
        images_r = (f_t, render_frames(np.array([baseline, 0.0, 0.0])))

    seq = ds.SequenceData(
        events_left=ds.EventStream(tl, xl, yl, pl),
        events_right=ds.EventStream(tr, xr, yr, pr),
        imu=ds.ImuStream(imu_t, acc, gyr),
        images_left=images_l, images_right=images_r,
        ground_truth=(imu_t, pos(imu_t - t0)),
    )
    return seq, imu_t, pos(imu_t - t0)
