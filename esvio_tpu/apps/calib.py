"""Intrinsic camera calibration from planar-target views (Zhang's method).

TPU-native equivalent of the reference's standalone Calibration executable
(/root/reference/camera_model/src/intrinsic_calib.cc:247 + CameraCalibration.cc):
closed-form initialization from homographies, then a joint batched
Gauss-Newton refinement of intrinsics + distortion + per-view extrinsics —
one vmapped residual over all (view, corner) pairs instead of Ceres.

Corner detection is pluggable (the reference's Chessboard.cc ports to any
saddle-point detector); this module consumes (object_pts, image_pts)
correspondence arrays, e.g. from `esvio_tpu.frontend.detect` or offline
tools, and a small CLI reads/writes .npz / camodocal-style YAML.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from esvio_tpu.core import lie


# ------------------------------------------------------------- homography

def _normalize_2d(p):
    mean = p.mean(0)
    d = np.linalg.norm(p - mean, axis=1).mean()
    s = np.sqrt(2.0) / max(d, 1e-12)
    T = np.array([[s, 0, -s * mean[0]], [0, s, -s * mean[1]], [0, 0, 1.0]])
    ph = np.concatenate([p, np.ones((len(p), 1))], 1) @ T.T
    return ph[:, :2], T


def homography_dlt(obj_xy, img_uv):
    """Normalized DLT homography board-plane → image (per view, host-side)."""
    a, Ta = _normalize_2d(np.asarray(obj_xy, float))
    b, Tb = _normalize_2d(np.asarray(img_uv, float))
    n = len(a)
    A = np.zeros((2 * n, 9))
    A[0::2, 0:2] = a
    A[0::2, 2] = 1
    A[0::2, 6:8] = -b[:, 0:1] * a
    A[0::2, 8] = -b[:, 0]
    A[1::2, 3:5] = a
    A[1::2, 5] = 1
    A[1::2, 6:8] = -b[:, 1:2] * a
    A[1::2, 8] = -b[:, 1]
    H = np.linalg.svd(A)[2][-1].reshape(3, 3)
    H = np.linalg.inv(Tb) @ H @ Ta
    return H / H[2, 2]


def _zhang_intrinsics(Hs):
    """Closed-form K from ≥3 homographies (Zhang 2000, eq. 7-9)."""

    def v(H, i, j):
        return np.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j],
        ])

    V = []
    for H in Hs:
        V.append(v(H, 0, 1))
        V.append(v(H, 0, 0) - v(H, 1, 1))
    b = np.linalg.svd(np.asarray(V))[2][-1]
    B11, B12, B22, B13, B23, B33 = b
    cy = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 ** 2)
    lam = B33 - (B13 ** 2 + cy * (B12 * B13 - B11 * B23)) / B11
    fx = np.sqrt(abs(lam / B11))
    fy = np.sqrt(abs(lam * B11 / (B11 * B22 - B12 ** 2)))
    cx = -B13 * fx ** 2 / lam
    return fx, fy, cx, cy


def _extrinsics_from_h(H, K):
    """Per-view [R|t] from homography (board plane Z=0)."""
    Kinv = np.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / max(np.linalg.norm(Kinv @ h1), 1e-12)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    t = lam * (Kinv @ h3)
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], 1)
    U, _, Vt = np.linalg.svd(R)  # project to SO(3)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = -R
    if t[2] < 0:                 # board must be in front
        R[:, :2] *= -1
        t = -t
    return R, t


# ------------------------------------------------------------- refinement

@functools.partial(jax.jit, static_argnames=("iters",))
def _refine(obj, img, mask, intr0, w0, t0, iters: int = 20):
    """Joint GN over [fx fy cx cy k1 k2 p1 p2] + per-view (ω, t).

    obj (V,N,3) board points, img (V,N,2) detections, mask (V,N)."""
    dtype = img.dtype
    V = obj.shape[0]

    def residual(intr, w, t):
        R = jax.vmap(lie.so3_exp)(w)                        # (V,3,3)
        pc = jnp.einsum("vij,vnj->vni", R, obj) + t[:, None, :]
        z = jnp.where(jnp.abs(pc[..., 2]) > 1e-9, pc[..., 2], 1e-9)
        x = pc[..., 0] / z
        y = pc[..., 1] / z
        fx, fy, cx, cy, k1, k2, p1, p2 = intr
        r2 = x * x + y * y
        rad = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * rad + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
        u = fx * xd + cx
        v_ = fy * yd + cy
        return (jnp.stack([u, v_], -1) - img) * mask[..., None]

    def pack(intr, w, t):
        return jnp.concatenate([intr, w.reshape(-1), t.reshape(-1)])

    def unpack(d):
        return d[:8], d[8:8 + 3 * V].reshape(V, 3), \
            d[8 + 3 * V:].reshape(V, 3)

    def step(_, carry):
        intr, w, t = carry

        def r_of(d):
            di, dw, dt = unpack(d)
            return residual(intr + di, w + dw, t + dt).reshape(-1)

        zdim = 8 + 6 * V
        z = jnp.zeros(zdim, dtype)
        r = r_of(z)
        J = jax.jacfwd(r_of)(z)
        H = J.T @ J + 1e-6 * jnp.eye(zdim, dtype=dtype)
        d = -jnp.linalg.solve(H, J.T @ r)
        di, dw, dt = unpack(d)
        return intr + di, w + dw, t + dt

    intr, w, t = jax.lax.fori_loop(0, iters, step, (intr0, w0, t0))
    r = residual(intr, w, t)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    rms = jnp.sqrt(jnp.sum(r ** 2) / n)
    return intr, w, t, rms


def calibrate_pinhole(object_pts, image_pts, mask=None, iters: int = 20):
    """Full pipeline: Zhang init + joint GN refinement.

    object_pts: (V, N, 2|3) planar board points (Z ignored/0);
    image_pts: (V, N, 2) detections; mask: (V, N) valid detections.
    Returns dict(fx, fy, cx, cy, dist(4,), rvecs (V,3), tvecs (V,3), rms)."""
    object_pts = np.asarray(object_pts, float)
    image_pts = np.asarray(image_pts, float)
    V, N = image_pts.shape[:2]
    if object_pts.shape[-1] == 2:
        object_pts = np.concatenate(
            [object_pts, np.zeros((V, N, 1))], axis=-1)
    if mask is None:
        mask = np.ones((V, N), bool)

    Hs = [homography_dlt(object_pts[v][mask[v], :2], image_pts[v][mask[v]])
          for v in range(V)]
    fx, fy, cx, cy = _zhang_intrinsics(Hs)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    ws, ts = [], []
    for H in Hs:
        R, t = _extrinsics_from_h(H, K)
        ws.append(np.asarray(lie.so3_log(jnp.asarray(R, jnp.float64))))
        ts.append(t)

    intr0 = jnp.asarray([fx, fy, cx, cy, 0.0, 0.0, 0.0, 0.0], jnp.float64)
    intr, w, t, rms = _refine(
        jnp.asarray(object_pts), jnp.asarray(image_pts),
        jnp.asarray(mask, jnp.float64), intr0,
        jnp.asarray(np.stack(ws)), jnp.asarray(np.stack(ts)), iters=iters)
    intr = np.asarray(intr)
    return dict(
        fx=intr[0], fy=intr[1], cx=intr[2], cy=intr[3], dist=intr[4:8],
        rvecs=np.asarray(w), tvecs=np.asarray(t), rms=float(rms))


@functools.partial(jax.jit, static_argnames=("iters",))
def _refine_kb(obj, img, mask, intr0, w0, t0, iters: int = 20):
    """Joint GN over [mu mv u0 v0 k2 k3 k4 k5] + per-view (ω, t) for the
    Kannala-Brandt (EQUIDISTANT) model — r(θ) = θ + k2θ³ + k3θ⁵ + k4θ⁷ +
    k5θ⁹ (reference EquidistantCamera.cc:spaceToPlane; the model VECtor's
    fisheye rigs need, VERDICT r3 #8).  Shares the batched-GN machinery of
    the pinhole path."""
    dtype = img.dtype
    V = obj.shape[0]

    def residual(intr, w, t):
        R = jax.vmap(lie.so3_exp)(w)                        # (V,3,3)
        pc = jnp.einsum("vij,vnj->vni", R, obj) + t[:, None, :]
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        rho = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(rho, z)
        mu, mv, u0, v0, k2, k3, k4, k5 = intr
        th2 = theta * theta
        r_th = theta * (1.0 + th2 * (k2 + th2 * (k3 + th2 * (k4 + th2 * k5))))
        inv_rho = 1.0 / jnp.maximum(rho, 1e-12)
        u = mu * r_th * x * inv_rho + u0
        v_ = mv * r_th * y * inv_rho + v0
        return (jnp.stack([u, v_], -1) - img) * mask[..., None]

    def unpack(d):
        return d[:8], d[8:8 + 3 * V].reshape(V, 3), \
            d[8 + 3 * V:].reshape(V, 3)

    def step(_, carry):
        intr, w, t = carry

        def r_of(d):
            di, dw, dt = unpack(d)
            return residual(intr + di, w + dw, t + dt).reshape(-1)

        zdim = 8 + 6 * V
        z = jnp.zeros(zdim, dtype)
        r = r_of(z)
        J = jax.jacfwd(r_of)(z)
        H = J.T @ J + 1e-6 * jnp.eye(zdim, dtype=dtype)
        d = -jnp.linalg.solve(H, J.T @ r)
        di, dw, dt = unpack(d)
        return intr + di, w + dw, t + dt

    intr, w, t = jax.lax.fori_loop(0, iters, step, (intr0, w0, t0))
    r = residual(intr, w, t)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    rms = jnp.sqrt(jnp.sum(r ** 2) / n)
    return intr, w, t, rms


def calibrate_kb(object_pts, image_pts, mask=None, iters: int = 30):
    """Kannala-Brandt (EQUIDISTANT) calibration: Zhang init (pinhole
    approximation of the central region) + joint KB GN refinement.

    Returns dict(mu, mv, u0, v0, ks(4,), rvecs, tvecs, rms)."""
    object_pts = np.asarray(object_pts, float)
    image_pts = np.asarray(image_pts, float)
    V, N = image_pts.shape[:2]
    if object_pts.shape[-1] == 2:
        object_pts = np.concatenate(
            [object_pts, np.zeros((V, N, 1))], axis=-1)
    if mask is None:
        mask = np.ones((V, N), bool)

    Hs = [homography_dlt(object_pts[v][mask[v], :2], image_pts[v][mask[v]])
          for v in range(V)]
    fx, fy, cx, cy = _zhang_intrinsics(Hs)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    ws, ts = [], []
    for H in Hs:
        R, t = _extrinsics_from_h(H, K)
        ws.append(np.asarray(lie.so3_log(jnp.asarray(R, jnp.float64))))
        ts.append(t)

    intr0 = jnp.asarray([fx, fy, cx, cy, 0.0, 0.0, 0.0, 0.0], jnp.float64)
    intr, w, t, rms = _refine_kb(
        jnp.asarray(object_pts), jnp.asarray(image_pts),
        jnp.asarray(mask, jnp.float64), intr0,
        jnp.asarray(np.stack(ws)), jnp.asarray(np.stack(ts)), iters=iters)
    intr = np.asarray(intr)
    return dict(
        mu=intr[0], mv=intr[1], u0=intr[2], v0=intr[3], ks=intr[4:8],
        rvecs=np.asarray(w), tvecs=np.asarray(t), rms=float(rms))


def write_camera_yaml_kb(path, result, width, height, name="camera"):
    """camodocal-style KANNALA_BRANDT YAML
    (EquidistantCamera::Parameters::writeToYamlFile) — readable back by
    io/config.load_camera_yaml."""
    k = result["ks"]
    with open(path, "w") as f:
        f.write("%YAML:1.0\n---\n")
        f.write("model_type: KANNALA_BRANDT\n")
        f.write(f"camera_name: {name}\n")
        f.write(f"image_width: {width}\nimage_height: {height}\n")
        f.write("projection_parameters:\n")
        f.write(f"   k2: {k[0]:.10e}\n   k3: {k[1]:.10e}\n")
        f.write(f"   k4: {k[2]:.10e}\n   k5: {k[3]:.10e}\n")
        f.write(f"   mu: {result['mu']:.10e}\n   mv: {result['mv']:.10e}\n")
        f.write(f"   u0: {result['u0']:.10e}\n   v0: {result['v0']:.10e}\n")


def write_camera_yaml(path, result, width, height, name="camera"):
    """camodocal-style pinhole YAML (PinholeCamera::Parameters::writeToYamlFile)."""
    d = result["dist"]
    with open(path, "w") as f:
        f.write("%YAML:1.0\n---\n")
        f.write("model_type: PINHOLE\n")
        f.write(f"camera_name: {name}\n")
        f.write(f"image_width: {width}\nimage_height: {height}\n")
        f.write("distortion_parameters:\n")
        f.write(f"   k1: {d[0]:.10e}\n   k2: {d[1]:.10e}\n")
        f.write(f"   p1: {d[2]:.10e}\n   p2: {d[3]:.10e}\n")
        f.write("projection_parameters:\n")
        f.write(f"   fx: {result['fx']:.10e}\n   fy: {result['fy']:.10e}\n")
        f.write(f"   cx: {result['cx']:.10e}\n   cy: {result['cy']:.10e}\n")


def main(argv=None):
    """CLI: calibrate from an .npz with object_pts/image_pts[/mask]."""
    import argparse
    jax.config.update("jax_enable_x64", True)   # calibration wants f64
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("npz", help=".npz with object_pts (V,N,2|3), "
                    "image_pts (V,N,2), optional mask (V,N)")
    ap.add_argument("--out", default="camera_calib.yaml")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--model", choices=("pinhole", "kb"), default="pinhole",
                    help="pinhole radtan or Kannala-Brandt fisheye")
    args = ap.parse_args(argv)
    d = np.load(args.npz)
    if args.model == "kb":
        res = calibrate_kb(d["object_pts"], d["image_pts"],
                           d.get("mask"), iters=max(args.iters, 30))
        write_camera_yaml_kb(args.out, res, args.width, args.height)
        print(f"rms: {res['rms']:.4f} px  mu={res['mu']:.2f} "
              f"mv={res['mv']:.2f} u0={res['u0']:.2f} v0={res['v0']:.2f}\n"
              f"wrote {args.out}")
        return
    res = calibrate_pinhole(d["object_pts"], d["image_pts"],
                            d.get("mask"), iters=args.iters)
    write_camera_yaml(args.out, res, args.width, args.height)
    print(f"rms: {res['rms']:.4f} px  fx={res['fx']:.2f} fy={res['fy']:.2f} "
          f"cx={res['cx']:.2f} cy={res['cy']:.2f}\nwrote {args.out}")


if __name__ == "__main__":
    main()
