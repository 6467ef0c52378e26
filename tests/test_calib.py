"""Intrinsic calibration (Zhang init + GN refine) on a synthetic chessboard.

Ground-truth pinhole + radtan camera, 12 views of an 8×6 board — the
calibration must recover intrinsics to <0.2 % and distortion to <5e-3,
and round-trip through the camodocal YAML writer/loader."""
import numpy as np
import jax.numpy as jnp

from esvio_tpu.apps import calib
from esvio_tpu.core import camera as cam_mod, lie
from esvio_tpu.io.config import load_camera_yaml


def _board(nx=8, ny=6, square=0.03):
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny))
    return np.stack([xs.ravel() * square, ys.ravel() * square,
                     np.zeros(nx * ny)], -1)


def _views(rng, board, V=16):
    # strong tilts + depth range: cx/cy–translation coupling needs oblique
    # views to be well conditioned (same advice as the reference's calib docs)
    ws, ts = [], []
    for _ in range(V):
        w = rng.normal(0, 0.45, 3)
        w[2] = rng.normal(0, 0.2)
        t = np.array([rng.uniform(-0.15, 0.15), rng.uniform(-0.12, 0.12),
                      rng.uniform(0.3, 0.9)])
        t[:2] -= board[:, :2].mean(0)
        ws.append(w)
        ts.append(t)
    return np.stack(ws), np.stack(ts)


def test_calibrate_pinhole(rng, tmp_path):
    gt = dict(fx=420.0, fy=415.0, cx=330.0, cy=245.0,
              dist=np.array([-0.30, 0.10, 1e-3, -5e-4]))
    cam = cam_mod.make_pinhole(gt["fx"], gt["fy"], gt["cx"], gt["cy"],
                               dist=tuple(gt["dist"]), width=640, height=480,
                               dtype=jnp.float64)
    board = _board()
    ws, ts = _views(rng, board)
    V, N = len(ws), len(board)
    img = np.zeros((V, N, 2))
    for v in range(V):
        R = np.asarray(lie.so3_exp(jnp.asarray(ws[v])))
        pc = board @ R.T + ts[v]
        img[v] = np.asarray(cam_mod.space_to_plane(cam, jnp.asarray(pc)))
    img += rng.normal(0, 0.1, img.shape)          # 0.1 px detection noise

    obj = np.tile(board[None], (V, 1, 1))
    res = calib.calibrate_pinhole(obj, img)
    # noise-free recovery is exact (rms 0); these bounds are the statistical
    # limit for 0.1 px detection noise over 16 views
    assert res["rms"] < 0.15, res["rms"]
    for k in ("fx", "fy"):
        assert abs(res[k] - gt[k]) / gt[k] < 0.002, (k, res[k], gt[k])
    for k in ("cx", "cy"):
        assert abs(res[k] - gt[k]) < 1.0, (k, res[k], gt[k])
    assert np.abs(res["dist"] - gt["dist"]).max() < 5e-3

    # YAML round trip through the config loader
    out = tmp_path / "cam.yaml"
    calib.write_camera_yaml(str(out), res, 640, 480)
    cam2 = load_camera_yaml(str(out))
    assert abs(float(cam2.fx) - res["fx"]) < 1e-3
    uv = jnp.asarray([[321.0, 200.0]])
    ray = cam_mod.lift_projective(cam2, uv)
    back = cam_mod.space_to_plane(cam2, ray)
    assert np.allclose(np.asarray(back), np.asarray(uv), atol=1e-2)


def render_chessboard(rows, cols, square=20, margin=30, warp=None, rng=None):
    """Synthetic chessboard image with (rows, cols) INNER corners; returns
    (img, inner corner coords row-major)."""
    ny, nx = rows + 1, cols + 1
    H = ny * square + 2 * margin
    W = nx * square + 2 * margin
    y, x = np.mgrid[0:H, 0:W]
    bx = (x - margin) // square
    by = (y - margin) // square
    inside = (x >= margin) & (x < W - margin) & (y >= margin) & (y < H - margin)
    img = np.where(inside & (((bx + by) % 2) == 0), 220.0, 40.0)
    img = np.where(inside, img, 130.0)
    corners = np.stack(np.meshgrid(
        margin + square * np.arange(1, nx),
        margin + square * np.arange(1, ny), indexing="xy"), -1)
    corners = corners.reshape(rows, cols, 2).reshape(-1, 2).astype(float)
    if rng is not None:
        img = img + rng.normal(0, 3.0, img.shape)
    return img, corners


def test_chessboard_detection(rng):
    """find_chessboard (Chessboard.cc analog): all inner corners found,
    ordered row-major, sub-pixel accurate."""
    from esvio_tpu.apps.chessboard import find_chessboard

    rows, cols = 5, 7
    img, gt = render_chessboard(rows, cols, rng=rng)
    grid, ok = find_chessboard(img, rows, cols)
    assert ok, "chessboard not found"
    assert grid.shape == (rows * cols, 2)
    err = np.linalg.norm(grid - gt, axis=1)
    assert err.max() < 1.0, err.max()
    assert err.mean() < 0.5, err.mean()


def test_calibrate_kb_fisheye(rng, tmp_path):
    """KB (EQUIDISTANT) calibration recovers ground-truth mu/mv/u0/v0 and
    k2..k5 on a synthetic fisheye rig (VERDICT r3 #8; the model VECtor's
    fisheye needs — reference EquidistantCamera.cc + intrinsic_calib.cc:247)."""
    gt = dict(mu=380.0, mv=378.0, u0=320.0, v0=240.0,
              ks=np.array([-0.01, 0.02, -0.008, 0.001]))
    cam = cam_mod.make_equidistant(gt["mu"], gt["mv"], gt["u0"], gt["v0"],
                                   ks=tuple(gt["ks"]), width=640, height=480,
                                   dtype=jnp.float64)
    board = _board()
    ws, ts = _views(rng, board)
    V, N = len(ws), len(board)
    img = np.zeros((V, N, 2))
    for v in range(V):
        R = np.asarray(lie.so3_exp(jnp.asarray(ws[v])))
        pc = board @ R.T + ts[v]
        img[v] = np.asarray(cam_mod.space_to_plane(cam, jnp.asarray(pc)))
    img += rng.normal(0, 0.1, img.shape)

    obj = np.tile(board[None], (V, 1, 1))
    res = calib.calibrate_kb(obj, img)
    assert res["rms"] < 0.15, res["rms"]
    for k in ("mu", "mv"):
        assert abs(res[k] - gt[k]) / gt[k] < 0.005, (k, res[k], gt[k])
    for k in ("u0", "v0"):
        assert abs(res[k] - gt[k]) < 1.5, (k, res[k], gt[k])
    # the individual θ-polynomial coefficients trade off over a finite θ
    # range (rms stays at the noise floor) — assert FUNCTIONAL equivalence:
    # the recovered model projects like the ground truth across the full
    # observed field of view
    cam_fit = cam_mod.make_equidistant(
        res["mu"], res["mv"], res["u0"], res["v0"], ks=tuple(res["ks"]),
        width=640, height=480, dtype=jnp.float64)
    th = np.linspace(0.02, 0.75, 24)              # up to ~43° off-axis
    psi = np.linspace(0, 2 * np.pi, 13)[:-1]
    rays = np.stack([np.outer(np.sin(th), np.cos(psi)).ravel(),
                     np.outer(np.sin(th), np.sin(psi)).ravel(),
                     np.outer(np.cos(th), np.ones_like(psi)).ravel()], -1)
    uv_gt = np.asarray(cam_mod.space_to_plane(cam, jnp.asarray(rays)))
    uv_fit = np.asarray(cam_mod.space_to_plane(cam_fit, jnp.asarray(rays)))
    assert np.abs(uv_fit - uv_gt).max() < 1.0, np.abs(uv_fit - uv_gt).max()

    # YAML round-trip through the product reader
    path = tmp_path / "kb.yaml"
    calib.write_camera_yaml_kb(str(path), res, 640, 480)
    cam2 = load_camera_yaml(str(path))
    ray = np.asarray(cam_mod.lift_projective(
        cam2, jnp.asarray([[400.0, 300.0]])))[0]
    uv = np.asarray(cam_mod.space_to_plane(cam2, jnp.asarray([ray])))[0]
    assert np.abs(uv - [400.0, 300.0]).max() < 0.1


def test_calibrate_mei(rng, tmp_path):
    """MEI (unified omnidirectional) calibration recovers the ground-truth
    camera functionally on a synthetic catadioptric rig (reference
    intrinsic_calib.cc:247 --camera-model mei, CostFunctionFactory.cc MEI
    residuals)."""
    gt = dict(gamma1=760.0, gamma2=755.0, u0=325.0, v0=242.0, xi=0.9,
              dist=np.array([-0.15, 0.05, 5e-4, -3e-4]))
    cam = cam_mod.make_mei(gt["xi"], gt["gamma1"], gt["gamma2"],
                           gt["u0"], gt["v0"], dist=tuple(gt["dist"]),
                           width=640, height=480, dtype=jnp.float64)
    board = _board()
    ws, ts = _views(rng, board)
    V, N = len(ws), len(board)
    img = np.zeros((V, N, 2))
    for v in range(V):
        R = np.asarray(lie.so3_exp(jnp.asarray(ws[v])))
        pc = board @ R.T + ts[v]
        img[v] = np.asarray(cam_mod.space_to_plane(cam, jnp.asarray(pc)))
    img += rng.normal(0, 0.1, img.shape)

    obj = np.tile(board[None], (V, 1, 1))
    res = calib.calibrate_mei(obj, img)
    assert res["rms"] < 0.15, res["rms"]
    # xi trades off against gamma over a finite FoV (the classic MEI
    # ambiguity); assert FUNCTIONAL equivalence like the KB test
    cam_fit = cam_mod.make_mei(
        res["xi"], res["gamma1"], res["gamma2"], res["u0"], res["v0"],
        dist=tuple(res["dist"]), width=640, height=480, dtype=jnp.float64)
    th = np.linspace(0.02, 0.75, 24)
    psi = np.linspace(0, 2 * np.pi, 13)[:-1]
    rays = np.stack([np.outer(np.sin(th), np.cos(psi)).ravel(),
                     np.outer(np.sin(th), np.sin(psi)).ravel(),
                     np.outer(np.cos(th), np.ones_like(psi)).ravel()], -1)
    uv_gt = np.asarray(cam_mod.space_to_plane(cam, jnp.asarray(rays)))
    uv_fit = np.asarray(cam_mod.space_to_plane(cam_fit, jnp.asarray(rays)))
    assert np.abs(uv_fit - uv_gt).max() < 1.0, np.abs(uv_fit - uv_gt).max()

    # YAML round-trip through the product reader
    path = tmp_path / "mei.yaml"
    calib.write_camera_yaml_mei(str(path), res, 640, 480)
    cam2 = load_camera_yaml(str(path))
    assert abs(float(cam2.xi) - res["xi"]) < 1e-6
    ray = np.asarray(cam_mod.lift_projective(
        cam2, jnp.asarray([[400.0, 300.0]])))[0]
    uv = np.asarray(cam_mod.space_to_plane(cam2, jnp.asarray([ray])))[0]
    assert np.abs(uv - [400.0, 300.0]).max() < 0.1


def test_calibrate_scaramuzza(rng, tmp_path):
    """Scaramuzza/OCam calibration: forward-poly GN + inverse-poly fit
    recovers a ground-truth OCam camera functionally (reference
    intrinsic_calib.cc --camera-model scaramuzza)."""
    # ground-truth forward polynomial (typical OCamCalib shape: a1 = 0)
    gt_poly = np.array([-420.0, 0.0, 8.0e-4, -2.0e-7, 1.0e-10])
    gt_cx, gt_cy = 322.0, 243.0
    gt_inv = calib.fit_inv_poly(gt_poly, max_radius=np.hypot(322.0, 243.0))
    cam = cam_mod.make_scaramuzza(gt_poly, gt_inv, cx=gt_cx, cy=gt_cy,
                                  width=640, height=480, dtype=jnp.float64)
    # GT projection must itself be consistent (inv fit quality)
    ray = np.asarray(cam_mod.lift_projective(
        cam, jnp.asarray([[420.0, 310.0]])))[0]
    uv = np.asarray(cam_mod.space_to_plane(cam, jnp.asarray([ray])))[0]
    assert np.abs(uv - [420.0, 310.0]).max() < 0.05, uv

    board = _board()
    ws, ts = _views(rng, board)
    V, N = len(ws), len(board)
    img = np.zeros((V, N, 2))
    for v in range(V):
        R = np.asarray(lie.so3_exp(jnp.asarray(ws[v])))
        pc = board @ R.T + ts[v]
        img[v] = np.asarray(cam_mod.space_to_plane(cam, jnp.asarray(pc)))
    img += rng.normal(0, 0.1, img.shape)

    obj = np.tile(board[None], (V, 1, 1))
    res = calib.calibrate_scaramuzza(obj, img, width=640, height=480)
    assert res["rms"] < 0.2, res["rms"]
    assert abs(res["cx"] - gt_cx) < 1.5 and abs(res["cy"] - gt_cy) < 1.5

    # functional equivalence over the observed field
    cam_fit = cam_mod.make_scaramuzza(
        res["poly"], res["inv_poly"], cx=res["cx"], cy=res["cy"],
        affine=tuple(res["affine"]), width=640, height=480,
        dtype=jnp.float64)
    th = np.linspace(0.02, 0.6, 20)
    psi = np.linspace(0, 2 * np.pi, 13)[:-1]
    rays = np.stack([np.outer(np.sin(th), np.cos(psi)).ravel(),
                     np.outer(np.sin(th), np.sin(psi)).ravel(),
                     np.outer(np.cos(th), np.ones_like(psi)).ravel()], -1)
    uv_gt = np.asarray(cam_mod.space_to_plane(cam, jnp.asarray(rays)))
    uv_fit = np.asarray(cam_mod.space_to_plane(cam_fit, jnp.asarray(rays)))
    assert np.abs(uv_fit - uv_gt).max() < 1.5, np.abs(uv_fit - uv_gt).max()

    # YAML round-trip through the product reader
    path = tmp_path / "scara.yaml"
    calib.write_camera_yaml_scara(str(path), res, 640, 480)
    cam2 = load_camera_yaml(str(path))
    ray = np.asarray(cam_mod.lift_projective(
        cam2, jnp.asarray([[420.0, 310.0]])))[0]
    uv = np.asarray(cam_mod.space_to_plane(cam2, jnp.asarray([ray])))[0]
    assert np.abs(uv - [420.0, 310.0]).max() < 0.1
