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
