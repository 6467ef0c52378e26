import os

import numpy as np
import pytest

from esvio_tpu.io import config as cfg_mod
from esvio_tpu.io import trajectory as traj_mod
from esvio_tpu.io import datasets as ds_mod

REF_CFG = "/root/reference/config/esvio/esvio.yaml"


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference not mounted")
def test_load_reference_config():
    cfg = cfg_mod.load_config(REF_CFG)
    assert cfg.system_mode == 1
    assert cfg.image_width == 346 and cfg.event_height == 260
    assert cfg.max_cnt == 150 and cfg.min_dist == 10
    assert cfg.freq == 15
    assert abs(cfg.f_threshold - 1.0) < 1e-9
    assert abs(cfg.acc_n - 0.2) < 1e-9 and abs(cfg.gyr_w - 4e-5) < 1e-12
    assert cfg.keyframe_parallax == 10.0
    # extrinsics parsed: left cam rotation is the DAVIS346 mounting
    assert cfg.R_body_cam0.shape == (3, 3)
    np.testing.assert_allclose(np.linalg.det(cfg.R_body_cam0), 1.0, atol=1e-6)
    # right extrinsic derived from body_T_cam1 directly
    assert cfg.R_body_cam1.shape == (3, 3)
    # stereo baseline ≈ 6 cm for the HKU DAVIS rig
    base = np.linalg.norm(cfg.t_body_cam1 - cfg.t_body_cam0)
    assert 0.03 < base < 0.09, base
    ex_p, ex_q = cfg_mod.extrinsic_arrays(cfg)
    assert ex_p.shape == (4, 3) and ex_q.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(ex_q, axis=1), 1.0, atol=1e-6)


@pytest.mark.skipif(not os.path.exists("/root/reference/config/esvio/cam0_esvio.yaml"),
                    reason="reference not mounted")
def test_load_reference_camera_yaml():
    cam = cfg_mod.load_camera_yaml("/root/reference/config/esvio/cam0_esvio.yaml")
    assert cam.width == 346 and cam.height == 260
    assert float(cam.fx) > 100.0


def test_trajectory_roundtrip(tmp_path, rng):
    n = 50
    t = np.linspace(0, 5, n)
    P = np.cumsum(rng.normal(0, 0.1, (n, 3)), axis=0)
    Q = np.tile([1.0, 0, 0, 0], (n, 1))
    V = rng.normal(size=(n, 3))

    tum = tmp_path / "traj.txt"
    traj_mod.write_tum(tum, t, P, Q)
    t2, P2, Q2 = traj_mod.read_tum(tum)
    np.testing.assert_allclose(P2, P, atol=1e-5)
    np.testing.assert_allclose(Q2, Q, atol=1e-5)

    csv = tmp_path / "vio.csv"
    traj_mod.write_vio_csv(csv, t, P, Q, V)
    lines = open(csv).read().strip().split("\n")
    assert len(lines) == n
    assert lines[0].count(",") == 11  # ns + 3 + 4 + 3 fields, trailing comma


def test_ate_alignment_invariance(rng):
    n = 200
    t = np.linspace(0, 10, n)
    gt = np.stack([np.sin(t), np.cos(t), 0.1 * t], 1)
    # estimated = gt rotated by yaw + translated + small noise
    yaw = 0.3
    R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                  [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
    est = gt @ R.T + np.array([5.0, -2.0, 1.0]) + rng.normal(0, 0.01, (n, 3))
    ate = traj_mod.ate_rmse(t, est, t, gt, alignment="yaw")
    assert ate < 0.02, ate
    ate_none = traj_mod.ate_rmse(t, est, t, gt, alignment="none")
    assert ate_none > 1.0


def test_iterate_chunks_and_imu_sync(rng):
    n = 20000
    t = np.sort(rng.uniform(0, 2.0, n))
    stream = ds_mod.EventStream(t, rng.integers(0, 100, n).astype(np.int32),
                                rng.integers(0, 80, n).astype(np.int32),
                                rng.integers(0, 2, n).astype(np.int32))
    chunks = list(ds_mod.iterate_chunks(stream, freq=10, capacity=4096))
    assert len(chunks) >= 19
    total = sum(int(np.asarray(c.valid).sum()) for _, c in chunks)
    assert total <= n
    assert total > n * 0.9  # few truncations at this capacity

    imu_t = np.arange(0, 2.0, 0.005)
    imu = ds_mod.ImuStream(imu_t, np.tile([0, 0, 9.8], (len(imu_t), 1)),
                           np.zeros((len(imu_t), 3)))
    ts, accs, gyrs = ds_mod.imu_between(imu, 0.1, 0.2)
    assert (ts > 0.1).all() and (ts <= 0.2 + 1e-9).all()
    assert abs(ts[-1] - 0.2) < 1e-9  # boundary interpolation hits t1


def test_metrics_and_stage_timer():
    from esvio_tpu.utils.metrics import Metrics, StageTimer
    import json as _json

    tim = StageTimer()
    with tim("stage_a"):
        sum(range(1000))
    with tim("stage_a"):
        sum(range(1000))
    rep = tim.report()
    assert rep["stage_a"]["n"] == 2 and rep["stage_a"]["total_s"] >= 0

    m = Metrics()
    m.count("events", 100)
    m.count("events", 28)
    m.gauge("rate", 3.5)
    for v in (1.0, 2.0, 10.0):
        m.observe("lat_ms", v)
    line = _json.loads(m.emit(extra_field=1))
    assert line["c.events"] == 128 and line["g.rate"] == 3.5
    s = m.summary()
    assert s["events"] == 128 and abs(s["lat_ms.mean"] - 13 / 3) < 1e-9
    assert s["lat_ms.max"] == 10.0
