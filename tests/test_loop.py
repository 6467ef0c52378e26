"""Loop-closure subsystem tests: FAST, BRIEF, 4-DoF graph, full pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esvio_tpu.core import lie, camera
from esvio_tpu.loop import fast, brief, pose_graph, loop_closure

from synth import blob_texture


H, W = 180, 240
FOCAL = 200.0
PLANE_Z = 5.0


def test_fast_finds_square_corners(rng):
    img = np.zeros((H, W))
    img[60:120, 80:160] = 200.0
    xy, score, ok = fast.detect_fast(jnp.asarray(img), threshold=20,
                                     max_corners=64)
    xy = np.asarray(xy)[np.asarray(ok)]
    assert len(xy) >= 4
    gt = np.array([[80, 60], [159, 60], [80, 119], [159, 119]])
    for g in gt:
        d = np.linalg.norm(xy - g, axis=1).min()
        assert d < 3.0, (g, d)


def test_brief_matches_under_shift(rng):
    tex, margin = blob_texture(rng, H, W, n_blobs=200)
    from synth import sample_texture
    img0 = sample_texture(tex, margin, H, W, 0.0, 0.0)
    img1 = sample_texture(tex, margin, H, W, 3.0, -2.0)  # shift content
    xy0, score, ok = fast.detect_fast(jnp.asarray(img0), 15, 128)
    d0 = brief.describe(jnp.asarray(img0), xy0, ok)
    # same physical points in img1 are at xy0 - (3, -2)
    xy1 = xy0 - jnp.asarray([3.0, -2.0])
    d1 = brief.describe(jnp.asarray(img1), xy1, ok)
    ham = np.asarray(brief.hamming_matrix(d0, d1))
    okn = np.asarray(ok)
    diag = np.diag(ham)[okn]
    assert np.median(diag) < 40, np.median(diag)
    # off-diagonal should be clearly larger on average
    off = ham[okn][:, okn]
    assert off.mean() > np.median(diag) * 2


def test_optimize_4dof_closes_loop():
    """Position drift corrected by accumulated loop edges (the steady-state
    situation: every revisited keyframe adds an edge, pose_graph.cpp:513-531).

    Note the cost balance is faithful to the reference: one loop edge against
    dozens of sequential odometry edges moves the graph only slightly; the
    correction comes from edge accumulation.
    """
    K = 64
    n = 40
    yaw = np.zeros(K)
    t = np.zeros((K, 3))
    gt = np.zeros((K, 3))
    for k in range(1, n):
        gt[k] = gt[k - 1] + np.array([0.5, 0, 0])
        t[k] = gt[k] + np.array([0.012, 0.008, 0.0]) * k  # growing drift

    valid = np.arange(K) < n
    pairs = [(i, n - 10 + i) for i in range(10)]
    li = np.array([p[0] for p in pairs], np.int32)
    lj = np.array([p[1] for p in pairs], np.int32)
    lt = np.stack([gt[j] - gt[i] for i, j in pairs])
    ly = np.zeros(len(pairs))
    lv = np.ones(len(pairs), bool)

    yaw_o, t_o = pose_graph.optimize_4dof(
        jnp.asarray(yaw), jnp.asarray(t), jnp.zeros(K), jnp.zeros(K),
        jnp.asarray(valid), jnp.asarray(0), jnp.asarray(li), jnp.asarray(lj),
        jnp.asarray(lt), jnp.asarray(ly), jnp.asarray(lv), iters=8)
    t_o = np.asarray(t_o)
    err_before = np.linalg.norm(t[n - 1] - gt[n - 1])
    err_after = np.linalg.norm(t_o[n - 1] - gt[n - 1])
    assert err_after < err_before * 0.35, (err_before, err_after)


@pytest.mark.slow
def test_loop_closer_end_to_end(rng):
    """Planar scene: trajectory returns to start; drifted odometry corrected."""
    tex, margin = blob_texture(rng, H * 3, W * 3, n_blobs=1500)
    from synth import sample_texture
    cam = camera.make_pinhole(fx=FOCAL, fy=FOCAL, cx=W / 2, cy=H / 2,
                              width=W, height=H)

    def render(pos):
        # camera at (x, y, 0) looking +z at plane z=5: pixel shift = pos*f/z
        off_x = pos[0] * FOCAL / PLANE_Z
        off_y = pos[1] * FOCAL / PLANE_Z
        return sample_texture(tex, margin, H, W, off_x + W, off_y + H)

    n_kf = 34
    # path: out and back to the start (so late frames see early frames' scene)
    xs = np.concatenate([np.linspace(0, 2.0, n_kf // 2),
                         np.linspace(2.0, 0.04, n_kf - n_kf // 2)])
    gt_pos = np.stack([xs, np.zeros(n_kf), np.zeros(n_kf)], 1)
    # gradual odometric drift (the realistic VIO failure mode)
    drift_rate = np.array([0.012, 0.006, 0.0])
    vio_pos = gt_pos + drift_rate[None, :] * np.arange(n_kf)[:, None]

    closer = loop_closure.LoopCloser(
        loop_closure.LoopConfig(fast_threshold=15, max_extra_corners=256,
                                skip_recent=12),
        cam=cam)
    q_id = np.array([1.0, 0, 0, 0])
    infos = []
    for k in range(n_kf):
        img = render(gt_pos[k])
        # window landmarks: project FAST corners of this frame to the plane
        xy, score, ok = fast.detect_fast(jnp.asarray(img), 15, 128)
        xy_n = np.asarray(xy)
        okn = np.asarray(ok)
        rays = np.asarray(camera.lift_projective(cam, jnp.asarray(xy_n)))
        # true depth = PLANE_Z; world point via the VIO (drifted) pose
        pts_w = vio_pos[k] + rays * PLANE_Z
        info = closer.add_keyframe(
            float(k), vio_pos[k], q_id, pts_w, xy_n, okn, img)
        if info:
            infos.append(info)

    assert len(infos) >= 1, "no loop detected"
    # after closure the optimized final pose should be near ground truth
    err_vio = np.linalg.norm(vio_pos[n_kf - 1] - gt_pos[n_kf - 1])
    err_opt = np.linalg.norm(closer.db.t_opt[n_kf - 1] - gt_pos[n_kf - 1])
    assert err_opt < err_vio * 0.5, (err_vio, err_opt)

    # drift correction maps VIO into the corrected frame
    t_c, q_c = closer.correct_odometry(vio_pos[n_kf - 1], q_id)
    assert np.linalg.norm(t_c - gt_pos[n_kf - 1]) < err_vio * 0.5


def test_loop_info_fast_reloc_payload(rng):
    """Loop info carries the fast-relocalization payload (keyframe.cpp:531-557):
    matched new-KF feature ids + their old-KF normalized obs + old pose."""
    tex, margin = blob_texture(rng, H * 3, W * 3, n_blobs=1500)
    from synth import sample_texture
    cam = camera.make_pinhole(fx=FOCAL, fy=FOCAL, cx=W / 2, cy=H / 2,
                              width=W, height=H)

    def render(pos):
        return sample_texture(tex, margin, H, W,
                              pos[0] * FOCAL / PLANE_Z + W,
                              pos[1] * FOCAL / PLANE_Z + H)

    n_kf = 30
    xs = np.concatenate([np.linspace(0, 1.6, n_kf // 2),
                         np.linspace(1.6, 0.02, n_kf - n_kf // 2)])
    pos = np.stack([xs, np.zeros(n_kf), np.zeros(n_kf)], 1)
    closer = loop_closure.LoopCloser(
        loop_closure.LoopConfig(fast_threshold=15, max_extra_corners=256,
                                skip_recent=10), cam=cam)
    q_id = np.array([1.0, 0, 0, 0])
    info = None
    for k in range(n_kf):
        img = render(pos[k])
        xy, score, ok = fast.detect_fast(jnp.asarray(img), 15, 128)
        xy_n, okn = np.asarray(xy), np.asarray(ok)
        rays = np.asarray(camera.lift_projective(cam, jnp.asarray(xy_n)))
        pts_w = pos[k] + rays * PLANE_Z
        ids = np.arange(k * 1000, k * 1000 + len(pts_w), dtype=np.int32)
        got = closer.add_keyframe(float(k), pos[k], q_id, pts_w, xy_n, okn,
                                  img, ids=ids)
        if got:
            info = got
    assert info is not None
    assert len(info["match_ids"]) >= 15
    # ids belong to the NEW keyframe's id range
    assert np.all(info["match_ids"] // 1000 == info["j_new"])
    assert info["match_un_old"].shape == (len(info["match_ids"]), 2)
    assert np.allclose(info["t_old"], pos[info["i_old"]])
