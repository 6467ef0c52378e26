import numpy as np
import pytest
import jax
import jax.numpy as jnp

from esvio_tpu.frontend import pyramid, lk, ransac, mask


def synth_image(rng, H=120, W=160):
    """Smooth random texture with strong gradients (sum of gaussians)."""
    img = np.zeros((H, W))
    for _ in range(250):
        cx = rng.uniform(10, W - 10)
        cy = rng.uniform(10, H - 10)
        s = rng.uniform(1.5, 4.0)
        a = rng.uniform(50, 255)
        y, x = np.mgrid[0:H, 0:W]
        img += a * np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s))
    return np.clip(img, 0, 255)


def shift_image(img, dx, dy):
    """Bilinear shift: out(x) = in(x - d)."""
    H, W = img.shape
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    xs = np.clip(x - dx, 0, W - 1.001)
    ys = np.clip(y - dy, 0, H - 1.001)
    x0 = xs.astype(int)
    y0 = ys.astype(int)
    fx = xs - x0
    fy = ys - y0
    return (
        img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x0 + 1] * (1 - fy) * fx
        + img[y0 + 1, x0] * fy * (1 - fx) + img[y0 + 1, x0 + 1] * fy * fx
    )


def test_pyr_down_shape_and_smoothing(rng):
    img = jnp.asarray(synth_image(rng))
    down = pyramid.pyr_down(img)
    assert down.shape == (60, 80)
    assert float(jnp.abs(down).max()) <= 256.0


def test_lk_recovers_known_shift(rng):
    img0 = synth_image(rng)
    d = (3.7, -2.4)
    img1 = shift_image(img0, *d)
    p0 = pyramid.build_lk_pyramid(jnp.asarray(img0), 4)
    p1 = pyramid.build_lk_pyramid(jnp.asarray(img1), 4)

    pts = np.stack(np.meshgrid(np.arange(30, 130, 12), np.arange(30, 90, 12)),
                   -1).reshape(-1, 2).astype(np.float64)
    valid = np.ones(len(pts), bool)
    out, status = lk.lk_track(p0, p1, jnp.asarray(pts), jnp.asarray(valid))
    out = np.asarray(out)
    status = np.asarray(status)
    assert status.sum() > len(pts) * 0.8
    flow = out[status] - pts[status]
    err = np.linalg.norm(flow - np.asarray(d), axis=-1)
    assert np.median(err) < 0.25, (np.median(err), flow[:5])


def test_lk_large_shift_needs_pyramid(rng):
    img0 = synth_image(rng)
    d = (14.0, 9.0)  # ≫ window half-size: only trackable through the pyramid
    img1 = shift_image(img0, *d)
    p0 = pyramid.build_lk_pyramid(jnp.asarray(img0), 4)
    p1 = pyramid.build_lk_pyramid(jnp.asarray(img1), 4)
    pts = np.stack(np.meshgrid(np.arange(40, 120, 15), np.arange(40, 80, 15)),
                   -1).reshape(-1, 2).astype(np.float64)
    out, status = lk.lk_track(p0, p1, jnp.asarray(pts),
                              jnp.asarray(np.ones(len(pts), bool)))
    # forward-backward prune, as the tracker does (feature_tracker.cpp:191-196)
    back, status_b = lk.lk_track(p1, p0, out, status)
    gap = np.linalg.norm(np.asarray(back) - pts, axis=-1)
    good = np.asarray(status & status_b) & (gap <= 0.5)
    out = np.asarray(out)[good]
    err = np.linalg.norm(out - (pts[good] + np.asarray(d)), axis=-1)
    assert good.sum() > len(pts) * 0.4
    assert np.median(err) < 0.5


def test_lk_forward_backward_consistency(rng):
    img0 = synth_image(rng)
    img1 = shift_image(img0, 2.5, 1.5)
    p0 = pyramid.build_lk_pyramid(jnp.asarray(img0), 4)
    p1 = pyramid.build_lk_pyramid(jnp.asarray(img1), 4)
    pts = np.stack(np.meshgrid(np.arange(30, 130, 20), np.arange(30, 90, 20)),
                   -1).reshape(-1, 2).astype(np.float64)
    valid = jnp.ones(len(pts), bool)
    fwd, s1 = lk.lk_track(p0, p1, jnp.asarray(pts), valid)
    back, s2 = lk.lk_track(p1, p0, fwd, s1)
    gap = np.linalg.norm(np.asarray(back) - pts, axis=-1)
    good = np.asarray(s1 & s2)
    assert good.sum() > 5
    assert np.median(gap[good]) < 0.3


def test_fundamental_ransac_rejects_outliers(rng):
    # stereo-like geometry: random 3D points, two cameras
    n = 120
    pts3 = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    R = np.eye(3)
    t = np.array([0.3, 0.05, 0.02])
    f, cx, cy = 460.0, 320.0, 240.0
    uv1 = pts3[:, :2] / pts3[:, 2:] * f + [cx, cy]
    p2 = (pts3 - t) @ R.T
    uv2 = p2[:, :2] / p2[:, 2:] * f + [cx, cy]
    # plant outliers
    n_out = 25
    uv2_noisy = uv2.copy()
    uv2_noisy[:n_out] += rng.uniform(15, 60, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    uv1 += rng.normal(0, 0.2, uv1.shape)
    uv2_noisy += rng.normal(0, 0.2, uv2.shape)

    key = jax.random.PRNGKey(0)
    inl, F = ransac.fundamental_ransac(
        key, jnp.asarray(uv1), jnp.asarray(uv2_noisy),
        jnp.ones(n, bool), threshold=1.5,
    )
    inl = np.asarray(inl)
    # all planted outliers rejected, most inliers kept
    assert inl[:n_out].sum() <= 2
    assert inl[n_out:].sum() > (n - n_out) * 0.85


def test_greedy_spacing_properties(rng):
    n = 200
    H, W = 100, 140
    xs = rng.uniform(0, W - 1, n)
    ys = rng.uniform(0, H - 1, n)
    pri = rng.uniform(0, 10, n)
    valid = rng.random(n) > 0.1
    keep, grid = mask.greedy_spacing(
        jnp.asarray(pri), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(valid),
        H, W, min_dist=10, max_keep=60,
    )
    keep = np.asarray(keep)
    assert keep.sum() > 10
    assert keep.sum() <= 60
    assert not np.any(keep & ~valid)
    # pairwise min distance respected (on rounded coords, like the reference mask)
    kx = np.round(xs[keep])
    ky = np.round(ys[keep])
    d = np.sqrt((kx[:, None] - kx) ** 2 + (ky[:, None] - ky) ** 2)
    np.fill_diagonal(d, 1e9)
    assert d.min() > 10 - 1e-6

    # higher-priority feature wins a contested cell
    xs2 = np.array([50.0, 52.0])
    ys2 = np.array([50.0, 50.0])
    keep2, _ = mask.greedy_spacing(
        jnp.asarray([1.0, 5.0]), jnp.asarray(xs2), jnp.asarray(ys2),
        jnp.ones(2, bool), H, W, min_dist=10, max_keep=10,
    )
    np.testing.assert_array_equal(np.asarray(keep2), [False, True])


def test_grid_spacing_properties(rng):
    """grid_spacing (parallel WTA): keep ⊆ valid, ≤ max_keep, pairwise
    ≥ min_dist, strongest candidates preferred."""
    from esvio_tpu.frontend import mask as mask_mod

    N, H, W, r = 400, 120, 160, 10
    xs = rng.uniform(0, W - 1, N)
    ys = rng.uniform(0, H - 1, N)
    pri = rng.uniform(0, 100, N)
    valid = rng.uniform(size=N) > 0.2
    keep, occ = mask_mod.grid_spacing(
        jnp.asarray(pri), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(valid), H, W, r, 60)
    keep = np.asarray(keep)
    assert not np.any(keep & ~valid)
    assert keep.sum() <= 60
    kx, ky = xs[keep], ys[keep]
    d2 = (kx[:, None] - kx[None, :]) ** 2 + (ky[:, None] - ky[None, :]) ** 2
    np.fill_diagonal(d2, 1e9)
    assert d2.min() >= r * r, np.sqrt(d2.min())
    # the globally strongest valid candidate always survives
    best = np.argmax(np.where(valid, pri, -np.inf))
    assert keep[best]


def test_grid_spacing_matches_greedy_density(rng):
    """grid and greedy select similar feature counts and both respect the
    same spacing — grid is the TPU-native default, greedy the oracle."""
    from esvio_tpu.frontend import mask as mask_mod

    N, H, W, r = 600, 120, 160, 10
    xs = rng.uniform(0, W - 1, N)
    ys = rng.uniform(0, H - 1, N)
    pri = rng.uniform(0, 100, N)
    valid = np.ones(N, bool)
    kg, _ = mask_mod.greedy_spacing(
        jnp.asarray(pri), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(valid), H, W, r, 150)
    kb, _ = mask_mod.grid_spacing(
        jnp.asarray(pri), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(valid), H, W, r, 150)
    n_greedy = int(np.asarray(kg).sum())
    n_grid = int(np.asarray(kb).sum())
    # cell-quantized WTA selects a somewhat sparser set; must stay within 2×
    assert n_grid >= n_greedy * 0.5, (n_grid, n_greedy)
    assert n_grid <= n_greedy * 1.2, (n_grid, n_greedy)


def test_lk_parity_with_opencv(rng):
    """LK quality parity vs cv2.calcOpticalFlowPyrLK on textured imagery
    (VERDICT r1 weak #7 / SURVEY hard-risk): same 21×21 window, 4 levels,
    known sub-pixel ground-truth shift — our tracker's endpoint error must
    match OpenCV's to a fraction of a pixel."""
    cv2 = pytest.importorskip("cv2")
    from synth import blob_texture, sample_texture
    from esvio_tpu.frontend import lk, pyramid

    H, W = 180, 240
    tex, margin = blob_texture(rng, H, W, n_blobs=500)
    shift = np.array([3.4, -2.6])
    img0 = sample_texture(tex, margin, H, W, 0.0, 0.0).astype(np.float32)
    img1 = sample_texture(tex, margin, H, W, shift[0], shift[1]) \
        .astype(np.float32)

    # seed at OpenCV's own corners (both trackers get identical seeds)
    pts0 = cv2.goodFeaturesToTrack(img0.astype(np.uint8), 80, 0.05, 12)
    pts0 = pts0.reshape(-1, 2)
    inb = ((pts0[:, 0] > 15) & (pts0[:, 0] < W - 16 - abs(shift[0]))
           & (pts0[:, 1] > 15 + abs(shift[1])) & (pts0[:, 1] < H - 16))
    pts0 = pts0[inb]
    assert len(pts0) >= 30
    gt1 = pts0 - shift  # content moved by +shift ⇒ features move by −shift

    cv_pts, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8), img1.astype(np.uint8),
        pts0.astype(np.float32).reshape(-1, 1, 2), None,
        winSize=(21, 21), maxLevel=3)
    cv_pts = cv_pts.reshape(-1, 2)
    cv_ok = cv_st.ravel() > 0

    pyr0 = pyramid.build_lk_pyramid(jnp.asarray(img0), 4)
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img1), 4)
    ours, st = lk.lk_track(pyr0, pyr1, jnp.asarray(pts0, jnp.float32),
                           jnp.ones(len(pts0), bool), iters=30)
    ours = np.asarray(ours)
    ok = np.asarray(st)

    err_cv = np.linalg.norm(cv_pts[cv_ok] - gt1[cv_ok], axis=1)
    err_us = np.linalg.norm(ours[ok] - gt1[ok], axis=1)
    assert ok.sum() >= 0.8 * cv_ok.sum(), (ok.sum(), cv_ok.sum())
    assert np.median(err_us) < 0.5, np.median(err_us)
    assert np.median(err_us) <= np.median(err_cv) + 0.2, \
        (np.median(err_us), np.median(err_cv))

def test_eight_point_qr_matches_svd(rng):
    """Householder-QR null space + inverse-iteration rank-2 projection ==
    the SVD formulation (r4: the (K,8,9) LAPACK SVD loop-serialized on TPU;
    VERDICT r3 #3).  Checked on random well-posed 8-point configurations:
    F agrees up to scale/sign and the rank-2 constraint holds."""
    import numpy as np

    for trial in range(20):
        # genuine two-view geometry + noise so A has a clean 1-D null space
        n = 8
        X = rng.uniform(-1, 1, (n, 3)) + np.array([0, 0, 4.0])
        R = np.eye(3)
        t = np.array([0.3, -0.1, 0.05])
        p1 = X[:, :2] / X[:, 2:]
        Xc = X @ R.T + t
        p2 = Xc[:, :2] / Xc[:, 2:]
        p2 += rng.normal(0, 1e-3, p2.shape)
        F_qr = np.array(ransac._eight_point(jnp.asarray(p1), jnp.asarray(p2)))

        # SVD oracle
        x1, y1 = p1[:, 0], p1[:, 1]
        x2, y2 = p2[:, 0], p2[:, 1]
        A = np.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                      x1, y1, np.ones_like(x1)], axis=-1)
        _, _, vt = np.linalg.svd(A)
        F = vt[-1].reshape(3, 3)
        u, s, vt2 = np.linalg.svd(F)
        F_svd = u @ np.diag([s[0], s[1], 0.0]) @ vt2

        F_qr /= np.linalg.norm(F_qr)
        F_svd /= np.linalg.norm(F_svd)
        if np.sum(F_qr * F_svd) < 0:
            F_qr = -F_qr
        assert np.abs(F_qr - F_svd).max() < 1e-5, (trial, np.abs(F_qr - F_svd).max())
        # rank-2 exactly enforced
        assert np.abs(np.linalg.svd(F_qr, compute_uv=False)[2]) < 1e-6
