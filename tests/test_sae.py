"""SAE / time-surface / Arc* corner tests against a sequential numpy oracle.

The oracle reimplements the reference semantics (event_detector.cc:149-166,
230-267, 308-544) straightforwardly in numpy, event by event, and the JAX
vectorized implementations must agree exactly.
"""
import numpy as np
import jax.numpy as jnp

from esvio_tpu.events import sae as sae_mod
from esvio_tpu.events import corners as cor_mod

H, W = 64, 80
THR = 0.01


# ----------------------------------------------------------------- oracle ---

class OracleSAE:
    def __init__(self):
        self.sae = np.zeros((2, H, W))
        self.latest = np.zeros((2, H, W))

    def push(self, t, x, y, p):
        t_last = self.latest[p, y, x]
        t_last_inv = self.latest[1 - p, y, x]
        if (t > t_last + THR) or (t_last_inv > t_last):
            self.latest[p, y, x] = t
            self.sae[p, y, x] = t
        else:
            self.latest[p, y, x] = t

    def harvest_ok(self, t, x, y, p):
        t_last = self.latest[p, y, x]
        t_last_inv = self.latest[1 - p, y, x]
        return not ((t > t_last + THR) or (t_last_inv > t_last))


SMALL = np.asarray(cor_mod.SMALL_CIRCLE)
LARGE = np.asarray(cor_mod.LARGE_CIRCLE)


def oracle_newest_segment(vals, min_thresh):
    n = len(vals)
    seg_min = vals[0]
    right = 0
    for i in range(1, n):
        if vals[i] > seg_min:
            seg_min = vals[i]
            right = i
    left = (right - 1 + n) % n
    right = (right + 1) % n
    lval, rval = vals[left], vals[right]
    lmin, rmin = lval, rval
    for it in range(1, min_thresh):
        if rval > lval:
            seg_min = min(seg_min, rmin)
            right = (right + 1) % n
            rval = vals[right]
            rmin = min(rmin, rval)
        else:
            seg_min = min(seg_min, lmin)
            left = (left - 1 + n) % n
            lval = vals[left]
            lmin = min(lmin, lval)
    size = min_thresh
    for it in range(min_thresh, n):
        if rval > lval:
            if rval >= seg_min:
                size = it + 1
                seg_min = min(seg_min, rmin)
            right = (right + 1) % n
            rval = vals[right]
            rmin = min(rmin, rval)
        else:
            if lval >= seg_min:
                size = it + 1
                seg_min = min(seg_min, lmin)
            left = (left - 1 + n) % n
            lval = vals[left]
            lmin = min(lmin, lval)
    return size


def oracle_is_corner(oracle, t, x, y, p, min_dist=10):
    if not oracle.harvest_ok(t, x, y, p):
        return False
    b = min_dist + 1
    if x < b or x >= W - b or y < b or y >= H - b:
        return False
    vals_s = np.array([oracle.sae[p, y + dy, x + dx] for dx, dy in SMALL])
    sz = oracle_newest_segment(vals_s, 4)
    ok = sz <= 6 or (16 - 8 <= sz <= 16 - 4)
    if not ok:
        return False
    vals_l = np.array([oracle.sae[p, y + dy, x + dx] for dx, dy in LARGE])
    sz = oracle_newest_segment(vals_l, 5)
    return sz <= 8 or (20 - 8 <= sz <= 20 - 5)


def random_events(rng, n, t0=0.0, t1=1.0, hot_pixels=True):
    t = np.sort(rng.uniform(t0, t1, n))
    if hot_pixels:
        # concentrate many events on few pixels to exercise refractory logic
        xs = rng.integers(0, 12, n) + 30
        ys = rng.integers(0, 12, n) + 20
    else:
        xs = rng.integers(0, W, n)
        ys = rng.integers(0, H, n)
    p = rng.integers(0, 2, n)
    return t, xs.astype(np.int32), ys.astype(np.int32), p.astype(np.int32)


def test_sae_update_matches_oracle(rng):
    t, x, y, p = random_events(rng, 600)
    oracle = OracleSAE()
    for i in range(len(t)):
        oracle.push(t[i], x[i], y[i], p[i])

    chunk = sae_mod.chunk_from_arrays(t, x, y, p, capacity=1024)
    state = sae_mod.init_sae(H, W)
    new_state, accepted = sae_mod.update_sae(state, chunk, THR)
    np.testing.assert_allclose(np.asarray(new_state.sae_latest), oracle.latest,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.sae), oracle.sae, atol=1e-6)


def test_sae_multi_chunk_carries_state(rng):
    t, x, y, p = random_events(rng, 400)
    oracle = OracleSAE()
    for i in range(len(t)):
        oracle.push(t[i], x[i], y[i], p[i])

    state = sae_mod.init_sae(H, W)
    for s in range(4):
        sl = slice(s * 100, (s + 1) * 100)
        chunk = sae_mod.chunk_from_arrays(t[sl], x[sl], y[sl], p[sl], capacity=128)
        state, _ = sae_mod.update_sae(state, chunk, THR)
    np.testing.assert_allclose(np.asarray(state.sae_latest), oracle.latest, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.sae), oracle.sae, atol=1e-6)


def test_time_surface_matches_oracle(rng):
    t, x, y, p = random_events(rng, 500, hot_pixels=False)
    oracle = OracleSAE()
    for i in range(len(t)):
        oracle.push(t[i], x[i], y[i], p[i])
    chunk = sae_mod.chunk_from_arrays(t, x, y, p, capacity=512)
    state, _ = sae_mod.update_sae(sae_mod.init_sae(H, W), chunk, THR)

    t_now = 1.05
    decay = 0.020
    # polarity-aware oracle (ignore_polarity=0, the shipped config)
    newest = np.maximum(oracle.sae[0], oracle.sae[1])
    val = np.exp(-(t_now - newest) / decay)
    sign = np.where(oracle.sae[1] > oracle.sae[0], 1.0, -1.0)
    raw = np.where(newest > 0, val * sign, 0.0)
    expect = np.round(255.0 * (raw + 1.0) / 2.0)

    ts = np.asarray(sae_mod.time_surface(state, t_now, 20.0, ignore_polarity=False))
    np.testing.assert_allclose(ts, expect, atol=1.0)  # ±1 for rounding edges
    assert ts.min() >= 0 and ts.max() <= 255


def test_corners_match_oracle(rng):
    # sparse events over full frame so corners occur at structure edges
    t, x, y, p = random_events(rng, 1200, hot_pixels=False)
    # paint an "edge": sweep a vertical line of positive events left→right
    line_t = np.linspace(1.1, 1.4, 40 * 30)
    lx, ly, k = [], [], 0
    for cx in range(20, 50):
        for cy in range(15, 55):
            lx.append(cx)
            ly.append(cy)
    t = np.concatenate([t, line_t])
    x = np.concatenate([x, np.asarray(lx, np.int32)])
    y = np.concatenate([y, np.asarray(ly, np.int32)])
    p = np.concatenate([p, np.ones(len(lx), np.int32)])

    oracle = OracleSAE()
    for i in range(len(t)):
        oracle.push(t[i], x[i], y[i], p[i])

    chunk = sae_mod.chunk_from_arrays(t, x, y, p, capacity=4096)
    state, _ = sae_mod.update_sae(sae_mod.init_sae(H, W), chunk, THR)

    got = np.asarray(cor_mod.detect_corners(state, chunk, min_dist=10))
    expect = np.array([
        oracle_is_corner(oracle, t[i], x[i], y[i], p[i]) for i in range(len(t))
    ] + [False] * (4096 - len(t)))
    assert expect.sum() > 0, "test should exercise some corners"
    np.testing.assert_array_equal(got, expect)


def test_median_blur_matches_oracle(rng):
    """median_blur == brute-force neighborhood median with replicated borders
    (cv::medianBlur semantics, event_detector.cc:263-265)."""
    import jax.numpy as jnp
    from esvio_tpu.events.sae import median_blur

    img = rng.integers(0, 256, (17, 23)).astype(np.float32)
    for k in (1, 2):
        out = np.asarray(median_blur(jnp.asarray(img), k))
        pad = np.pad(img, k, mode="edge")
        want = np.zeros_like(img)
        for y in range(img.shape[0]):
            for x in range(img.shape[1]):
                want[y, x] = np.median(pad[y:y + 2 * k + 1, x:x + 2 * k + 1])
        np.testing.assert_allclose(out, want)


def test_time_surface_median_blur_wired():
    """time_surface(median_blur_ksize=k) applies the filter after quantize."""
    import jax.numpy as jnp
    from esvio_tpu.events import sae as sae_mod

    st = sae_mod.init_sae(12, 16)
    st = sae_mod.SAEState(
        sae=st.sae.at[1, 6, 8].set(1.0), sae_latest=st.sae_latest)
    plain = np.asarray(sae_mod.time_surface(st, 1.001, 20.0, False))
    blur = np.asarray(sae_mod.time_surface(st, 1.001, 20.0, False,
                                           median_blur_ksize=1))
    # lone hot pixel is erased by the median; background preserved
    assert plain[6, 8] > 200
    assert blur[6, 8] == np.median(plain[5:8, 7:10])
