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
