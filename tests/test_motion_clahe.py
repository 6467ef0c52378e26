import numpy as np
import jax.numpy as jnp

from esvio_tpu.events import motion, sae as sae_mod
from esvio_tpu.frontend.clahe import clahe


def test_motion_correction_identity_below_threshold(rng):
    chunk = sae_mod.chunk_from_arrays(
        np.linspace(1.0, 1.05, 100), rng.integers(10, 150, 100),
        rng.integers(10, 100, 100), rng.integers(0, 2, 100), capacity=128)
    out = motion.motion_correct_chunk(
        chunk, 200.0, 200.0, 80.0, 60.0, jnp.asarray([0.0, 0.0, 1.0]),
        jnp.asarray([0.1, 0, 0]), jnp.asarray([0.1, 0, 0]),
        jnp.asarray([0.0, 0.0, 1.0]),  # ‖a‖ = 1 < 5 ⇒ disabled
        1.0, width=160, height=120)
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(chunk.x))
    np.testing.assert_array_equal(np.asarray(out.y), np.asarray(chunk.y))


def test_motion_correction_rotates_events(rng):
    # pure yaw rotation about optical axis: events rotate around (cx, cy)
    n = 200
    x = rng.integers(20, 140, n)
    y = rng.integers(20, 100, n)
    t = np.full(n, 1.1)  # dt = 0.1 from t0
    chunk = sae_mod.chunk_from_arrays(t, x, y, rng.integers(0, 2, n),
                                      capacity=256)
    omega = jnp.asarray([0.0, 0.0, 0.5])  # rad/s about z
    out = motion.motion_correct_chunk(
        chunk, 200.0, 200.0, 80.0, 60.0, omega, jnp.zeros(3), jnp.zeros(3),
        jnp.asarray([0.0, 0.0, 9.8]),  # enabled
        1.0, width=160, height=120)
    # warped by R(-0.05 rad)-ish about principal point: check rotation angle
    v_in = np.stack([x - 80.0, y - 60.0], -1)
    v_out = np.stack([np.asarray(out.x)[:n] - 80.0,
                      np.asarray(out.y)[:n] - 60.0], -1)
    moved = np.abs(v_out - v_in).sum(1) > 0
    assert moved.sum() > n * 0.5
    ang_in = np.arctan2(v_in[moved, 1], v_in[moved, 0])
    ang_out = np.arctan2(v_out[moved, 1], v_out[moved, 0])
    d = np.rad2deg(np.median(np.unwrap(ang_out - ang_in)))
    expect = np.rad2deg(0.05)
    assert abs(abs(d) - expect) < 1.5, (d, expect)


def test_clahe_improves_local_contrast(rng):
    # dark half / bright half with weak texture
    H, W = 128, 128
    img = np.zeros((H, W))
    img[:, :64] = 20.0 + rng.normal(0, 3.0, (H, 64))
    img[:, 64:] = 200.0 + rng.normal(0, 3.0, (H, 64))
    out = np.asarray(clahe(jnp.asarray(img)))
    assert out.shape == img.shape
    # local contrast (std within each half) increases
    assert out[:, :64].std() > img[:, :64].std() * 2
    assert out[:, 64:].std() > img[:, 64:].std() * 2
    assert out.min() >= 0 and out.max() <= 255.5
