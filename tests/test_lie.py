import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from esvio_tpu.core import lie


def random_quat(rng, n=None):
    q = rng.normal(size=(4,) if n is None else (n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_matches_rotation_compose(rng):
    q1 = random_quat(rng)
    q2 = random_quat(rng)
    q12 = np.asarray(lie.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
    R1 = ScipyRot.from_quat(np.roll(q1, -1)).as_matrix()  # scipy is xyzw
    R2 = ScipyRot.from_quat(np.roll(q2, -1)).as_matrix()
    R12 = np.asarray(lie.quat_to_rot(jnp.asarray(q12)))
    np.testing.assert_allclose(R12, R1 @ R2, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng, 7)
    v = rng.normal(size=(7, 3))
    out = np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    R = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
    np.testing.assert_allclose(out, np.einsum("nij,nj->ni", R, v), atol=1e-5)


def test_rot_quat_roundtrip(rng):
    q = random_quat(rng, 32)
    q = np.where(q[:, :1] < 0, -q, q)  # fix sign for comparison
    R = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
    q2 = np.asarray(lie.rot_to_quat(jnp.asarray(R)))
    q2 = np.where(q2[:, :1] < 0, -q2, q2)
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_ypr_roundtrip(rng):
    ypr = rng.uniform(-80, 80, size=(16, 3))
    R = np.asarray(lie.ypr_to_rot(jnp.asarray(ypr)))
    back = np.asarray(lie.rot_to_ypr(jnp.asarray(R)))
    np.testing.assert_allclose(back, ypr, atol=1e-3)


def test_g2R_aligns_gravity(rng):
    g = rng.normal(size=(3,))
    g = g / np.linalg.norm(g) * 9.81
    R0 = np.asarray(lie.g2R(jnp.asarray(g)))
    aligned = R0 @ (g / np.linalg.norm(g))
    np.testing.assert_allclose(aligned, [0, 0, 1], atol=1e-5)
    # yaw of R0 is zero
    ypr = np.asarray(lie.rot_to_ypr(jnp.asarray(R0)))
    assert abs(ypr[0]) < 1e-3


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(20, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, 3.0, (20, 1))
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    w2 = np.asarray(lie.so3_log(jnp.asarray(R)))
    R2 = np.asarray(lie.so3_exp(jnp.asarray(w2)))
    np.testing.assert_allclose(R2, R, atol=1e-6)  # log may return the conjugate axis-angle
    # small angles
    ws = rng.normal(size=(20, 3)) * 1e-8
    Rs = np.asarray(lie.so3_exp(jnp.asarray(ws)))
    np.testing.assert_allclose(Rs, np.broadcast_to(np.eye(3), (20, 3, 3)), atol=1e-7)


def test_qleft_qright(rng):
    q = random_quat(rng)
    p = random_quat(rng)
    expect = np.asarray(lie.quat_mul(jnp.asarray(q), jnp.asarray(p)))
    via_left = np.asarray(lie.quat_left(jnp.asarray(q))) @ p
    via_right = np.asarray(lie.quat_right(jnp.asarray(p))) @ q
    np.testing.assert_allclose(via_left, expect, atol=1e-6)
    np.testing.assert_allclose(via_right, expect, atol=1e-6)


def test_normalize_angle():
    a = jnp.asarray([0.0, 190.0, -190.0, 360.0, 720.5, -180.0])
    out = np.asarray(lie.normalize_angle_deg(a))
    np.testing.assert_allclose(out, [0.0, -170.0, 170.0, 0.0, 0.5, -180.0], atol=1e-4)
