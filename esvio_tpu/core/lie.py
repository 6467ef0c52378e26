"""Quaternion / SO(3) / Euler utilities as pure, vmappable JAX functions.

Conventions (matching the reference math in
/root/reference/esvio_estimator/src/utility/utility.h:16-143):
  * Quaternions are Hamilton, stored (w, x, y, z) in the last axis.
  * ypr is (yaw, pitch, roll) in DEGREES, R = Rz(y) Ry(p) Rx(r).
  * delta_q(theta) is the first-order quaternion (1, theta/2) — unnormalized,
    exactly as Utility::deltaQ.

All functions broadcast over leading axes and are dtype-polymorphic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# quaternion basics
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q, p):
    """Hamilton product q ⊗ p, (..., 4) × (..., 4) → (..., 4)."""
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    pw, px, py, pz = jnp.moveaxis(p, -1, 0)
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q):
    """Inverse for (possibly) non-unit quaternions."""
    return quat_conj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate vector(s) v by UNIT quaternion(s) q: R(q) v."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rot(q):
    """Unit quaternion → rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def rot_to_quat(R):
    """Rotation matrix → unit quaternion (w, x, y, z), branch-free (jit-safe).

    Uses the Shepperd / max-diagonal method expressed with jnp.where selects.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def cand(t, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(t, 1e-12)) * 2.0
        return jnp.stack([a * s * 0.25, b / s, c / s, d / s], axis=-1)

    # four candidate branches
    q0 = cand(1.0 + tr, jnp.ones_like(tr), (m21 - m12) / jnp.maximum(1.0 + tr, 1e-12),
              (m02 - m20) / jnp.maximum(1.0 + tr, 1e-12), (m10 - m01) / jnp.maximum(1.0 + tr, 1e-12))
    # rewrite plainly: standard formulation
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_normalize(q)


def quat_from_two_vectors(a, b):
    """Unit quaternion rotating a → b (Eigen FromTwoVectors semantics)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    w = 1.0 + d
    # antipodal fallback: rotate 180° about any axis ⟂ a
    perp = jnp.cross(a, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], a.dtype), a.shape))
    small = jnp.linalg.norm(perp, axis=-1, keepdims=True) < 1e-6
    perp = jnp.where(small, jnp.cross(a, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], a.dtype), a.shape)), perp)
    q = jnp.concatenate([w, c], axis=-1)
    q_anti = jnp.concatenate([jnp.zeros_like(w), perp], axis=-1)
    q = jnp.where(w < 1e-8, q_anti, q)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# small-angle helpers (reference Utility::deltaQ, skewSymmetric, Qleft/Qright)
# ---------------------------------------------------------------------------

def delta_q(theta):
    """First-order quaternion (1, θ/2); NOT normalized (matches Utility::deltaQ)."""
    half = 0.5 * theta
    one = jnp.ones(theta.shape[:-1] + (1,), dtype=theta.dtype)
    return jnp.concatenate([one, half], axis=-1)


def skew(v):
    """(..., 3) → (..., 3, 3) skew-symmetric matrix [v]×."""
    z = jnp.zeros_like(v[..., 0])
    r = jnp.stack(
        [z, -v[..., 2], v[..., 1],
         v[..., 2], z, -v[..., 0],
         -v[..., 1], v[..., 0], z],
        axis=-1,
    )
    return r.reshape(v.shape[:-1] + (3, 3))


def quat_left(q):
    """Qleft: matrix L(q) such that L(q) p = q ⊗ p (rows/cols ordered w,x,y,z)."""
    w = q[..., 0]
    v = q[..., 1:]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), v.shape[:-1] + (3, 3))
    bottom = jnp.concatenate([v[..., :, None], w[..., None, None] * eye + skew(v)], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def quat_right(p):
    """Qright: matrix R(p) such that R(p) q = q ⊗ p."""
    w = p[..., 0]
    v = p[..., 1:]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), v.shape[:-1] + (3, 3))
    bottom = jnp.concatenate([v[..., :, None], w[..., None, None] * eye - skew(v)], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# SO(3) exp / log
# ---------------------------------------------------------------------------

def so3_exp(w):
    """Exponential map (..., 3) → rotation matrix, Taylor-safe near 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    W = skew(w)
    W2 = W @ W
    s = jnp.where(theta2 < 1e-12, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    c = jnp.where(theta2 < 1e-12, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + s[..., None, None] * W + c[..., None, None] * W2


def so3_log(R):
    """Log map rotation matrix → (..., 3), Taylor-safe near identity and π."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    vee = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    # near 0: 0.5*(1 + theta^2/6); near pi use quaternion fallback
    factor = jnp.where(theta < 1e-4, 0.5 + theta * theta / 12.0, theta / jnp.maximum(2.0 * sin_t, 1e-12))
    w = factor[..., None] * vee
    # π fallback via quaternion
    q = rot_to_quat(R)
    axis = q[..., 1:] / jnp.maximum(jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True), 1e-12)
    w_pi = axis * theta[..., None]
    return jnp.where((jnp.pi - theta < 1e-3)[..., None], w_pi, w)


def quat_exp(w):
    """so(3) vector → unit quaternion (exact exponential)."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    half = 0.5 * theta
    s = jnp.where(theta2 < 1e-12, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([jnp.cos(half), s * w], axis=-1)


# ---------------------------------------------------------------------------
# Euler (degrees) — reference Utility::R2ypr / ypr2R / g2R
# ---------------------------------------------------------------------------

def rot_to_ypr(R):
    """Rotation matrix → (yaw, pitch, roll) in degrees (Utility::R2ypr)."""
    n = R[..., :, 0]
    o = R[..., :, 1]
    a = R[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    return jnp.stack([y, p, r], axis=-1) * (180.0 / jnp.pi)


def ypr_to_rot(ypr):
    """(yaw, pitch, roll) degrees → rotation matrix Rz Ry Rx (Utility::ypr2R)."""
    rad = ypr * (jnp.pi / 180.0)
    y, p, r = rad[..., 0], rad[..., 1], rad[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    row = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return row.reshape(rad.shape[:-1] + (3, 3))


def g2R(g):
    """World-from-IMU rotation that aligns measured gravity g with +z and zeroes yaw.

    Mirrors Utility::g2R (esvio_estimator/src/utility/utility.cpp): R0 rotates
    normalized g onto e_z, then yaw is removed so the world frame is yaw-aligned
    with the initial body frame.
    """
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype=g.dtype)
    R0 = quat_to_rot(quat_from_two_vectors(g, jnp.broadcast_to(ez, g.shape)))
    yaw = rot_to_ypr(R0)[..., 0]
    fix = ypr_to_rot(jnp.stack([-yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw)], axis=-1))
    return fix @ R0


def normalize_angle_deg(a):
    """Wrap degrees into (-180, 180] (Utility::normalizeAngle)."""
    return a - 360.0 * jnp.floor((a + 180.0) / 360.0)
