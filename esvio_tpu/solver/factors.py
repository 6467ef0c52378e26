"""Factor residuals + manifold Jacobians (jacfwd on tangent perturbations).

Residual formulas are bit-parity re-derivations of the reference Ceres cost
functions:
  * IMU          — imu_factor.h:12-167 (sqrt-info via LLT of cov⁻¹)
  * TwoFrameOneCam  — projectionTwoFrameOneCamFactor.cpp:52-90 (td comp)
  * TwoFrameTwoCam  — projectionTwoFrameTwoCamFactor.cpp (cross-cam temporal)
  * OneFrameTwoCam  — projectionOneFrameTwoCamFactor.cpp (static stereo)

Instead of hand-written analytic Jacobians, each residual is differentiated
with `jax.jacfwd` w.r.t. tangent-space perturbations (exact on the manifold),
batched with vmap over all factors of a type at once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from esvio_tpu.core import lie
from esvio_tpu.imu import preintegration as pre
from esvio_tpu.solver.window import FOCAL

PROJ_SQRT_INFO = FOCAL / 1.5   # projection sqrt-info (factor .cpp:33)


# ---------------------------------------------------------------------------
# IMU factor
# ---------------------------------------------------------------------------

def imu_sqrt_info(covariance):
    """Upper-triangular U with UᵀU = cov⁻¹ (imu_factor.h:48)."""
    dim = covariance.shape[-1]
    eye = jnp.eye(dim, dtype=covariance.dtype)
    cov_inv = jnp.linalg.solve(
        covariance + 1e-12 * eye, eye
    )
    # symmetrize for numerical safety
    cov_inv = 0.5 * (cov_inv + jnp.swapaxes(cov_inv, -1, -2))
    L = jnp.linalg.cholesky(cov_inv)
    return jnp.swapaxes(L, -1, -2)


def imu_residual(Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj,
                 pre_state: pre.Preintegrated, g, sqrt_info=None):
    """(15,) weighted residual."""
    r = pre.evaluate(pre_state, g, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj)
    if sqrt_info is None:
        sqrt_info = imu_sqrt_info(pre_state.covariance)
    return sqrt_info @ r


def imu_residual_jac(Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, pre_state, g,
                     sqrt_info=None):
    """Residual + Jacobians w.r.t. (δpose_i(6), δsb_i(9), δpose_j(6), δsb_j(9)).

    sqrt_info: optionally precomputed imu_sqrt_info(pre_state.covariance) —
    it depends on the preintegration only, so LM solvers hoist the 15×15
    inverse+Cholesky OUT of the iteration loop (XLA does not move the
    custom-call out of lax.scan by itself; it cost ~0.9 ms/iteration at B=8)."""
    if sqrt_info is None:
        sqrt_info = imu_sqrt_info(pre_state.covariance)  # constant w.r.t. δ

    def f(delta):
        dpi = delta[0:6]
        dsi = delta[6:15]
        dpj = delta[15:21]
        dsj = delta[21:30]
        Qi_ = lie.quat_mul(Qi, lie.delta_q(dpi[3:6]))
        Qj_ = lie.quat_mul(Qj, lie.delta_q(dpj[3:6]))
        r = pre.evaluate(
            pre_state, g,
            Pi + dpi[0:3], Qi_, Vi + dsi[0:3], Bai + dsi[3:6], Bgi + dsi[6:9],
            Pj + dpj[0:3], Qj_, Vj + dsj[0:3], Baj + dsj[3:6], Bgj + dsj[6:9],
        )
        return sqrt_info @ r

    zero = jnp.zeros(30, dtype=Pi.dtype)
    r = f(zero)
    J = jax.jacfwd(f)(zero)  # (15, 30)
    return r, J


# ---------------------------------------------------------------------------
# Projection factors (td-compensated). velocities are (2,) on the normalized
# plane; the reference stores Vector3d with z = 0.
# ---------------------------------------------------------------------------

def _td_point(pt2, vel2, td, td_obs):
    p = pt2 - (td - td_obs) * vel2
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def proj_two_frame_one_cam(Pi, Qi, Pj, Qj, ex_p, ex_q, inv_dep, td,
                           pt_i, vel_i, td_i, pt_j, vel_j, td_j):
    """(2,) weighted residual (projectionTwoFrameOneCamFactor.cpp:52-90)."""
    pts_i = _td_point(pt_i, vel_i, td, td_i)
    pts_j = _td_point(pt_j, vel_j, td, td_j)
    cam_i = pts_i / inv_dep
    imu_i = lie.quat_rotate(ex_q, cam_i) + ex_p
    w = lie.quat_rotate(Qi, imu_i) + Pi
    imu_j = lie.quat_rotate(lie.quat_conj(Qj), w - Pj)
    cam_j = lie.quat_rotate(lie.quat_conj(ex_q), imu_j - ex_p)
    r = cam_j[:2] / cam_j[2] - pts_j[:2]
    return PROJ_SQRT_INFO * r


def proj_two_frame_two_cam(Pi, Qi, Pj, Qj, ex_p0, ex_q0, ex_p1, ex_q1,
                           inv_dep, td, pt_i, vel_i, td_i, pt_j, vel_j, td_j):
    """Cross-camera temporal-stereo residual (projectionTwoFrameTwoCamFactor)."""
    pts_i = _td_point(pt_i, vel_i, td, td_i)
    pts_j = _td_point(pt_j, vel_j, td, td_j)
    cam_i = pts_i / inv_dep
    imu_i = lie.quat_rotate(ex_q0, cam_i) + ex_p0
    w = lie.quat_rotate(Qi, imu_i) + Pi
    imu_j = lie.quat_rotate(lie.quat_conj(Qj), w - Pj)
    cam_j = lie.quat_rotate(lie.quat_conj(ex_q1), imu_j - ex_p1)
    r = cam_j[:2] / cam_j[2] - pts_j[:2]
    return PROJ_SQRT_INFO * r


def proj_one_frame_two_cam(ex_p0, ex_q0, ex_p1, ex_q1, inv_dep, td,
                           pt_i, vel_i, td_i, pt_j, vel_j, td_j):
    """Static stereo residual (projectionOneFrameTwoCamFactor)."""
    pts_i = _td_point(pt_i, vel_i, td, td_i)
    pts_j = _td_point(pt_j, vel_j, td, td_j)
    cam_i = pts_i / inv_dep
    imu_i = lie.quat_rotate(ex_q0, cam_i) + ex_p0
    cam_j = lie.quat_rotate(lie.quat_conj(ex_q1), imu_i - ex_p1)
    r = cam_j[:2] / cam_j[2] - pts_j[:2]
    return PROJ_SQRT_INFO * r


# tangent-space jacobian wrappers -------------------------------------------

def proj21_jac(Pi, Qi, Pj, Qj, ex_p, ex_q, inv_dep, td,
               pt_i, vel_i, td_i, pt_j, vel_j, td_j):
    """r(2), J(2, 20): blocks [pose_i 6 | pose_j 6 | ex 6 | λ 1 | td 1]."""

    def f(d):
        Qi_ = lie.quat_mul(Qi, lie.delta_q(d[3:6]))
        Qj_ = lie.quat_mul(Qj, lie.delta_q(d[9:12]))
        exq_ = lie.quat_mul(ex_q, lie.delta_q(d[15:18]))
        return proj_two_frame_one_cam(
            Pi + d[0:3], Qi_, Pj + d[6:9], Qj_, ex_p + d[12:15], exq_,
            inv_dep + d[18], td + d[19], pt_i, vel_i, td_i, pt_j, vel_j, td_j,
        )

    zero = jnp.zeros(20, dtype=Pi.dtype)
    return f(zero), jax.jacfwd(f)(zero)


def proj22_jac(Pi, Qi, Pj, Qj, ex_p0, ex_q0, ex_p1, ex_q1, inv_dep, td,
               pt_i, vel_i, td_i, pt_j, vel_j, td_j):
    """r(2), J(2, 26): [pose_i 6 | pose_j 6 | ex0 6 | ex1 6 | λ 1 | td 1]."""

    def f(d):
        Qi_ = lie.quat_mul(Qi, lie.delta_q(d[3:6]))
        Qj_ = lie.quat_mul(Qj, lie.delta_q(d[9:12]))
        exq0_ = lie.quat_mul(ex_q0, lie.delta_q(d[15:18]))
        exq1_ = lie.quat_mul(ex_q1, lie.delta_q(d[21:24]))
        return proj_two_frame_two_cam(
            Pi + d[0:3], Qi_, Pj + d[6:9], Qj_,
            ex_p0 + d[12:15], exq0_, ex_p1 + d[18:21], exq1_,
            inv_dep + d[24], td + d[25], pt_i, vel_i, td_i, pt_j, vel_j, td_j,
        )

    zero = jnp.zeros(26, dtype=Pi.dtype)
    return f(zero), jax.jacfwd(f)(zero)


def proj12_jac(ex_p0, ex_q0, ex_p1, ex_q1, inv_dep, td,
               pt_i, vel_i, td_i, pt_j, vel_j, td_j):
    """r(2), J(2, 14): [ex0 6 | ex1 6 | λ 1 | td 1]."""

    def f(d):
        exq0_ = lie.quat_mul(ex_q0, lie.delta_q(d[3:6]))
        exq1_ = lie.quat_mul(ex_q1, lie.delta_q(d[9:12]))
        return proj_one_frame_two_cam(
            ex_p0 + d[0:3], exq0_, ex_p1 + d[6:9], exq1_,
            inv_dep + d[12], td + d[13], pt_i, vel_i, td_i, pt_j, vel_j, td_j,
        )

    zero = jnp.zeros(14, dtype=ex_p0.dtype)
    return f(zero), jax.jacfwd(f)(zero)


def cauchy_weight(r2, c: float = 1.0):
    """IRLS weight √ρ'(s) for Ceres CauchyLoss(c): ρ(s) = c² log(1+s/c²)."""
    return 1.0 / jnp.sqrt(1.0 + r2 / (c * c))
