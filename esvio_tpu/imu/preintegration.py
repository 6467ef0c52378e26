"""IMU preintegration — mid-point Δp/Δq/Δv with 15×15 Jacobian & covariance.

TPU-native re-design of the reference recursion
(/root/reference/esvio_estimator/src/factor/integration_base.h:54-157):
instead of a per-sample C++ loop mutating member state, the whole sample
buffer is integrated with one `lax.scan` over a fixed-capacity, mask-padded
chunk.  Bias "repropagation" (integration_base.h:38-52) is simply calling
`preintegrate` again with new biases — no stored buffers are mutated.

Error-state ordering (parameters.h O_P/O_R/O_V/O_BA/O_BG): [p, θ, v, ba, bg].
Noise ordering (18): [na0, ng0, na1, ng1, nba, nbg].
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from esvio_tpu.core import lie

O_P, O_R, O_V, O_BA, O_BG = 0, 3, 6, 9, 12


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ImuParams:
    acc_n: jnp.ndarray
    gyr_n: jnp.ndarray
    acc_w: jnp.ndarray
    gyr_w: jnp.ndarray
    g: jnp.ndarray  # gravity vector in world, (3,), typically (0, 0, 9.8)


def make_imu_params(acc_n=0.2, gyr_n=0.05, acc_w=0.002, gyr_w=4e-5, g_norm=9.80766,
                    dtype=jnp.float32) -> ImuParams:
    return ImuParams(
        acc_n=jnp.asarray(acc_n, dtype), gyr_n=jnp.asarray(gyr_n, dtype),
        acc_w=jnp.asarray(acc_w, dtype), gyr_w=jnp.asarray(gyr_w, dtype),
        g=jnp.asarray([0.0, 0.0, g_norm], dtype),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Preintegrated:
    """Result of integrating one IMU interval at linearization biases ba/bg."""

    delta_p: jnp.ndarray      # (3,)
    delta_q: jnp.ndarray      # (4,) wxyz
    delta_v: jnp.ndarray      # (3,)
    jacobian: jnp.ndarray     # (15, 15) d(state)/d(initial error state incl. biases)
    covariance: jnp.ndarray   # (15, 15)
    sum_dt: jnp.ndarray       # ()
    linearized_ba: jnp.ndarray  # (3,)
    linearized_bg: jnp.ndarray  # (3,)


def _noise_cov(params: ImuParams, dtype):
    n = jnp.zeros((18, 18), dtype)
    an2 = params.acc_n * params.acc_n
    gn2 = params.gyr_n * params.gyr_n
    aw2 = params.acc_w * params.acc_w
    gw2 = params.gyr_w * params.gyr_w
    eye = jnp.eye(3, dtype=dtype)
    n = n.at[0:3, 0:3].set(an2 * eye)
    n = n.at[3:6, 3:6].set(gn2 * eye)
    n = n.at[6:9, 6:9].set(an2 * eye)
    n = n.at[9:12, 9:12].set(gn2 * eye)
    n = n.at[12:15, 12:15].set(aw2 * eye)
    n = n.at[15:18, 15:18].set(gw2 * eye)
    return n


def midpoint_step(dt, acc_0, gyr_0, acc_1, gyr_1, delta_p, delta_q, delta_v,
                  ba, bg, jacobian, covariance, noise):
    """One mid-point integration step (integration_base.h:54-127), pure."""
    dtype = delta_p.dtype
    un_acc_0 = lie.quat_rotate(delta_q, acc_0 - ba)
    un_gyr = 0.5 * (gyr_0 + gyr_1) - bg
    dq_step = jnp.concatenate([jnp.ones((1,), dtype), un_gyr * dt * 0.5])
    result_q = lie.quat_normalize(lie.quat_mul(delta_q, dq_step))
    un_acc_1 = lie.quat_rotate(result_q, acc_1 - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    result_p = delta_p + delta_v * dt + 0.5 * un_acc * dt * dt
    result_v = delta_v + un_acc * dt

    # error-state transition F (15×15) and noise mapping V (15×18)
    R_w = lie.skew(un_gyr)
    R_a0 = lie.skew(acc_0 - ba)
    R_a1 = lie.skew(acc_1 - ba)
    Rq = lie.quat_to_rot(delta_q)
    Rq1 = lie.quat_to_rot(result_q)
    eye = jnp.eye(3, dtype=dtype)
    dt2 = dt * dt

    F = jnp.zeros((15, 15), dtype)
    F = F.at[0:3, 0:3].set(eye)
    F = F.at[0:3, 3:6].set(
        -0.25 * Rq @ R_a0 * dt2 - 0.25 * Rq1 @ R_a1 @ (eye - R_w * dt) * dt2
    )
    F = F.at[0:3, 6:9].set(eye * dt)
    F = F.at[0:3, 9:12].set(-0.25 * (Rq + Rq1) * dt2)
    F = F.at[0:3, 12:15].set(0.25 * Rq1 @ R_a1 * dt2 * dt)
    F = F.at[3:6, 3:6].set(eye - R_w * dt)
    F = F.at[3:6, 12:15].set(-eye * dt)
    F = F.at[6:9, 3:6].set(
        -0.5 * Rq @ R_a0 * dt - 0.5 * Rq1 @ R_a1 @ (eye - R_w * dt) * dt
    )
    F = F.at[6:9, 6:9].set(eye)
    F = F.at[6:9, 9:12].set(-0.5 * (Rq + Rq1) * dt)
    F = F.at[6:9, 12:15].set(0.5 * Rq1 @ R_a1 * dt * dt)
    F = F.at[9:12, 9:12].set(eye)
    F = F.at[12:15, 12:15].set(eye)

    V = jnp.zeros((15, 18), dtype)
    v03 = -0.25 * Rq1 @ R_a1 * dt2 * (0.5 * dt)
    V = V.at[0:3, 0:3].set(0.25 * Rq * dt2)
    V = V.at[0:3, 3:6].set(v03)
    V = V.at[0:3, 6:9].set(0.25 * Rq1 * dt2)
    V = V.at[0:3, 9:12].set(v03)
    v63 = -0.5 * Rq1 @ R_a1 * dt * (0.5 * dt)
    V = V.at[3:6, 3:6].set(0.5 * eye * dt)
    V = V.at[3:6, 9:12].set(0.5 * eye * dt)
    V = V.at[6:9, 0:3].set(0.5 * Rq * dt)
    V = V.at[6:9, 3:6].set(v63)
    V = V.at[6:9, 6:9].set(0.5 * Rq1 * dt)
    V = V.at[6:9, 9:12].set(v63)
    V = V.at[9:12, 12:15].set(eye * dt)
    V = V.at[12:15, 15:18].set(eye * dt)

    new_jac = F @ jacobian
    new_cov = F @ covariance @ F.T + V @ noise @ V.T
    return result_p, result_q, result_v, new_jac, new_cov


def preintegrate(dts, accs, gyrs, acc0, gyr0, ba, bg, params: ImuParams,
                 mask=None) -> Preintegrated:
    """Integrate a chunk of IMU samples.

    Args:
      dts:  (N,) per-sample dt (seconds).
      accs: (N, 3) accelerometer samples (acc_1 of each step).
      gyrs: (N, 3) gyro samples.
      acc0, gyr0: (3,) the sample at interval start (linearized_acc/gyr).
      ba, bg: (3,) linearization biases.
      params: noise model.
      mask: (N,) bool — True for real samples (padding rows are skipped).
    """
    dtype = accs.dtype
    n_samples = dts.shape[0]
    if mask is None:
        mask = jnp.ones((n_samples,), bool)
    noise = _noise_cov(params, dtype)

    init = (
        jnp.zeros(3, dtype), lie.quat_identity(dtype), jnp.zeros(3, dtype),
        jnp.eye(15, dtype=dtype), jnp.zeros((15, 15), dtype),
        jnp.asarray(0.0, dtype), acc0.astype(dtype), gyr0.astype(dtype),
    )

    def step(carry, inp):
        dp, dq, dv, jac, cov, sum_dt, a0, g0 = carry
        dt, a1, g1, m = inp
        ndp, ndq, ndv, njac, ncov = midpoint_step(
            dt, a0, g0, a1, g1, dp, dq, dv, ba, bg, jac, cov, noise
        )
        keep = ~m
        dp = jnp.where(keep, dp, ndp)
        dq = jnp.where(keep, dq, ndq)
        dv = jnp.where(keep, dv, ndv)
        jac = jnp.where(keep, jac, njac)
        cov = jnp.where(keep, cov, ncov)
        sum_dt = jnp.where(keep, sum_dt, sum_dt + dt)
        a0 = jnp.where(keep, a0, a1)
        g0 = jnp.where(keep, g0, g1)
        return (dp, dq, dv, jac, cov, sum_dt, a0, g0), None

    (dp, dq, dv, jac, cov, sum_dt, _, _), _ = jax.lax.scan(
        step, init, (dts.astype(dtype), accs, gyrs, mask)
    )
    return Preintegrated(
        delta_p=dp, delta_q=dq, delta_v=dv, jacobian=jac, covariance=cov,
        sum_dt=sum_dt, linearized_ba=ba.astype(dtype), linearized_bg=bg.astype(dtype),
    )


@jax.jit
def preintegrate_batch(dts, accs, gyrs, acc0, gyr0, ba, bg,
                       params: ImuParams, mask) -> Preintegrated:
    """vmapped `preintegrate` over a leading interval axis (one jit call).

    dts: (K, N); accs/gyrs: (K, N, 3); acc0/gyr0/ba/bg: (K, 3); mask: (K, N).
    """
    return jax.vmap(
        lambda d, a, w, a0, w0, ba_, bg_, m: preintegrate(
            d, a, w, a0, w0, ba_, bg_, params, m)
    )(dts, accs, gyrs, acc0, gyr0, ba, bg, mask)


def evaluate(pre: Preintegrated, g,
             Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj):
    """15-dim preintegration residual (integration_base.h:159-185)."""
    dp_dba = pre.jacobian[O_P:O_P + 3, O_BA:O_BA + 3]
    dp_dbg = pre.jacobian[O_P:O_P + 3, O_BG:O_BG + 3]
    dq_dbg = pre.jacobian[O_R:O_R + 3, O_BG:O_BG + 3]
    dv_dba = pre.jacobian[O_V:O_V + 3, O_BA:O_BA + 3]
    dv_dbg = pre.jacobian[O_V:O_V + 3, O_BG:O_BG + 3]

    dba = Bai - pre.linearized_ba
    dbg = Bgi - pre.linearized_bg

    corrected_q = lie.quat_mul(pre.delta_q, lie.delta_q(dq_dbg @ dbg))
    corrected_v = pre.delta_v + dv_dba @ dba + dv_dbg @ dbg
    corrected_p = pre.delta_p + dp_dba @ dba + dp_dbg @ dbg

    sdt = pre.sum_dt
    qi_inv = lie.quat_conj(Qi)
    r_p = lie.quat_rotate(qi_inv, 0.5 * g * sdt * sdt + Pj - Pi - Vi * sdt) - corrected_p
    r_q = 2.0 * lie.quat_mul(lie.quat_inv(corrected_q), lie.quat_mul(qi_inv, Qj))[1:]
    r_v = lie.quat_rotate(qi_inv, g * sdt + Vj - Vi) - corrected_v
    return jnp.concatenate([r_p, r_q, r_v, Baj - Bai, Bgj - Bgi])
