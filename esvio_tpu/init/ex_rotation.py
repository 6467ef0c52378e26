"""Camera-IMU extrinsic rotation self-calibration (hand-eye).

Re-design of /root/reference/esvio_estimator/src/initial/initial_ex_rotation.cpp
(InitialEXRotation::CalibrationExRotation), used when estimate_extrinsic == 2
(estimator.cpp:226-242): from pairs of per-interval camera rotations (from the
essential matrix) and IMU preintegrated rotations, solve Qleft(q_imu)·q =
Qright(q_cam)·q for the body→camera quaternion via the stacked-SVD formulation,
with Huber down-weighting of pairs that disagree with the current estimate.

One vmapped kernel builds all 4×4 blocks; convergence is judged by the
second-smallest singular value (> 0.25, reference :74-80)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from esvio_tpu.core import lie


def calibrate_ex_rotation(q_cam, q_imu, ric0, valid=None):
    """q_cam: (N, 4) camera relative rotations c_k→c_{k+1} (from E-matrix);
    q_imu: (N, 4) preintegrated body rotations b_k→b_{k+1}; ric0: (4,) the
    current cam→body extrinsic (the estimator's ex_q convention, = VINS ric)
    used for the Huber weights.

    Returns (q_ric, ok, sv): calibrated cam→body quaternion, convergence
    flag, and the singular values (for diagnostics)."""
    dtype = q_cam.dtype
    N = q_cam.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)

    # predicted camera rotation from IMU: ric⁻¹ ⊗ q_imu ⊗ ric (ric cam→body)
    ric_inv = lie.quat_inv(ric0)
    q_pred = lie.quat_mul(
        lie.quat_mul(jnp.broadcast_to(ric_inv, q_imu.shape), q_imu),
        jnp.broadcast_to(ric0, q_imu.shape))
    # angular distance between measured and predicted camera rotation
    d = lie.quat_mul(lie.quat_inv(q_cam), q_pred)
    ang = 2.0 * jnp.arctan2(jnp.linalg.norm(d[:, 1:], axis=-1),
                            jnp.abs(d[:, 0]))
    ang_deg = ang * (180.0 / jnp.pi)
    huber = jnp.where(ang_deg > 5.0, 5.0 / jnp.maximum(ang_deg, 1e-6), 1.0)
    w = huber * valid.astype(dtype)

    # stack w · (Qleft(q_cam) − Qright(q_imu)) — reference :58-72
    blocks = (lie.quat_left(q_cam) - lie.quat_right(q_imu)) * w[:, None, None]
    A = blocks.reshape(N * 4, 4)
    _, S, Vt = jnp.linalg.svd(A, full_matrices=True)
    # nullspace quaternion solves q_cam ⊗ q = q ⊗ q_imu ⇒ q is body→cam;
    # return its inverse (cam→body) to match ex_q (reference :70-73 inverts)
    q = Vt[-1]
    q = q * jnp.where(q[0] < 0, -1.0, 1.0)
    q = lie.quat_inv(q / jnp.linalg.norm(q))
    # convergence gate.  The reference uses the absolute threshold
    # ric_cov(1) > 0.25 with ≥ WINDOW_SIZE pairs (:74-80); the matrix entries
    # scale ~sin(θ/2) with the per-interval rotation θ, so that constant
    # implicitly assumes the reference's inter-frame rotation scale.  We add
    # the scale-invariant form: the observable directions (S[2]) must be
    # separated from the null space (S[3], the solution) by a wide margin —
    # single-axis (degenerate) excitation keeps S[2] ≈ S[3] and is rejected
    # by both forms.
    n = jnp.sum(valid)
    ok = ((S[2] > 0.25) | ((S[2] > 10.0 * S[3]) & (S[2] > 0.05) & (n >= 15))) \
        & (n >= 10)
    return q, ok, S
