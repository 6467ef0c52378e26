"""IMU-aided event motion compensation (warp events to window start).

Re-derivation of EventDetector::motioncorrection + the per-event caller
(/root/reference/feature_tracker/src/event_detector/event_detector.cc:547-591,
createSAE_* overloads :102-147): each event (x, y) at time t is warped to the
window start t₀ with the rotation exp([ω]× dt) and translation ½dt(v+v_prev),
only when ‖accel‖ exceeds the threshold (default 5 m/s²,
a_motion_compensation_threshold).  Whole chunks warp in one vectorized pass.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from esvio_tpu.core import lie
from esvio_tpu.events.sae import EventChunk

ACCEL_THRESHOLD = 5.0   # a_motion_compensation_threshold
_BORDER = 6             # kBorder (event_detector.cc:550)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def motion_correct_chunk(chunk: EventChunk, fx, fy, cx, cy, omega, v_cur,
                         v_prev, accel, t0, width: int, height: int):
    """Warp chunk events to time t0 (returns a new chunk).

    omega: (3,) mean gyro over the window; v_cur/v_prev: (3,) back-end
    velocity feedback; accel: (3,) mean accelerometer; t0: window start time.
    Disabled (identity) when ‖accel‖ ≤ 5 m/s², exactly like the reference.
    """
    dtype = jnp.result_type(fx, jnp.float32)
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype)
    K_inv = jnp.array(
        [[1.0 / fx, 0.0, -cx / fx], [0.0, 1.0 / fy, -cy / fy], [0.0, 0.0, 1.0]],
        dtype)

    dt = chunk.t - t0
    enabled = jnp.linalg.norm(accel) > ACCEL_THRESHOLD

    # per-event rotation exp([ω dt]×); translation term from mean velocity
    rot = lie.so3_exp(omega[None, :] * dt[:, None])        # (E, 3, 3)
    rot_K = jnp.einsum("ij,ejk,kl->eil", K, jnp.swapaxes(rot, 1, 2), K_inv)
    trans = 0.5 * dt[:, None] * (v_cur + v_prev)[None, :]  # (E, 3)
    # reference: trans_K = -rot_K @ (K⁻¹ @ trans)  (event_detector.cc:561)
    trans_K = -jnp.einsum("eij,ej->ei", rot_K,
                          jnp.einsum("ij,ej->ei", K_inv, trans))

    vec = jnp.stack([chunk.x.astype(dtype), chunk.y.astype(dtype),
                     jnp.ones_like(dt)], axis=-1)
    warped = jnp.einsum("eij,ej->ei", rot_K, vec) + trans_K
    wx = jnp.floor(warped[:, 0] / warped[:, 2]).astype(jnp.int32)
    wy = jnp.floor(warped[:, 1] / warped[:, 2]).astype(jnp.int32)

    in_src = ((chunk.x > _BORDER) & (chunk.x <= width - _BORDER)
              & (chunk.y > _BORDER) & (chunk.y <= height - _BORDER))
    in_dst = (wx > 0) & (wx < width - 1) & (wy > 0) & (wy < height - 1)
    use = enabled & in_src & in_dst
    return dataclasses.replace(
        chunk,
        x=jnp.where(use, wx, chunk.x),
        y=jnp.where(use, wy, chunk.y),
    )
