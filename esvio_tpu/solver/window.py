"""Sliding-window state & feature books (static-shape pytrees) + error-state layout.

Re-designs the reference's parameter-block marshalling
(/root/reference/esvio_estimator/src/estimator.cpp:1498-1697 vector2double /
double2vector3) as a fixed layout error-state vector:

    [ poses 11×6 | speed-bias 11×9 | extrinsics 4×6 | td 1 ]  = 190 dims
      δpose  = (δp ∈ R³, δθ ∈ so(3): q ← q ⊗ dq(δθ))
      δsb    = (δv, δba, δbg)

Landmark inverse depths live outside this vector (Schur-eliminated).
Extrinsic slots follow para_Ex_Pose ordering (estimator.cpp:1886-1986):
0 = image-left, 1 = event-left, 2 = image-right, 3 = event-right.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from esvio_tpu.core import lie

WINDOW = 10                 # WINDOW_SIZE (parameters.h:14)
N_STATES = WINDOW + 1
N_EX = 4
DIM_POSE = 6
DIM_SB = 9
OFF_POSE = 0
OFF_SB = N_STATES * DIM_POSE                   # 66
OFF_EX = OFF_SB + N_STATES * DIM_SB            # 165
OFF_TD = OFF_EX + N_EX * DIM_POSE              # 189
DIM_ALL = OFF_TD + 1                           # 190

FOCAL = 460.0               # FOCAL_LENGTH (parameters.h:13)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowState:
    P: jnp.ndarray    # (11, 3)
    Q: jnp.ndarray    # (11, 4) wxyz
    V: jnp.ndarray    # (11, 3)
    Ba: jnp.ndarray   # (11, 3)
    Bg: jnp.ndarray   # (11, 3)
    ex_p: jnp.ndarray  # (4, 3)
    ex_q: jnp.ndarray  # (4, 4)
    td: jnp.ndarray   # ()


def init_window(dtype=jnp.float32) -> WindowState:
    qid = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (N_STATES, 1))
    qex = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (N_EX, 1))
    return WindowState(
        P=jnp.zeros((N_STATES, 3), dtype), Q=qid,
        V=jnp.zeros((N_STATES, 3), dtype),
        Ba=jnp.zeros((N_STATES, 3), dtype), Bg=jnp.zeros((N_STATES, 3), dtype),
        ex_p=jnp.zeros((N_EX, 3), dtype), ex_q=qex, td=jnp.asarray(0.0, dtype),
    )


def apply_delta(state: WindowState, dx) -> WindowState:
    """x ⊞ δ with the layout above (quaternions right-multiplied)."""
    dp = dx[OFF_POSE:OFF_SB].reshape(N_STATES, 6)
    dsb = dx[OFF_SB:OFF_EX].reshape(N_STATES, 9)
    dex = dx[OFF_EX:OFF_TD].reshape(N_EX, 6)
    dtd = dx[OFF_TD]
    Q = lie.quat_normalize(lie.quat_mul(state.Q, lie.delta_q(dp[:, 3:6])))
    ex_q = lie.quat_normalize(lie.quat_mul(state.ex_q, lie.delta_q(dex[:, 3:6])))
    return WindowState(
        P=state.P + dp[:, 0:3], Q=Q,
        V=state.V + dsb[:, 0:3], Ba=state.Ba + dsb[:, 3:6], Bg=state.Bg + dsb[:, 6:9],
        ex_p=state.ex_p + dex[:, 0:3], ex_q=ex_q, td=state.td + dtd,
    )


def state_minus(state: WindowState, lin: WindowState):
    """x ⊟ x₀ → (190,) — matches MarginalizationFactor::Evaluate's dx
    (marginalization_factor.cpp:283-323): δθ = 2 vec(q₀⁻¹ ⊗ q)."""
    dq = lie.quat_mul(lie.quat_conj(lin.Q), state.Q)
    dq = jnp.where(dq[..., :1] >= 0, dq, -dq)
    dth = 2.0 * dq[..., 1:]
    dex_q = lie.quat_mul(lie.quat_conj(lin.ex_q), state.ex_q)
    dex_q = jnp.where(dex_q[..., :1] >= 0, dex_q, -dex_q)
    dex_th = 2.0 * dex_q[..., 1:]
    dpose = jnp.concatenate([state.P - lin.P, dth], axis=-1).reshape(-1)
    dsb = jnp.concatenate(
        [state.V - lin.V, state.Ba - lin.Ba, state.Bg - lin.Bg], axis=-1
    ).reshape(-1)
    dex = jnp.concatenate([state.ex_p - lin.ex_p, dex_th], axis=-1).reshape(-1)
    return jnp.concatenate([dpose, dsb, dex, (state.td - lin.td)[None]])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FeatureBook:
    """Per-modality (image / event) feature observations over the window.

    Equivalent of the reference's per-id lists (feature_manager.h) in
    capacity+mask form: lane l ↔ one feature id.
    """

    un: jnp.ndarray        # (L, 11, 2) normalized left obs
    vel: jnp.ndarray       # (L, 11, 2) normalized velocity left
    un_r: jnp.ndarray      # (L, 11, 2) right obs
    vel_r: jnp.ndarray     # (L, 11, 2)
    obs: jnp.ndarray       # (L, 11) bool — left observation present
    stereo: jnp.ndarray    # (L, 11) bool — right observation present
    td_obs: jnp.ndarray    # (L, 11) per-obs td captured at packet time
    inv_depth: jnp.ndarray   # (L,)
    depth_valid: jnp.ndarray  # (L,) bool
    active: jnp.ndarray    # (L,) bool — lane occupied
    ids: jnp.ndarray       # (L,) int32


def empty_book(capacity: int, dtype=jnp.float32) -> FeatureBook:
    L, F = capacity, N_STATES
    return FeatureBook(
        un=jnp.zeros((L, F, 2), dtype), vel=jnp.zeros((L, F, 2), dtype),
        un_r=jnp.zeros((L, F, 2), dtype), vel_r=jnp.zeros((L, F, 2), dtype),
        obs=jnp.zeros((L, F), bool), stereo=jnp.zeros((L, F), bool),
        td_obs=jnp.zeros((L, F), dtype),
        inv_depth=jnp.zeros((L,), dtype), depth_valid=jnp.zeros((L,), bool),
        active=jnp.zeros((L,), bool), ids=jnp.full((L,), -1, jnp.int32),
    )


def start_frame(book: FeatureBook):
    """(L,) index of first observed frame (0 if never observed)."""
    return jnp.argmax(book.obs, axis=1).astype(jnp.int32)


def used_num(book: FeatureBook):
    return jnp.sum(book.obs, axis=1).astype(jnp.int32)


def gauge_transform(state: WindowState, ref_p0, ref_q0):
    """(rot, q_rot, p0) of the gauge correction: any pose in the solved frame
    maps as P' = rot @ (P − p0) + ref_p0, Q' = q_rot ⊗ Q.  Shared by
    gauge_fix and the relo-pose correction (the reference applies the same
    yaw/position shift to relo_Pose, estimator.cpp:1652-1695)."""
    ypr_ref = lie.rot_to_ypr(lie.quat_to_rot(ref_q0))
    ypr_cur = lie.rot_to_ypr(lie.quat_to_rot(state.Q[0]))
    ydiff = ypr_ref[0] - ypr_cur[0]
    rot = lie.ypr_to_rot(jnp.stack([ydiff, jnp.zeros_like(ydiff),
                                    jnp.zeros_like(ydiff)]))
    # Euler-singularity fallback (|pitch| ≈ 90°): full R ref ∘ R cur⁻¹
    singular = (jnp.abs(ypr_cur[1]) > 89.0) | (jnp.abs(ypr_ref[1]) > 89.0)
    rot_full = lie.quat_to_rot(ref_q0) @ lie.quat_to_rot(state.Q[0]).T
    rot = jnp.where(singular, rot_full, rot)
    return rot, lie.rot_to_quat(rot), state.P[0]


def gauge_fix(state: WindowState, ref_p0, ref_q0) -> WindowState:
    """Rotate/translate the whole window so frame 0 keeps its pre-solve yaw
    and position (stereo_double2vector3, estimator.cpp:1600-1697).

    Pitch/roll are observable (gravity) and untouched; only the yaw difference
    and the frame-0 position shift are removed.
    """
    rot, q_rot, p0 = gauge_transform(state, ref_p0, ref_q0)
    P = (state.P - p0) @ rot.T + ref_p0
    Q = lie.quat_normalize(lie.quat_mul(q_rot[None, :], state.Q))
    V = state.V @ rot.T
    return dataclasses.replace(state, P=P, Q=Q, V=V)
