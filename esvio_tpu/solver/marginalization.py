"""Schur-complement marginalization → linearized prior (TPU-native).

Re-designs MarginalizationInfo/MarginalizationFactor
(/root/reference/esvio_estimator/src/factor/marginalization_factor.cpp:72-323):
instead of collecting heap residual blocks and assembling the dense Hessian
with 4 pthreads, the drop-set sub-problem is linearized with the same batched
`linearize` used by the solver (books restricted by mask), and the prior
J₀/r₀ come from one eigendecomposition — the exact math of `marginalize()`
(eigen pseudo-inverse with eps 1e-8, sqrt-factor S^{1/2}Vᵀ).

MARGIN_OLD  : drop pose0+speedbias0+landmarks first seen in frame 0; factors
              entering: previous prior, IMU(0→1), all projections of those
              landmarks (estimator.cpp:2049-2206).
MARGIN_2ND  : drop pose[WINDOW-1] from the previous prior only
              (estimator.cpp:2221-2285; speedbias[WINDOW-1] never enters).
Both produce the prior re-indexed for the slid window.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from esvio_tpu.solver import gauss_newton as gn
from esvio_tpu.solver.window import (
    DIM_ALL, N_STATES, OFF_EX, OFF_SB, OFF_TD, WINDOW,
    FeatureBook, WindowState, start_frame,
)

_EPS = 1e-8  # eigenvalue threshold (marginalization_factor.cpp:233,257)


def _pose_cols(k):
    return list(range(k * 6, k * 6 + 6))


def _sb_cols(k):
    return list(range(OFF_SB + k * 9, OFF_SB + k * 9 + 9))


def _perm_shift_old():
    """new-layout index → old-layout index after MARGIN_OLD slide (-1 = free)."""
    perm = [-1] * DIM_ALL
    for k in range(WINDOW):              # new pose k ← old pose k+1
        for a in range(6):
            perm[k * 6 + a] = (k + 1) * 6 + a
        for a in range(9):
            perm[OFF_SB + k * 9 + a] = OFF_SB + (k + 1) * 9 + a
    for a in range(OFF_EX, DIM_ALL):     # ex + td unchanged
        perm[a] = a
    return jnp.asarray(perm, jnp.int32)


def _perm_shift_second_new():
    """new ← old for MARGIN_SECOND_NEW: slot WINDOW ← slot WINDOW shifted."""
    perm = [-1] * DIM_ALL
    for k in range(WINDOW - 1):          # frames 0..8 unchanged
        for a in range(6):
            perm[k * 6 + a] = k * 6 + a
        for a in range(9):
            perm[OFF_SB + k * 9 + a] = OFF_SB + k * 9 + a
    # new slot 9 ← old slot 10 (the just-added frame)
    for a in range(6):
        perm[(WINDOW - 1) * 6 + a] = WINDOW * 6 + a
    for a in range(9):
        perm[OFF_SB + (WINDOW - 1) * 9 + a] = OFF_SB + WINDOW * 9 + a
    for a in range(OFF_EX, DIM_ALL):
        perm[a] = a
    return jnp.asarray(perm, jnp.int32)


def _apply_perm(A, b, perm):
    """Re-index (A, b) from old layout into new layout; -1 slots become zero."""
    safe = jnp.maximum(perm, 0)
    mask = (perm >= 0).astype(A.dtype)
    A_new = A[safe][:, safe] * mask[:, None] * mask[None, :]
    b_new = b[safe] * mask
    return A_new, b_new


def _schur_eliminate(A, b, m_idx, eps=_EPS):
    """Eliminate the static index set m_idx via eigen pseudo-inverse."""
    m_idx = jnp.asarray(m_idx, jnp.int32)
    n = A.shape[0]
    keep_mask = jnp.ones((n,), bool).at[m_idx].set(False)
    r_idx = jnp.where(keep_mask, size=n - len(m_idx))[0]

    Amm = A[m_idx][:, m_idx]
    Amm = 0.5 * (Amm + Amm.T)
    w, V = jnp.linalg.eigh(Amm)
    w_inv = jnp.where(w > eps, 1.0 / jnp.where(w > eps, w, 1.0), 0.0)
    Amm_inv = (V * w_inv[None, :]) @ V.T

    Arm = A[r_idx][:, m_idx]
    Arr = A[r_idx][:, r_idx]
    bm = b[m_idx]
    br = b[r_idx]
    A_out = Arr - Arm @ Amm_inv @ Arm.T
    b_out = br - Arm @ Amm_inv @ bm
    # embed back into full-size layout (rows/cols of m zeroed)
    A_full = jnp.zeros_like(A[: n, : n])
    A_full = A_full.at[r_idx[:, None], r_idx[None, :]].set(A_out)
    b_full = jnp.zeros_like(b)
    b_full = b_full.at[r_idx].set(b_out)
    return A_full, b_full


def _prior_from_hessian(A, b, lin: WindowState) -> gn.Prior:
    """J₀ = S^{1/2}Vᵀ, r₀ = S^{-1/2}Vᵀ b (marginalize(), .cpp:249-269)."""
    A = 0.5 * (A + A.T)
    w, V = jnp.linalg.eigh(A)
    ok = w > _EPS
    s = jnp.where(ok, jnp.sqrt(jnp.where(ok, w, 1.0)), 0.0)
    s_inv = jnp.where(ok, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    J0 = s[:, None] * V.T
    r0 = s_inv * (V.T @ b)
    return gn.Prior(J0=J0, r0=r0, lin=lin, valid=jnp.asarray(True))


def _shift_state_old(state: WindowState) -> WindowState:
    roll = lambda x: jnp.concatenate([x[1:], x[-1:]], axis=0)
    return dataclasses.replace(
        state, P=roll(state.P), Q=roll(state.Q), V=roll(state.V),
        Ba=roll(state.Ba), Bg=roll(state.Bg),
    )


def _shift_state_second_new(state: WindowState) -> WindowState:
    def sh(x):
        return x.at[WINDOW - 1].set(x[WINDOW])
    return dataclasses.replace(
        state, P=sh(state.P), Q=sh(state.Q), V=sh(state.V),
        Ba=sh(state.Ba), Bg=sh(state.Bg),
    )


@jax.jit
def marginalize_old(state: WindowState, book_img: FeatureBook,
                    book_evt: FeatureBook, preints, imu_valid,
                    prior: gn.Prior, g, cauchy_c: float = 1.0) -> gn.Prior:
    """Marginalize frame 0 (+ its landmarks) → prior for the slid window."""

    def restrict(book):
        return dataclasses.replace(
            book, active=book.active & (start_frame(book) == 0))

    bi = restrict(book_img)
    be = restrict(book_evt)
    iv = jnp.zeros((WINDOW,), bool).at[0].set(imu_valid[0])
    # Schur-ready structured assembly (r4) — the slab-path assemble_normal
    # this replaces cost ~50× the FLOPs once per MARGIN_OLD tick
    Hpp, Hpl, hll, bp, bl, _ = gn.assemble_normal_reduced(
        state, bi, be, preints, iv, prior, g, cauchy_c)

    # eliminate landmarks (diagonal block)
    act = hll > _EPS
    inv_hll = jnp.where(act, 1.0 / jnp.where(act, hll, 1.0), 0.0)
    A = Hpp - (Hpl * inv_hll[None, :]) @ Hpl.T
    bb = bp - Hpl @ (bl * inv_hll)

    # eliminate pose0 + speedbias0
    m_idx = _pose_cols(0) + _sb_cols(0)
    A, bb = _schur_eliminate(A, bb, m_idx)

    # re-index for the slid window
    A, bb = _apply_perm(A, bb, _perm_shift_old())
    return _prior_from_hessian(A, bb, _shift_state_old(state))


@jax.jit
def marginalize_second_new(prior: gn.Prior) -> gn.Prior:
    """Drop pose[WINDOW-1] from the prior; shift the new frame into its slot."""
    dtype = prior.J0.dtype
    A = prior.J0.T @ prior.J0
    b = prior.J0.T @ prior.r0
    A, b = _schur_eliminate(A, b, _pose_cols(WINDOW - 1))
    A, b = _apply_perm(A, b, _perm_shift_second_new())
    new = _prior_from_hessian(A, b, _shift_state_second_new(prior.lin))
    return dataclasses.replace(new, valid=prior.valid)
