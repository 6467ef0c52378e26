"""Sliding-window bundle adjustment: batched linearization + LM with Schur.

TPU-native replacement for the reference's Ceres problem assembly + solve
(/root/reference/esvio_estimator/src/estimator.cpp:1828-2288, solver options
:2024-2036 DENSE_SCHUR/DOGLEG/explicit Schur, ≤8 iterations):

  * every factor family is linearized **densely with masks** — no per-factor
    heap objects: all L×11 (feature, frame) projection factors of a book are
    one `vmap`, all 10 IMU factors one `vmap`;
  * the full Jacobian is scattered into one (R, 190 + L_total) matrix so the
    Gauss-Newton normal equations are a single JᵀJ matmul (MXU-friendly);
  * inverse depths are Schur-eliminated (their Hessian block is diagonal by
    construction — one landmark never shares a residual row with another),
    mirroring `use_explicit_schur_complement`;
  * Levenberg-Marquardt with accept/reject replaces DOGLEG's trust region
    (fixed 8 iterations, no wall-clock cap — a TPU step is deterministic).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from esvio_tpu.imu import preintegration as pre
from esvio_tpu.solver import factors
from esvio_tpu.solver.window import (
    DIM_ALL, N_EX, N_STATES, OFF_EX, OFF_SB, OFF_TD, WINDOW,
    FeatureBook, WindowState, apply_delta, start_frame, state_minus, used_num,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Prior:
    """Marginalization prior: r(x) = r0 + J0 · (x ⊟ lin)."""

    J0: jnp.ndarray        # (DIM_ALL, DIM_ALL)
    r0: jnp.ndarray        # (DIM_ALL,)
    lin: WindowState
    valid: jnp.ndarray     # () bool


def empty_prior(dtype=jnp.float32) -> Prior:
    from esvio_tpu.solver.window import init_window
    return Prior(
        J0=jnp.zeros((DIM_ALL, DIM_ALL), dtype), r0=jnp.zeros((DIM_ALL,), dtype),
        lin=init_window(dtype), valid=jnp.asarray(False),
    )


def _book_gate(book: FeatureBook):
    """Features entering the problem (estimator.cpp:1901-1904 gates + depth)."""
    return (
        book.active & (used_num(book) >= 2) & (start_frame(book) < WINDOW - 2)
        & book.depth_valid
    )


def _gather_start(book: FeatureBook, start):
    """Per-lane observation at the start frame."""
    idx = start[:, None, None]
    pt = jnp.take_along_axis(book.un, jnp.broadcast_to(idx, (book.un.shape[0], 1, 2)),
                             axis=1)[:, 0]
    vel = jnp.take_along_axis(book.vel, jnp.broadcast_to(idx, (book.un.shape[0], 1, 2)),
                              axis=1)[:, 0]
    td = jnp.take_along_axis(book.td_obs, start[:, None], axis=1)[:, 0]
    return pt, vel, td


def _sanitize(x, mask, fill=0.0):
    return jnp.where(mask, x, fill)


def _scatter_rows(J, rows, cols, vals):
    """J[rows[f, a], cols[f, b]] += vals[f, a, b]."""
    return J.at[rows[:, :, None], cols[:, None, :]].add(vals)


def factor_blocks(state: WindowState, book_img: FeatureBook,
                  book_evt: FeatureBook, preints: pre.Preintegrated,
                  imu_valid, prior: Prior, g, cauchy_c: float = 1.0,
                  with_jac: bool = True, imu_sqrt=None):
    """Evaluate every factor family as weighted dense blocks.

    Returns (blocks, (r_prior, J_prior), L_tot) where blocks is a list of
    (r (N, k), J (N, k, d) | None, cols (N, d) int32) with masks/robust
    weights already folded into r and J.  Shared by the big-J `linearize`
    (marginalization, tests) and the block-wise `assemble_normal`
    (solver hot loop).
    """
    dtype = state.P.dtype
    L_img = book_img.un.shape[0]
    L_evt = book_evt.un.shape[0]
    F = N_STATES
    blocks = []

    # ---------------- IMU factors ------------------------------------------
    Pi, Pj = state.P[:-1], state.P[1:]
    Qi, Qj = state.Q[:-1], state.Q[1:]
    Vi, Vj = state.V[:-1], state.V[1:]
    Bai, Baj = state.Ba[:-1], state.Ba[1:]
    Bgi, Bgj = state.Bg[:-1], state.Bg[1:]

    if imu_sqrt is None:
        # 15×15 inverse+Cholesky per interval — preintegration-only, so LM
        # loops precompute it once and pass it in (see imu_residual_jac)
        imu_sqrt = factors.imu_sqrt_info(preints.covariance)
    if with_jac:
        r_imu, J_imu = jax.vmap(
            lambda *a: factors.imu_residual_jac(*a[:-1], g, a[-1])
        )(Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, preints, imu_sqrt)
    else:
        r_imu = jax.vmap(
            lambda *a: factors.imu_residual(*a[:-1], g, a[-1])
        )(Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, preints, imu_sqrt)
        J_imu = None
    m = imu_valid[:, None].astype(dtype)
    r_imu = r_imu * m
    i_idx = jnp.arange(WINDOW)
    a6 = jnp.arange(6)[None, :]
    a9 = jnp.arange(9)[None, :]
    cols_imu = jnp.concatenate([
        i_idx[:, None] * 6 + a6,
        OFF_SB + i_idx[:, None] * 9 + a9,
        (i_idx + 1)[:, None] * 6 + a6,
        OFF_SB + (i_idx + 1)[:, None] * 9 + a9,
    ], axis=1)
    if with_jac:
        J_imu = J_imu * m[:, :, None]
    blocks.append((r_imu, J_imu, cols_imu))

    # ---------------- projection factors per book --------------------------
    def book_blocks(book: FeatureBook, ex_left: int, ex_right: int,
                    lm_base: int):
        L = book.un.shape[0]
        gate = _book_gate(book)
        start = start_frame(book)
        pt_i, vel_i, td_i = _gather_start(book, start)
        inv_dep = jnp.where(gate & (jnp.abs(book.inv_depth) > 1e-4),
                            book.inv_depth, 1.0)

        j_idx = jnp.arange(F)
        mask_mono = gate[:, None] & book.obs & (j_idx[None, :] != start[:, None])
        mask_cross = gate[:, None] & book.stereo & (j_idx[None, :] != start[:, None])
        mask_static = gate & jnp.take_along_axis(book.stereo, start[:, None], 1)[:, 0]

        # flatten (L, F) factor grids
        def flat(x):
            return x.reshape((L * F,) + x.shape[2:])

        Pi_f = state.P[jnp.broadcast_to(start[:, None], (L, F)).reshape(-1)]
        Qi_f = state.Q[jnp.broadcast_to(start[:, None], (L, F)).reshape(-1)]
        Pj_f = jnp.tile(state.P, (L, 1))
        Qj_f = jnp.tile(state.Q, (L, 1))
        lam_f = jnp.repeat(inv_dep, F)
        pt_i_f = jnp.repeat(pt_i, F, axis=0)
        vel_i_f = jnp.repeat(vel_i, F, axis=0)
        td_i_f = jnp.repeat(td_i, F)

        exl_p, exl_q = state.ex_p[ex_left], state.ex_q[ex_left]
        exr_p, exr_q = state.ex_p[ex_right], state.ex_q[ex_right]

        def mono_one(Pi_, Qi_, Pj_, Qj_, lam, pti, veli, tdi, ptj, velj, tdj):
            if with_jac:
                return factors.proj21_jac(Pi_, Qi_, Pj_, Qj_, exl_p, exl_q, lam,
                                          state.td, pti, veli, tdi, ptj, velj, tdj)
            return factors.proj_two_frame_one_cam(
                Pi_, Qi_, Pj_, Qj_, exl_p, exl_q, lam, state.td,
                pti, veli, tdi, ptj, velj, tdj), None

        r_mono, J_mono = jax.vmap(mono_one)(
            Pi_f, Qi_f, Pj_f, Qj_f, lam_f, pt_i_f, vel_i_f, td_i_f,
            flat(book.un), flat(book.vel), flat(book.td_obs),
        )

        def cross_one(Pi_, Qi_, Pj_, Qj_, lam, pti, veli, tdi, ptj, velj, tdj):
            if with_jac:
                return factors.proj22_jac(
                    Pi_, Qi_, Pj_, Qj_, exl_p, exl_q, exr_p, exr_q, lam,
                    state.td, pti, veli, tdi, ptj, velj, tdj)
            return factors.proj_two_frame_two_cam(
                Pi_, Qi_, Pj_, Qj_, exl_p, exl_q, exr_p, exr_q, lam, state.td,
                pti, veli, tdi, ptj, velj, tdj), None

        r_cross, J_cross = jax.vmap(cross_one)(
            Pi_f, Qi_f, Pj_f, Qj_f, lam_f, pt_i_f, vel_i_f, td_i_f,
            flat(book.un_r), flat(book.vel_r), flat(book.td_obs),
        )

        pt_j_static = jnp.take_along_axis(
            book.un_r, jnp.broadcast_to(start[:, None, None], (L, 1, 2)), 1)[:, 0]
        vel_j_static = jnp.take_along_axis(
            book.vel_r, jnp.broadcast_to(start[:, None, None], (L, 1, 2)), 1)[:, 0]

        def static_one(lam, pti, veli, tdi, ptj, velj, tdj):
            if with_jac:
                return factors.proj12_jac(exl_p, exl_q, exr_p, exr_q, lam,
                                          state.td, pti, veli, tdi, ptj, velj, tdj)
            return factors.proj_one_frame_two_cam(
                exl_p, exl_q, exr_p, exr_q, lam, state.td,
                pti, veli, tdi, ptj, velj, tdj), None

        r_static, J_static = jax.vmap(static_one)(
            inv_dep, pt_i, vel_i, td_i, pt_j_static, vel_j_static, td_i)

        # Cauchy IRLS weights on the weighted residual (Ceres loss semantics)
        def wrow(r, mask):
            s = jnp.sum(r * r, axis=-1)
            w = factors.cauchy_weight(s, cauchy_c) * mask.astype(dtype)
            return w[:, None]

        w_mono = wrow(r_mono, flat(mask_mono))
        w_cross = wrow(r_cross, flat(mask_cross))
        w_static = wrow(r_static, mask_static)
        r_mono = r_mono * w_mono
        r_cross = r_cross * w_cross
        r_static = r_static * w_static
        if with_jac:
            J_mono = J_mono * w_mono[:, :, None]
            J_cross = J_cross * w_cross[:, :, None]
            J_static = J_static * w_static[:, :, None]

        start_f = jnp.broadcast_to(start[:, None], (L, F)).reshape(-1)
        j_f = jnp.tile(j_idx, (L,))
        lane_f = jnp.repeat(jnp.arange(L), F)
        cols_pi = start_f[:, None] * 6 + a6
        cols_pj = j_f[:, None] * 6 + a6
        cols_exl = OFF_EX + ex_left * 6 + a6
        cols_exr = OFF_EX + ex_right * 6 + a6
        cols_lam = (DIM_ALL + lm_base + lane_f)[:, None]
        cols_td = jnp.full((L * F, 1), OFF_TD)

        # mono: [pose_i | pose_j | ex | λ | td]
        cols_mono = jnp.concatenate([
            cols_pi, cols_pj, jnp.broadcast_to(cols_exl, (L * F, 6)),
            cols_lam, cols_td], axis=1)
        # cross: [pose_i | pose_j | ex0 | ex1 | λ | td]
        cols_cross = jnp.concatenate([
            cols_pi, cols_pj, jnp.broadcast_to(cols_exl, (L * F, 6)),
            jnp.broadcast_to(cols_exr, (L * F, 6)), cols_lam, cols_td], axis=1)
        # static: [ex0 | ex1 | λ | td]
        lane_s = jnp.arange(L)
        cols_static = jnp.concatenate([
            jnp.broadcast_to(cols_exl, (L, 6)),
            jnp.broadcast_to(cols_exr, (L, 6)),
            (DIM_ALL + lm_base + lane_s)[:, None],
            jnp.full((L, 1), OFF_TD)], axis=1)
        return [(r_mono, J_mono, cols_mono),
                (r_cross, J_cross, cols_cross),
                (r_static, J_static, cols_static)]

    blocks += book_blocks(book_img, 0, 2, 0)
    blocks += book_blocks(book_evt, 1, 3, L_img)

    # ---------------- marginalization prior --------------------------------
    dx = state_minus(state, prior.lin)
    r_prior = (prior.r0 + prior.J0 @ dx) * prior.valid.astype(dtype)
    J_prior = (prior.J0 * prior.valid.astype(dtype)) if with_jac else None

    return blocks, (r_prior, J_prior), L_img + L_evt


def linearize(state: WindowState, book_img: FeatureBook, book_evt: FeatureBook,
              preints: pre.Preintegrated, imu_valid, prior: Prior, g,
              cauchy_c: float = 1.0, with_jac: bool = True):
    """Build (J, r) of the whole problem.  Masked rows are exactly zero.

    preints: stacked Preintegrated with leading axis 10 (interval k → k+1).
    imu_valid: (10,) bool (sum_dt ≤ 10 s gate, estimator.cpp:1889).
    Returns (J, r, n_landmark_cols). If with_jac=False, J is None (cost eval).
    """
    dtype = state.P.dtype
    blocks, (r_prior, J_prior), L_tot = factor_blocks(
        state, book_img, book_evt, preints, imu_valid, prior, g, cauchy_c,
        with_jac)
    R = sum(b[0].shape[0] * b[0].shape[1] for b in blocks) + DIM_ALL
    C = DIM_ALL + L_tot

    r_all = jnp.zeros((R,), dtype)
    J_all = jnp.zeros((R, C), dtype) if with_jac else None
    base = 0
    for r, J, cols in blocks:
        N, k = r.shape
        rows = base + jnp.arange(N)[:, None] * k + jnp.arange(k)[None, :]
        r_all = r_all.at[rows].set(r)
        if with_jac:
            J_all = _scatter_rows(J_all, rows, cols, J)
        base += N * k

    rows_prior = base + jnp.arange(DIM_ALL)
    r_all = r_all.at[rows_prior].set(r_prior)
    if with_jac:
        J_all = J_all.at[rows_prior[:, None],
                         jnp.arange(DIM_ALL)[None, :]].add(J_prior)
    return J_all, r_all, L_tot


def assemble_normal(state: WindowState, book_img: FeatureBook,
                    book_evt: FeatureBook, preints: pre.Preintegrated,
                    imu_valid, prior: Prior, g, cauchy_c: float = 1.0,
                    via_dense_rows: bool = True):
    """Normal equations (H, b, cost) assembled block-wise: H ← Σ JᵢᵀJᵢ.

    Never materializes the (R, C) Jacobian.  via_dense_rows=True expands each
    factor's rows to a per-block dense (N, a, C) slab with a disjoint-index
    set-scatter and reduces with one MXU matmul per block — TPU scatters of
    (N, k, k) outer products serialize badly, dense matmuls don't.  The
    False path (pure scatter-add of outer products) is kept for CPU."""
    dtype = state.P.dtype
    blocks, (r_prior, J_prior), L_tot = factor_blocks(
        state, book_img, book_evt, preints, imu_valid, prior, g, cauchy_c,
        with_jac=True)
    C = DIM_ALL + L_tot
    H = jnp.zeros((C, C), dtype)
    b = jnp.zeros((C,), dtype)
    cost = jnp.zeros((), dtype)
    for r, J, cols in blocks:
        N, a, k = J.shape
        if via_dense_rows:
            Jd = jnp.zeros((N, a, C), dtype).at[
                jnp.arange(N)[:, None, None],
                jnp.arange(a)[None, :, None],
                cols[:, None, :],
            ].set(J)
            Jr = Jd.reshape(N * a, C)
            H = H + Jr.T @ Jr
            b = b + Jr.T @ r.reshape(N * a)
        else:
            Hi = jnp.einsum("nak,nal->nkl", J, J)
            bi = jnp.einsum("nak,na->nk", J, r)
            H = H.at[cols[:, :, None], cols[:, None, :]].add(Hi)
            b = b.at[cols].add(bi)
        cost += jnp.sum(r * r)
    H = H.at[:DIM_ALL, :DIM_ALL].add(J_prior.T @ J_prior)
    b = b.at[:DIM_ALL].add(J_prior.T @ r_prior)
    cost += jnp.sum(r_prior * r_prior)
    return H, b, cost


def _proj_family_pieces(O, r, J, has_exr: bool):
    """Normal-equation pieces of one (L, F)-grid projection family.

    O: (L, F) one-hot of each lane's start frame; r: (L, F, 2) weighted
    residuals; J: (L, F, 2, k) weighted Jacobians with the fixed column
    layout [pose_i 6 | pose_j 6 | ex_l 6 | (ex_r 6) | λ | td].

    Because every factor's columns are known by construction (pose_i =
    one-hot(start), pose_j = its own grid coordinate, λ = its own lane), the
    JᵀJ reduction decomposes into small dense einsums over the (L·F) factor
    grid — no (N, a, C) slab, no scatter.  Returns a dict of dense blocks.
    """
    F = N_STATES
    dtype = r.dtype
    Jpi = J[..., 0:6]
    Jpj = J[..., 6:12]
    Jexl = J[..., 12:18]
    if has_exr:
        Jexr = J[..., 18:24]
        Jlam = J[..., 24]
        Jtd = J[..., 25]
    else:
        Jexr = None
        Jlam = J[..., 18]
        Jtd = J[..., 19]

    eyeF = jnp.eye(F, dtype=dtype)
    # ---- pose-pose (66×66) -------------------------------------------------
    S_ii = jnp.einsum("lfra,lfrb->lab", Jpi, Jpi)
    T_ii = jnp.einsum("lf,lab->fab", O, S_ii)
    B_ij = jnp.einsum("lfra,lfrb->lfab", Jpi, Jpj)
    U_ij = jnp.einsum("lg,lfab->gafb", O, B_ij)          # rows=start, cols=f
    D_jj = jnp.einsum("lfra,lfrb->fab", Jpj, Jpj)
    Hp = (jnp.einsum("fab,fg->fagb", T_ii + D_jj, eyeF)
          + U_ij + jnp.transpose(U_ij, (2, 3, 0, 1)))

    def pose_cross(Jother):
        """(66, w) pose × (ex | λ | td) block; Jother (L, F, 2[, w])."""
        gi = jnp.einsum("lfra,lfr...->la...", Jpi, Jother)
        gi = jnp.einsum("lf,la...->fa...", O, gi)
        gj = jnp.einsum("lfra,lfr...->fa...", Jpj, Jother)
        g = gi + gj
        return g.reshape((F * 6,) + g.shape[2:])

    def lane_cross(Ja, Jb):
        """(w, L): per-lane reduction of Ja (L,F,2,w) against Jb (L,F,2)."""
        return jnp.einsum("lfra,lfr->al", Ja, Jb)

    pieces = dict(
        Hp=Hp.reshape(F * 6, F * 6),
        Hpel=pose_cross(Jexl),                       # (66, 6)
        Hplam=jnp.einsum("lf,la->fal", O,
                         jnp.einsum("lfra,lfr->la", Jpi, Jlam)).reshape(F * 6, -1)
        + jnp.einsum("lfra,lfr->fal", Jpj, Jlam).reshape(F * 6, -1),  # (66, L)
        Hptd=pose_cross(Jtd),                        # (66,)
        Hll=jnp.einsum("lfra,lfrb->ab", Jexl, Jexl),
        Hellam=lane_cross(Jexl, Jlam),               # (6, L)
        Heltd=jnp.einsum("lfra,lfr->a", Jexl, Jtd),
        Hlamlam=jnp.einsum("lfr,lfr->l", Jlam, Jlam),
        Hlamtd=jnp.einsum("lfr,lfr->l", Jlam, Jtd),
        Htdtd=jnp.sum(Jtd * Jtd),
        bp=pose_cross(r),                            # (66,)
        bel=jnp.einsum("lfra,lfr->a", Jexl, r),
        blam=jnp.einsum("lfr,lfr->l", Jlam, r),
        btd=jnp.sum(Jtd * r),
        cost=jnp.sum(r * r),
    )
    if has_exr:
        pieces.update(
            Hper=pose_cross(Jexr),
            Hlr=jnp.einsum("lfra,lfrb->ab", Jexl, Jexr),
            Hrr=jnp.einsum("lfra,lfrb->ab", Jexr, Jexr),
            Herlam=lane_cross(Jexr, Jlam),
            Hertd=jnp.einsum("lfra,lfr->a", Jexr, Jtd),
            ber=jnp.einsum("lfra,lfr->a", Jexr, r),
        )
    return pieces


def _static_family_pieces(r, J):
    """Pieces of the static-stereo family: r (L, 2), J (L, 2, 14) with
    columns [ex_l 6 | ex_r 6 | λ | td] — no pose involvement."""
    Jexl = J[..., 0:6]
    Jexr = J[..., 6:12]
    Jlam = J[..., 12]
    Jtd = J[..., 13]
    return dict(
        Hll=jnp.einsum("lra,lrb->ab", Jexl, Jexl),
        Hlr=jnp.einsum("lra,lrb->ab", Jexl, Jexr),
        Hrr=jnp.einsum("lra,lrb->ab", Jexr, Jexr),
        Hellam=jnp.einsum("lra,lr->al", Jexl, Jlam),
        Herlam=jnp.einsum("lra,lr->al", Jexr, Jlam),
        Heltd=jnp.einsum("lra,lr->a", Jexl, Jtd),
        Hertd=jnp.einsum("lra,lr->a", Jexr, Jtd),
        Hlamlam=jnp.einsum("lr,lr->l", Jlam, Jlam),
        Hlamtd=jnp.einsum("lr,lr->l", Jlam, Jtd),
        Htdtd=jnp.sum(Jtd * Jtd),
        bel=jnp.einsum("lra,lr->a", Jexl, r),
        ber=jnp.einsum("lra,lr->a", Jexr, r),
        blam=jnp.einsum("lr,lr->l", Jlam, r),
        btd=jnp.sum(Jtd * r),
        cost=jnp.sum(r * r),
    )


def assemble_normal_fast(state: WindowState, book_img: FeatureBook,
                         book_evt: FeatureBook, preints: pre.Preintegrated,
                         imu_valid, prior: Prior, g, cauchy_c: float = 1.0,
                         prior_H=None):
    """Structured normal equations: H, b, cost with no (N, a, C) slabs.

    Exploits the static sparsity of every projection factor (columns are
    pose_i/pose_j/extrinsic/own-λ/td by construction) to reduce JᵀJ into
    small dense blocks written at statically-known offsets — the landmark
    columns of each book are contiguous, so every write is a static slice.
    ~50× fewer FLOPs than `assemble_normal`'s C-wide matmuls and no scatter
    in the hot loop; the 10 IMU factors keep a tiny outer-product scatter.
    Numerically equal to assemble_normal up to summation order
    (tests/test_solver.py oracle check).
    """
    dtype = state.P.dtype
    L_img = book_img.un.shape[0]
    L_evt = book_evt.un.shape[0]
    F = N_STATES
    blocks, (r_prior, J_prior), L_tot = factor_blocks(
        state, book_img, book_evt, preints, imu_valid, prior, g, cauchy_c,
        with_jac=True)
    C = DIM_ALL + L_tot
    H = jnp.zeros((C, C), dtype)
    b = jnp.zeros((C,), dtype)

    # ---- IMU: 10 factors, banded 30×30 outer products ----------------------
    r_imu, J_imu, cols_imu = blocks[0]
    Hi = jnp.einsum("nak,nal->nkl", J_imu, J_imu)
    bi = jnp.einsum("nak,na->nk", J_imu, r_imu)
    H = H.at[cols_imu[:, :, None], cols_imu[:, None, :]].add(Hi)
    b = b.at[cols_imu].add(bi)
    cost = jnp.sum(r_imu * r_imu)

    # ---- projection books --------------------------------------------------
    for (mono, cross, static), book, exl, exr, lm_base, L in (
        (blocks[1:4], book_img, 0, 2, 0, L_img),
        (blocks[4:7], book_evt, 1, 3, L_img, L_evt),
    ):
        start = start_frame(book)
        O = jax.nn.one_hot(start, F, dtype=dtype)
        fam_m = _proj_family_pieces(
            O, mono[0].reshape(L, F, 2), mono[1].reshape(L, F, 2, 20), False)
        fam_c = _proj_family_pieces(
            O, cross[0].reshape(L, F, 2), cross[1].reshape(L, F, 2, 26), True)
        fam_s = _static_family_pieces(static[0], static[1])

        el = OFF_EX + exl * 6
        er = OFF_EX + exr * 6
        l0 = DIM_ALL + lm_base
        lam_idx = l0 + jnp.arange(L)

        def add_sym(H, rs, cs, blk):
            H = jax.lax.dynamic_update_slice(
                H, jax.lax.dynamic_slice(H, (rs, cs), blk.shape) + blk,
                (rs, cs))
            if rs != cs:
                H = jax.lax.dynamic_update_slice(
                    H, jax.lax.dynamic_slice(H, (cs, rs), blk.T.shape) + blk.T,
                    (cs, rs))
            return H

        Hp = fam_m["Hp"] + fam_c["Hp"]
        H = add_sym(H, 0, 0, Hp)
        H = add_sym(H, 0, el, fam_m["Hpel"] + fam_c["Hpel"])
        H = add_sym(H, 0, er, fam_c["Hper"])
        H = add_sym(H, 0, l0, fam_m["Hplam"] + fam_c["Hplam"])
        H = add_sym(H, 0, OFF_TD,
                    (fam_m["Hptd"] + fam_c["Hptd"])[:, None])
        H = add_sym(H, el, el, fam_m["Hll"] + fam_c["Hll"] + fam_s["Hll"])
        H = add_sym(H, el, er, fam_c["Hlr"] + fam_s["Hlr"])
        H = add_sym(H, er, er, fam_c["Hrr"] + fam_s["Hrr"])
        H = add_sym(H, el, l0,
                    fam_m["Hellam"] + fam_c["Hellam"] + fam_s["Hellam"])
        H = add_sym(H, er, l0, fam_c["Herlam"] + fam_s["Herlam"])
        H = add_sym(H, el, OFF_TD,
                    (fam_m["Heltd"] + fam_c["Heltd"] + fam_s["Heltd"])[:, None])
        H = add_sym(H, er, OFF_TD, (fam_c["Hertd"] + fam_s["Hertd"])[:, None])
        H = H.at[lam_idx, lam_idx].add(
            fam_m["Hlamlam"] + fam_c["Hlamlam"] + fam_s["Hlamlam"])
        hlt = fam_m["Hlamtd"] + fam_c["Hlamtd"] + fam_s["Hlamtd"]
        H = H.at[lam_idx, OFF_TD].add(hlt)
        H = H.at[OFF_TD, lam_idx].add(hlt)
        H = H.at[OFF_TD, OFF_TD].add(
            fam_m["Htdtd"] + fam_c["Htdtd"] + fam_s["Htdtd"])

        b = b.at[:66].add(fam_m["bp"] + fam_c["bp"])
        b = b.at[el:el + 6].add(fam_m["bel"] + fam_c["bel"] + fam_s["bel"])
        b = b.at[er:er + 6].add(fam_c["ber"] + fam_s["ber"])
        b = b.at[l0:l0 + L].add(fam_m["blam"] + fam_c["blam"] + fam_s["blam"])
        b = b.at[OFF_TD].add(fam_m["btd"] + fam_c["btd"] + fam_s["btd"])
        cost = cost + fam_m["cost"] + fam_c["cost"] + fam_s["cost"]

    # ---- marginalization prior --------------------------------------------
    # J0ᵀJ0 is constant across LM iterations (the prior linearization point
    # is fixed) — callers in a loop pass it precomputed via prior_H, saving a
    # 190³ matmul per iteration
    if prior_H is None:
        prior_H = J_prior.T @ J_prior
    H = H.at[:DIM_ALL, :DIM_ALL].add(prior_H)
    b = b.at[:DIM_ALL].add(J_prior.T @ r_prior)
    cost = cost + jnp.sum(r_prior * r_prior)
    return H, b, cost


def _imu_onehot(dtype=jnp.float32):
    """(10, 30, DIM_ALL) one-hot column selector of the k-th IMU factor's
    parameter layout [pose_k 6 | sb_k 9 | pose_k+1 6 | sb_k+1 9] — a
    compile-time constant, so the banded IMU JᵀJ becomes two small matmuls
    instead of a 9000-element scatter-add (TPU scatters serialize; under a
    B-way vmap they serialize B times over)."""
    import numpy as np
    E = np.zeros((WINDOW, 30, DIM_ALL), np.float32)
    for k in range(WINDOW):
        cols = (list(range(k * 6, k * 6 + 6))
                + list(range(OFF_SB + k * 9, OFF_SB + k * 9 + 9))
                + list(range((k + 1) * 6, (k + 1) * 6 + 6))
                + list(range(OFF_SB + (k + 1) * 9, OFF_SB + (k + 1) * 9 + 9)))
        E[k, np.arange(30), cols] = 1.0
    return jnp.asarray(E, dtype)


def _proj_factor_table(state: WindowState, book: FeatureBook,
                       exl: int, exr: int, cauchy_c: float):
    """Unified per-book projection-factor table: all mono + cross + static
    factors evaluated by ONE nested-vmapped proj22 Jacobian.

    Rows per lane: M = F (mono) + F (cross) + 1 (static).  The three Ceres
    factor types (projectionTwoFrame{One,Two}CamFactor, OneFrameTwoCam) are
    all the same projection chain:
      * mono  = two-frame-two-cam with ex1 := ex0 (the ∂/∂ex0 and ∂/∂ex1
        blocks then sum to the shared-extrinsic derivative — chain rule);
      * static = two-frame-two-cam with frame j := frame i (the pose
        Jacobians cancel exactly and are zeroed explicitly).
    One evaluation graph instead of six keeps the elementwise chains in a
    few big fusions (the r3 layout cost ~1 ms/iteration in tiny-op dispatch
    and reshape-relayout copies at B=8).

    Returns (r (L,M,2), J (L,M,2,26), jidx (L,M), start (L,)), with Cauchy
    weights and validity masks already folded into r and J, and J's ex1
    block already folded for mono rows.
    """
    dtype = state.P.dtype
    L = book.un.shape[0]
    F = N_STATES
    M = 2 * F + 1
    gate = _book_gate(book)
    start = start_frame(book)
    pt_i, vel_i, td_i = _gather_start(book, start)
    inv_dep = jnp.where(gate & (jnp.abs(book.inv_depth) > 1e-4),
                        book.inv_depth, 1.0)

    j_idx = jnp.arange(F)
    mask_mono = gate[:, None] & book.obs & (j_idx[None, :] != start[:, None])
    mask_cross = gate[:, None] & book.stereo & (j_idx[None, :] != start[:, None])
    mask_static = gate & jnp.take_along_axis(book.stereo, start[:, None], 1)[:, 0]
    mask = jnp.concatenate([mask_mono, mask_cross, mask_static[:, None]], 1)

    # observation-side table (L, M, ...)
    jidx = jnp.concatenate(
        [jnp.broadcast_to(j_idx[None, :], (L, F)),
         jnp.broadcast_to(j_idx[None, :], (L, F)), start[:, None]], axis=1)

    def row_gather(a_l, a_r):           # (L, F, 2) obs arrays → (L, M, 2)
        st_obs = jnp.take_along_axis(
            a_r, jnp.broadcast_to(start[:, None, None], (L, 1, 2)), 1)
        return jnp.concatenate([a_l, a_r, st_obs], axis=1)

    pt_j = row_gather(book.un, book.un_r)
    vel_j = row_gather(book.vel, book.vel_r)
    td_j = jnp.concatenate(
        [book.td_obs, book.td_obs,
         jnp.take_along_axis(book.td_obs, start[:, None], 1)], axis=1)

    # pose/extrinsic-side table.  jidx is structured (arange, arange,
    # start), so frame-j states come from broadcasts + the L-sized start
    # gather — an (L, M)-sized gather costs ~0.4 ms/iteration at B=8 on TPU.
    P_st, Q_st = state.P[start], state.Q[start]
    Pi = jnp.broadcast_to(P_st[:, None], (L, M, 3))
    Qi = jnp.broadcast_to(Q_st[:, None], (L, M, 4))

    def j_table(allf, st_val):
        grid = jnp.broadcast_to(allf[None, :], (L, F) + allf.shape[1:])
        return jnp.concatenate([grid, grid, st_val[:, None]], axis=1)

    Pj = j_table(state.P, P_st)
    Qj = j_table(state.Q, Q_st)
    is_mono = jnp.arange(M) < F
    is_static = jnp.arange(M) == 2 * F
    ex1_idx = jnp.where(is_mono, exl, exr)       # (M,)
    ex_p0 = jnp.broadcast_to(state.ex_p[exl], (L, M, 3))
    ex_q0 = jnp.broadcast_to(state.ex_q[exl], (L, M, 4))
    ex_p1 = jnp.broadcast_to(state.ex_p[ex1_idx][None], (L, M, 3))
    ex_q1 = jnp.broadcast_to(state.ex_q[ex1_idx][None], (L, M, 4))

    lam = jnp.broadcast_to(inv_dep[:, None], (L, M))
    pti = jnp.broadcast_to(pt_i[:, None], (L, M, 2))
    vli = jnp.broadcast_to(vel_i[:, None], (L, M, 2))
    tdi = jnp.broadcast_to(td_i[:, None], (L, M))

    r, J = jax.vmap(jax.vmap(
        lambda *a: factors.proj22_jac(*a)
    ))(Pi, Qi, Pj, Qj, ex_p0, ex_q0, ex_p1, ex_q1, lam,
       jnp.broadcast_to(state.td, (L, M)), pti, vli, tdi, pt_j, vel_j, td_j)

    # Cauchy IRLS weights on the weighted residual (Ceres loss semantics)
    w = factors.cauchy_weight(jnp.sum(r * r, -1), cauchy_c) \
        * mask.astype(dtype)
    r = r * w[..., None]
    J = J * w[..., None, None]

    # mono: fold ∂/∂ex1 into ∂/∂ex0 (shared extrinsic); static: pose blocks
    # cancel exactly — zero them so the expansion stays bit-exact
    m = is_mono.astype(dtype)[None, :, None, None]
    s = is_static.astype(dtype)[None, :, None, None]
    J = jnp.concatenate([
        J[..., 0:12] * (1.0 - s),
        J[..., 12:18] + m * J[..., 18:24],
        J[..., 18:24] * (1.0 - m),
        J[..., 24:26]], axis=-1)
    return r, J, jidx, start


def assemble_normal_reduced(state: WindowState, book_img: FeatureBook,
                            book_evt: FeatureBook, preints: pre.Preintegrated,
                            imu_valid, prior: Prior, g,
                            cauchy_c: float = 1.0, prior_H=None,
                            imu_sqrt=None):
    """Normal equations in Schur-ready form: (Hpp, Hpl, hll, bp, bl, cost).

    Same math as `assemble_normal_fast` (oracle-tested equal) but emits the
    camera system Hpp (DIM_ALL²), the camera-landmark coupling Hpl
    (DIM_ALL × L), the diagonal landmark block hll (L,) and the gradient —
    never materializing the (C, C) Hessian.  Every block lands at a
    statically-known offset, so the whole matrix is built with `jnp.block`
    concatenations + 2 matmuls: zero scatters, zero read-modify-write
    dynamic-slice chains.  That is what makes a B-way vmapped LM iteration
    cost ~B× less than B sequential ones (VERDICT r3 #1): the r3 assembly's
    ~40-op `add_sym` chain and IMU scatter serialized under vmap.
    """
    dtype = state.P.dtype
    L_img = book_img.un.shape[0]
    L_evt = book_evt.un.shape[0]
    L_tot = L_img + L_evt
    F = N_STATES

    # ---- IMU factors (banded JᵀJ via constant one-hot matmuls) ------------
    if imu_sqrt is None:
        imu_sqrt = factors.imu_sqrt_info(preints.covariance)
    Pi_, Pj_ = state.P[:-1], state.P[1:]
    Qi_, Qj_ = state.Q[:-1], state.Q[1:]
    Vi_, Vj_ = state.V[:-1], state.V[1:]
    Bai_, Baj_ = state.Ba[:-1], state.Ba[1:]
    Bgi_, Bgj_ = state.Bg[:-1], state.Bg[1:]
    r_imu, J_imu = jax.vmap(
        lambda *a: factors.imu_residual_jac(*a[:-1], g, a[-1])
    )(Pi_, Qi_, Vi_, Bai_, Bgi_, Pj_, Qj_, Vj_, Baj_, Bgj_, preints, imu_sqrt)
    mw = imu_valid[:, None].astype(dtype)
    r_imu = r_imu * mw
    J_imu = J_imu * mw[:, :, None]
    E = _imu_onehot(dtype)                            # (10, 30, 190)
    Hi = jnp.einsum("nak,nal->nkl", J_imu, J_imu)     # (10, 30, 30)
    H_imu = jnp.einsum("nka,nkl,nlb->ab", E, Hi, E)
    b_imu = jnp.einsum("nka,nk->a", E,
                       jnp.einsum("nak,na->nk", J_imu, r_imu))
    cost = jnp.sum(r_imu * r_imu)

    # ---- projection factors: one unified table across both books ----------
    # (img book rides ex slots (0, 2), event book (1, 3) — estimator.cpp
    # para_Ex_Pose ordering); lanes concatenate so landmark columns are
    # globally [img | evt] as everywhere else in the solver.
    ri, Ji, jidx_i, st_i = _proj_factor_table(state, book_img, 0, 2, cauchy_c)
    re_, Je, jidx_e, st_e = _proj_factor_table(state, book_evt, 1, 3, cauchy_c)
    M = 2 * F + 1
    r_all = jnp.concatenate([ri, re_], 0)             # (Lt, M, 2)
    J_all = jnp.concatenate([Ji, Je], 0)              # (Lt, M, 2, 26)
    jidx = jnp.concatenate([jidx_i, jidx_e], 0)       # (Lt, M)
    start_all = jnp.concatenate([st_i, st_e], 0)      # (Lt,)

    # expansion to dense [pose 66 | ex 24 | td 1] = 91 columns via one-hots
    Oi = jax.nn.one_hot(start_all, F, dtype=dtype)    # (Lt, 11)
    Oj = jax.nn.one_hot(jidx, F, dtype=dtype)         # (Lt, M, 11)
    is_mono = (jnp.arange(M) < F)
    exl_slot = jnp.concatenate([jnp.zeros(L_img, jnp.int32),
                                jnp.ones(L_evt, jnp.int32)])        # 0 | 1
    exr_slot = exl_slot + 2                                         # 2 | 3
    Oex0 = jax.nn.one_hot(exl_slot, N_EX, dtype=dtype)              # (Lt, 4)
    Oex1 = jax.nn.one_hot(
        jnp.where(is_mono[None, :], exl_slot[:, None], exr_slot[:, None]),
        N_EX, dtype=dtype)                                          # (Lt, M, 4)

    Jpose = (jnp.einsum("li,lmra->lmria", Oi, J_all[..., 0:6])
             .reshape(L_tot, M, 2, 66)
             + jnp.einsum("lmi,lmra->lmria", Oj, J_all[..., 6:12])
             .reshape(L_tot, M, 2, 66))
    Jex = (jnp.einsum("le,lmra->lmrea", Oex0, J_all[..., 12:18])
           .reshape(L_tot, M, 2, 24)
           + jnp.einsum("lme,lmra->lmrea", Oex1, J_all[..., 18:24])
           .reshape(L_tot, M, 2, 24))
    Jd = jnp.concatenate([Jpose, Jex, J_all[..., 25:26]], axis=-1)  # 91 cols
    Jlam = J_all[..., 24]                              # (Lt, M, 2)

    # one MXU matmul for the camera-camera block; small einsums for the rest
    Jx = Jd.reshape(-1, 91)
    H91 = Jx.T @ Jx
    b91 = Jx.T @ r_all.reshape(-1)
    Hlam91 = jnp.einsum("lmra,lmr->al", Jd, Jlam)      # (91, Lt)
    hll = jnp.einsum("lmr,lmr->l", Jlam, Jlam)
    bl = jnp.einsum("lmr,lmr->l", Jlam, r_all)
    cost = cost + jnp.sum(r_all * r_all)

    # ---- place the 91-wide system into the DIM_ALL layout -----------------
    # (pose → 0, ex → OFF_EX, td → OFF_TD; the 99 speed-bias columns between
    # are IMU/prior-only).  Zero-pad embeds fuse into one add kernel.
    def emb(blk, r0, c0, rows=DIM_ALL, colsN=DIM_ALL):
        return jnp.pad(blk, ((r0, rows - r0 - blk.shape[0]),
                             (c0, colsN - c0 - blk.shape[1])))

    def emb1(v, o, n=DIM_ALL):
        return jnp.pad(v, (o, n - o - v.shape[0]))

    secs = ((0, 0, 66), (66, OFF_EX, 24), (90, OFF_TD, 1))
    J0w = prior.J0 * prior.valid.astype(dtype)
    if prior_H is None:
        prior_H = J0w.T @ J0w
    r_prior = (prior.r0 + prior.J0 @ state_minus(state, prior.lin)) \
        * prior.valid.astype(dtype)

    Hpp = H_imu + prior_H + sum(
        emb(H91[a:a + n, b:b + m], ra, rb)
        for (a, ra, n) in secs for (b, rb, m) in secs)
    Hpl = sum(emb(Hlam91[a:a + n, :], ra, 0, colsN=L_tot)
              for (a, ra, n) in secs)
    bp = (b_imu + J0w.T @ r_prior
          + sum(emb1(b91[a:a + n], ra) for (a, ra, n) in secs))
    cost = cost + jnp.sum(r_prior * r_prior)
    return Hpp, Hpl, hll, bp, bl, cost


def problem_cost(state: WindowState, book_img: FeatureBook,
                 book_evt: FeatureBook, preints: pre.Preintegrated,
                 imu_valid, prior: Prior, g, cauchy_c: float = 1.0):
    """0.5·Σ r² without building any Jacobian or scatter buffers."""
    blocks, (r_prior, _), _ = factor_blocks(
        state, book_img, book_evt, preints, imu_valid, prior, g, cauchy_c,
        with_jac=False)
    cost = jnp.sum(r_prior * r_prior)
    for r, _, _ in blocks:
        cost += jnp.sum(r * r)
    return 0.5 * cost


def reduced_solve(Hr, br, lam_damp, method: str = "chol"):
    """Solve (Hr + λI) dx = −br on the Jacobi-scaled reduced camera system.

    method="chol": LM-damped Cholesky.  Before the first marginalization
    prior exists Hr has a ≤4-dim gauge null space (yaw + global position),
    but the gradient has no component there, so λI pins those directions at
    ~0 while biasing observable directions by only ~λ (diag ≈ 1 after Jacobi
    scaling).  A failed factorization yields non-finite dx — the caller's LM
    accept test then rejects the step and retries with λ×100 (self-healing).
    method="eigh": truncated eigendecomposition killing the null space
    exactly (the reference's marginalization-style pseudo-inverse,
    marginalization_factor.cpp:188-216); markedly slower on TPU, kept for
    validation.
    Returns (dx, finite) where finite is a () bool (always True for eigh).
    """
    dtype = Hr.dtype
    if method == "eigh":
        w, V = jnp.linalg.eigh(Hr)
        w_max = jnp.maximum(w[-1], 1e-12)
        keep = w > w_max * 1e-10
        w_inv = jnp.where(keep, 1.0 / (jnp.where(keep, w, 1.0) + lam_damp), 0.0)
        dx = -(V * w_inv[None, :]) @ (V.T @ br)
        return dx, jnp.asarray(True)
    n = Hr.shape[0]
    if dtype == jnp.float32 and n == DIM_ALL:
        from esvio_tpu.solver import chol_pallas
        impl = chol_pallas._impl()
        if impl in ("pallas", "interpret"):
            # fused VMEM Cholesky+solve kernel (batch-aware under vmap) —
            # hardware-parity-tested, tests/test_chol_pallas.py
            dx = -chol_pallas.chol_solve(Hr, br,
                                         jnp.asarray(lam_damp, dtype))
            finite = jnp.all(jnp.isfinite(dx))
            return jnp.where(finite, dx, 0.0), finite
    L = jnp.linalg.cholesky(Hr + lam_damp * jnp.eye(n, dtype=dtype))
    y = jax.scipy.linalg.solve_triangular(L, br, lower=True)
    dx = -jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    finite = jnp.all(jnp.isfinite(dx))
    return jnp.where(finite, dx, 0.0), finite


def damping_schedule(dtype):
    """(λ₀, λ_floor) for the scaled reduced system: f32 needs enough damping
    to keep Cholesky of the (near-singular before the first prior) system
    positive definite under ~1e-6 round-off; f64 can go much lower."""
    if dtype == jnp.float64:
        return 1e-8, 1e-12
    return 1e-4, 3e-6


def _merge_books_depth(book_img, book_evt, d_lam, L_img):
    new_img = dataclasses.replace(
        book_img, inv_depth=book_img.inv_depth + d_lam[:L_img])
    new_evt = dataclasses.replace(
        book_evt, inv_depth=book_evt.inv_depth + d_lam[L_img:])
    return new_img, new_evt


@functools.partial(jax.jit, static_argnames=("iters", "cauchy_c", "method"))
def solve_window(state: WindowState, book_img: FeatureBook, book_evt: FeatureBook,
                 preints: pre.Preintegrated, imu_valid, prior: Prior, g,
                 iters: int = 8, cauchy_c: float = 1.0, frozen=None,
                 method: str = "chol"):
    """Run LM on the sliding window.  Returns (state', book_img', book_evt').

    frozen: optional (DIM_ALL,) bool — parameter rows held constant, the
    analog of Ceres SetParameterBlockConstant (reference freezes extrinsics
    when estimate_extrinsic == 0 / first 30 frames for the right camera,
    estimator.cpp:1848-1884, and td when estimate_td == 0).
    method: reduced-system solve, "chol" (fast) or "eigh" (see reduced_solve)."""
    dtype = state.P.dtype
    L_img = book_img.un.shape[0]
    J0w = prior.J0 * prior.valid.astype(dtype)
    prior_H0 = J0w.T @ J0w            # constant across iterations
    imu_sqrt0 = factors.imu_sqrt_info(preints.covariance)   # hoisted

    def assemble(st, bi, be):
        return assemble_normal_reduced(
            st, bi, be, preints, imu_valid, prior, g, cauchy_c,
            prior_H=prior_H0, imu_sqrt=imu_sqrt0)

    # Deferred-acceptance LM: the normal equations at the CURRENT accepted
    # state ride in the scan carry; each iteration proposes a step from them
    # and runs exactly ONE assembly (at the proposed state), whose cost IS
    # the accept test and whose system becomes the next carry on acceptance.
    # Identical accept decisions and iterates to the classic
    # assemble-then-re-evaluate loop, minus the per-iteration residual pass
    # (VERDICT r2 #3: fold the accept-test cost into the next assembly).
    sys0 = assemble(state, book_img, book_evt)

    def step(carry, _):
        st, bi, be, (Hpp_r, Hpl_r, hll_r, bp_r, bl_r, cost2), lam_damp = carry

        # Jacobi column scaling (Ceres-style): the raw system mixes bias-walk
        # weights (~1e5) with vision (~3e2) — cond(H) up to 1e40.  Scaling
        # columns to unit norm makes the reduced system solvable even in f32.
        col_norm = jnp.sqrt(jnp.concatenate([jnp.diagonal(Hpp_r), hll_r]))
        active_col = col_norm > 1e-10
        if frozen is not None:
            # zeroing the scale of a frozen column removes it from the system
            # (its delta comes out exactly 0) without changing any shapes
            active_col = active_col & ~jnp.pad(frozen,
                                               (0, hll_r.shape[0]))
        d_inv = jnp.where(active_col, 1.0 / jnp.where(active_col, col_norm, 1.0), 0.0)
        dp_i = d_inv[:DIM_ALL]
        dl_i = d_inv[DIM_ALL:]
        Hpp = Hpp_r * dp_i[None, :] * dp_i[:, None]
        Hpl = Hpl_r * dp_i[:, None] * dl_i[None, :]
        hll = hll_r * dl_i * dl_i                # ≈ 1 for active landmarks
        bp = bp_r * dp_i
        bl = bl_r * dl_i

        active_lm = hll > 0.5
        inv_hll = jnp.where(active_lm, 1.0 / jnp.where(active_lm, hll, 1.0), 0.0)

        Hr = Hpp - (Hpl * inv_hll[None, :]) @ Hpl.T
        br = bp - Hpl @ (bl * inv_hll)

        dxp_s, finite = reduced_solve(Hr, br, lam_damp, method)
        dlam_s = -(bl + Hpl.T @ dxp_s) * inv_hll * finite.astype(dtype)
        dxp = dxp_s * dp_i
        dlam = dlam_s * dl_i

        st_new = apply_delta(st, dxp)
        bi_new, be_new = _merge_books_depth(bi, be, dlam, L_img)

        sys_new = assemble(st_new, bi_new, be_new)
        cost_new = sys_new[5]
        accept = 0.5 * cost_new < 0.5 * cost2
        sel = lambda a, b_: jnp.where(accept, b_, a)
        st = jax.tree_util.tree_map(sel, st, st_new)
        bi = jax.tree_util.tree_map(sel, bi, bi_new)
        be = jax.tree_util.tree_map(sel, be, be_new)
        sys_acc = tuple(jnp.where(accept, n, o) for o, n in
                        zip((Hpp_r, Hpl_r, hll_r, bp_r, bl_r, cost2), sys_new))
        lam_damp = jnp.where(accept, jnp.maximum(lam_damp / 10.0, lam_floor),
                             jnp.minimum(lam_damp * 100.0, 1e4))
        return (st, bi, be, sys_acc, lam_damp), 0.5 * cost_new

    lam0, lam_floor = damping_schedule(dtype)
    init = (state, book_img, book_evt, sys0, jnp.asarray(lam0, dtype))
    (state, book_img, book_evt, *_), costs = jax.lax.scan(
        step, init, None, length=iters)
    return state, book_img, book_evt, costs


# --------------------------------------------------------------------------
# In-window fast relocalization (VERDICT r3 #7)
# --------------------------------------------------------------------------

DIM_RELO = DIM_ALL + 6      # window params + the relo pose block


def _relo_family(state: WindowState, book: FeatureBook, exl: int,
                 relo_P, relo_Q, relo_obs, relo_lane, relo_valid,
                 cauchy_c: float):
    """Relo projection rows: window landmark (lane) reprojected into the old
    keyframe at the relo pose — the reference's extra ProjectionFactor rows
    with relo_Pose as the j-side parameter block
    (estimator.cpp:1988-2022).  Robust (Cauchy) like the window rows, so
    outlier matches are down-weighted instead of dragging the joint solve.

    relo_obs: (Lr, 2) normalized obs in the old KF; relo_lane: (Lr,) lane
    index into `book` (-1 = empty slot); relo_valid: (Lr,) bool.
    Returns (r (Lr, 2), Jd (Lr, 2, DIM_RELO), Jlam (Lr, 2), lane (Lr,)).
    """
    dtype = state.P.dtype
    L = book.un.shape[0]
    Lr = relo_lane.shape[0]
    gate_book = _book_gate(book)
    start_all = start_frame(book)
    lane = jnp.clip(relo_lane, 0, L - 1)
    gate = gate_book[lane] & relo_valid & (relo_lane >= 0)
    start = start_all[lane]
    pt_i_all, vel_i_all, td_i_all = _gather_start(book, start_all)
    pt_i, vel_i, td_i = pt_i_all[lane], vel_i_all[lane], td_i_all[lane]
    inv_all = jnp.where(gate_book & (jnp.abs(book.inv_depth) > 1e-4),
                        book.inv_depth, 1.0)
    lam = inv_all[lane]

    Pi, Qi = state.P[start], state.Q[start]
    exp_ = jnp.broadcast_to(state.ex_p[exl], (Lr, 3))
    exq_ = jnp.broadcast_to(state.ex_q[exl], (Lr, 4))
    rP = jnp.broadcast_to(relo_P, (Lr, 3))
    rQ = jnp.broadcast_to(relo_Q, (Lr, 4))
    zero_vel = jnp.zeros_like(relo_obs)

    # plain ProjectionFactor semantics: vel_j = 0, td_j = td_i ⇒ the old-KF
    # observation is not td-compensated (projection_factor.cpp has no td)
    r, J = jax.vmap(factors.proj22_jac)(
        Pi, Qi, rP, rQ, exp_, exq_, exp_, exq_, lam,
        jnp.broadcast_to(state.td, (Lr,)), pt_i, vel_i, td_i,
        relo_obs, zero_vel, td_i)

    w = factors.cauchy_weight(jnp.sum(r * r, -1), cauchy_c) \
        * gate.astype(dtype)
    r = r * w[:, None]
    J = J * w[:, None, None]

    # dense extended-layout expansion [pose 66 | sb 99 | ex 24 | td | relo 6]
    Oi = jax.nn.one_hot(start, N_STATES, dtype=dtype)
    Jpi = jnp.einsum("li,lra->lria", Oi, J[..., 0:6]).reshape(Lr, 2, 66)
    Jex6 = J[..., 12:18] + J[..., 18:24]          # shared extrinsic (i = j cam)
    Jex = jnp.pad(Jex6, ((0, 0), (0, 0), (exl * 6, 24 - exl * 6 - 6)))
    Jd = jnp.concatenate([
        Jpi, jnp.zeros((Lr, 2, OFF_EX - OFF_SB), dtype), Jex,
        J[..., 25:26], J[..., 6:12]], axis=-1)     # (Lr, 2, DIM_RELO)
    return r, Jd, J[..., 24], lane


def relo_residuals(state: WindowState, book: FeatureBook, exl: int,
                   relo_P, relo_Q, relo_obs, relo_lane, relo_valid):
    """Unweighted relo reprojection residuals (for inlier gating)."""
    r, _, _, _ = _relo_family(state, book, exl, relo_P, relo_Q, relo_obs,
                              relo_lane, relo_valid, cauchy_c=1e9)
    return r


@functools.partial(jax.jit, static_argnames=("iters", "cauchy_c", "method",
                                             "relo_book"))
def solve_window_relo(state: WindowState, book_img: FeatureBook,
                      book_evt: FeatureBook, preints: pre.Preintegrated,
                      imu_valid, prior: Prior, g,
                      relo_P, relo_Q, relo_obs, relo_lane, relo_valid,
                      relo_book: str = "evt", iters: int = 8,
                      cauchy_c: float = 1.0, frozen=None,
                      method: str = "chol"):
    """solve_window + the in-window relo pose block (estimator.cpp:1988-2022):
    the old keyframe's pose is a 7th..(+6-dim) parameter block jointly
    refined against IMU + vision + the robust relo rows.  Returns
    (state', book_img', book_evt', costs, relo_P', relo_Q')."""
    dtype = state.P.dtype
    L_img = book_img.un.shape[0]
    L_evt = book_evt.un.shape[0]
    L_tot = L_img + L_evt
    exl = 0 if relo_book == "img" else 1
    lm_base = 0 if relo_book == "img" else L_img
    J0w = prior.J0 * prior.valid.astype(dtype)
    prior_H0 = J0w.T @ J0w
    imu_sqrt0 = factors.imu_sqrt_info(preints.covariance)

    def assemble(st, bi, be, rP, rQ):
        Hpp, Hpl, hll, bp, bl, cost = assemble_normal_reduced(
            st, bi, be, preints, imu_valid, prior, g, cauchy_c,
            prior_H=prior_H0, imu_sqrt=imu_sqrt0)
        book = bi if relo_book == "img" else be
        r, Jd, Jlam, lane = _relo_family(
            st, book, exl, rP, rQ, relo_obs, relo_lane, relo_valid, cauchy_c)
        Jx = Jd.reshape(-1, DIM_RELO)
        HppX = jnp.pad(Hpp, ((0, 6), (0, 6))) + Jx.T @ Jx
        bpX = jnp.pad(bp, (0, 6)) + Jx.T @ r.reshape(-1)
        # λ couplings of the relo rows (scatter-add on ≤Lr unique lanes)
        Hcl = jnp.einsum("lra,lr->la", Jd, Jlam)          # (Lr, DIM_RELO)
        HplX = jnp.pad(Hpl, ((0, 6), (0, 0))).at[:, lm_base + lane].add(Hcl.T)
        hllX = hll.at[lm_base + lane].add(jnp.einsum("lr,lr->l", Jlam, Jlam))
        blX = bl.at[lm_base + lane].add(jnp.einsum("lr,lr->l", Jlam, r))
        cost = cost + jnp.sum(r * r)
        return HppX, HplX, hllX, bpX, blX, cost

    sys0 = assemble(state, book_img, book_evt, relo_P, relo_Q)

    def step(carry, _):
        st, bi, be, rP, rQ, (Hpp_r, Hpl_r, hll_r, bp_r, bl_r, cost2), \
            lam_damp = carry
        col_norm = jnp.sqrt(jnp.concatenate([jnp.diagonal(Hpp_r), hll_r]))
        active_col = col_norm > 1e-10
        if frozen is not None:
            frozen_x = jnp.pad(frozen, (0, 6 + hll_r.shape[0]))
            active_col = active_col & ~frozen_x
        d_inv = jnp.where(active_col,
                          1.0 / jnp.where(active_col, col_norm, 1.0), 0.0)
        dp_i = d_inv[:DIM_RELO]
        dl_i = d_inv[DIM_RELO:]
        Hpp = Hpp_r * dp_i[None, :] * dp_i[:, None]
        Hpl = Hpl_r * dp_i[:, None] * dl_i[None, :]
        hll = hll_r * dl_i * dl_i
        bp = bp_r * dp_i
        bl = bl_r * dl_i
        active_lm = hll > 0.5
        inv_hll = jnp.where(active_lm,
                            1.0 / jnp.where(active_lm, hll, 1.0), 0.0)
        Hr = Hpp - (Hpl * inv_hll[None, :]) @ Hpl.T
        br = bp - Hpl @ (bl * inv_hll)
        dxp_s, finite = reduced_solve(Hr, br, lam_damp, method)
        dlam_s = -(bl + Hpl.T @ dxp_s) * inv_hll * finite.astype(dtype)
        dxp = dxp_s * dp_i
        dlam = dlam_s * dl_i

        st_new = apply_delta(st, dxp[:DIM_ALL])
        from esvio_tpu.core import lie
        rP_new = rP + dxp[DIM_ALL:DIM_ALL + 3]
        rQ_new = lie.quat_normalize(lie.quat_mul(
            rQ, lie.delta_q(dxp[DIM_ALL + 3:DIM_ALL + 6])))
        bi_new, be_new = _merge_books_depth(bi, be, dlam, L_img)

        sys_new = assemble(st_new, bi_new, be_new, rP_new, rQ_new)
        cost_new = sys_new[5]
        accept = 0.5 * cost_new < 0.5 * cost2
        sel = lambda a, b_: jnp.where(accept, b_, a)
        st = jax.tree_util.tree_map(sel, st, st_new)
        bi = jax.tree_util.tree_map(sel, bi, bi_new)
        be = jax.tree_util.tree_map(sel, be, be_new)
        rP = jnp.where(accept, rP_new, rP)
        rQ = jnp.where(accept, rQ_new, rQ)
        sys_acc = tuple(jnp.where(accept, n, o) for o, n in
                        zip((Hpp_r, Hpl_r, hll_r, bp_r, bl_r, cost2), sys_new))
        lam_damp = jnp.where(accept, jnp.maximum(lam_damp / 10.0, lam_floor),
                             jnp.minimum(lam_damp * 100.0, 1e4))
        return (st, bi, be, rP, rQ, sys_acc, lam_damp), 0.5 * cost_new

    lam0, lam_floor = damping_schedule(dtype)
    init = (state, book_img, book_evt, jnp.asarray(relo_P, dtype),
            jnp.asarray(relo_Q, dtype), sys0, jnp.asarray(lam0, dtype))
    (state, book_img, book_evt, relo_P, relo_Q, *_), costs = jax.lax.scan(
        step, init, None, length=iters)
    return state, book_img, book_evt, costs, relo_P, relo_Q
