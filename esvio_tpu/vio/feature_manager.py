"""Feature book maintenance: insertion, parallax keyframe test, triangulation,
window-slide shifts — pure functions on `FeatureBook` pytrees.

Re-designs the reference FeatureManager
(/root/reference/esvio_estimator/src/feature_manager.cpp): the per-id C++
lists become capacity+mask lanes; every operation below cites the member it
replaces.  All functions are jit-friendly (static shapes, no data-dependent
python control flow).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from esvio_tpu.core import lie
from esvio_tpu.solver.window import (
    FOCAL, N_STATES, WINDOW, FeatureBook, WindowState, start_frame, used_num,
)

INIT_DEPTH = -1.0   # parameters.cpp (INIT_DEPTH): invalid-depth sentinel


# ---------------------------------------------------------------------------
# observation insertion (stereo_addFeatureCheckParallax :314-425)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("frame_idx",))
def insert_packet(book: FeatureBook, ids, valid, un, vel, right_valid, un_r,
                  vel_r, td, frame_idx: int):
    """Insert one tracker packet into window slot `frame_idx`.

    Features with known ids update their lane; new ids allocate free lanes
    (oldest-free-first).  Returns (book, n_tracked, n_dropped): n_tracked
    counts features that extended an existing lane (reference
    last_track_num); n_dropped counts NEW features silently dropped because
    every lane was occupied (size the book capacity so this stays 0).
    """
    L = book.ids.shape[0]
    P = ids.shape[0]

    # match packet ids against lanes
    eq = (book.ids[:, None] == ids[None, :]) & book.active[:, None] & valid[None, :]
    lane_of = jnp.argmax(eq, axis=0)                   # (P,) candidate lane
    matched = jnp.any(eq, axis=0)                      # (P,)
    n_tracked = jnp.sum(matched & valid)

    # allocate free lanes for unmatched features
    free = ~book.active
    free_order = jnp.argsort(~free, stable=True)       # free lanes first
    need = (~matched) & valid
    alloc_rank = jnp.cumsum(need.astype(jnp.int32)) - 1
    n_free = jnp.sum(free)
    can_alloc = need & (alloc_rank < n_free)
    alloc_lane = free_order[jnp.clip(alloc_rank, 0, L - 1)]

    lane = jnp.where(matched, lane_of, alloc_lane)
    write = (matched | can_alloc) & valid
    # non-written entries scatter OUT OF BOUNDS and are dropped — routing
    # them to a real lane would create duplicate-index write races
    lane_safe = jnp.where(write, lane, L)

    def upd(arr, valnew):
        return arr.at[lane_safe, frame_idx].set(valnew, mode="drop")

    stereo_new = jnp.where(right_valid, True,
                           book.stereo.at[jnp.clip(lane_safe, 0, L - 1),
                                          frame_idx].get())
    book = dataclasses.replace(
        book,
        un=upd(book.un, un), vel=upd(book.vel, vel),
        un_r=upd(book.un_r, un_r), vel_r=upd(book.vel_r, vel_r),
        obs=book.obs.at[lane_safe, frame_idx].set(True, mode="drop"),
        stereo=book.stereo.at[lane_safe, frame_idx].set(
            stereo_new, mode="drop"),
        td_obs=book.td_obs.at[lane_safe, frame_idx].set(td, mode="drop"),
        ids=book.ids.at[lane_safe].set(ids, mode="drop"),
        active=book.active.at[lane_safe].set(True, mode="drop"),
        inv_depth=book.inv_depth.at[lane_safe].set(
            jnp.where(matched, book.inv_depth[jnp.clip(lane_safe, 0, L - 1)],
                      0.0), mode="drop"),
        depth_valid=book.depth_valid.at[lane_safe].set(
            jnp.where(matched,
                      book.depth_valid[jnp.clip(lane_safe, 0, L - 1)], False),
            mode="drop"),
    )
    return book, n_tracked, jnp.sum(need & ~can_alloc)


@functools.partial(jax.jit, static_argnames=("frame_count",))
def mean_parallax(book: FeatureBook, frame_count: int):
    """Average parallax between frames fc-2 and fc-1 over long tracks.

    compensatedParallax2 (:1103-1171) with the identity compensation the
    reference actually uses.  Returns (parallax_mean, parallax_num).
    """
    if frame_count < 2:
        return jnp.asarray(0.0, book.un.dtype), jnp.asarray(0, jnp.int32)
    i, j = frame_count - 2, frame_count - 1
    s = start_frame(book)
    ok = book.active & book.obs[:, i] & book.obs[:, j] & (s <= i)
    du = book.un[:, i, 0] - book.un[:, j, 0]
    dv = book.un[:, i, 1] - book.un[:, j, 1]
    par = jnp.sqrt(du * du + dv * dv)
    num = jnp.sum(ok)
    mean = jnp.sum(jnp.where(ok, par, 0.0)) / jnp.maximum(num, 1)
    return mean, num


# ---------------------------------------------------------------------------
# triangulation (:5-121 getDepth, :809-948)
# ---------------------------------------------------------------------------

def _dlt_two_view(pose0, pose1, p0, p1):
    """4-row DLT (triangulatePoint :775-791). pose: (3,4) projection."""
    A = jnp.stack([
        p0[0] * pose0[2] - pose0[0],
        p0[1] * pose0[2] - pose0[1],
        p1[0] * pose1[2] - pose1[0],
        p1[1] * pose1[2] - pose1[1],
    ])
    _, _, vt = jnp.linalg.svd(A)
    v = vt[-1]
    return v[:3] / v[3]


@functools.partial(jax.jit, static_argnames=("stereo_correction",))
def triangulate_stereo_instant(book: FeatureBook, Rrl, Trl,
                               stereo_correction: bool = False):
    """Per-feature instant stereo depth at the start frame with the reference
    gates (getDepth :5-121): disparity sign, depth ∈ (1, 7) m, right depth > 1,
    reprojection error ≤ 2/FOCAL on both views.

    `stereo_correction=True` adds the reference's g_use_stereo_correction
    branch (:65-121): one first-order Sampson step moves the matched pair
    onto the epipolar manifold before re-triangulating; the corrected depth
    is used only where it reduces BOTH reprojection errors.
    """
    dtype = book.un.dtype
    s = start_frame(book)
    L = book.un.shape[0]
    has_stereo0 = jnp.take_along_axis(book.stereo, s[:, None], 1)[:, 0]
    p0 = jnp.take_along_axis(book.un, s[:, None, None].repeat(2, 2), 1)[:, 0]
    p1 = jnp.take_along_axis(book.un_r, s[:, None, None].repeat(2, 2), 1)[:, 0]

    pose0 = jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype)], 1)
    pose1 = jnp.concatenate([Rrl.astype(dtype), Trl.astype(dtype)[:, None]], 1)

    def tri_and_errs(pa, pb):
        pt3 = jax.vmap(lambda a, b: _dlt_two_view(pose0, pose1, a, b))(pa, pb)
        depth = pt3[:, 2]
        proj0 = pt3[:, :2] / jnp.where(jnp.abs(depth) > 1e-9, depth,
                                       1e-9)[:, None]
        pt_r = pt3 @ Rrl.T + Trl
        zr = pt_r[:, 2]
        proj1 = pt_r[:, :2] / jnp.where(jnp.abs(zr) > 1e-9, zr, 1e-9)[:, None]
        err0 = jnp.linalg.norm(proj0 - pa, axis=-1)
        err1 = jnp.linalg.norm(proj1 - pb, axis=-1)
        return depth, zr, err0, err1

    depth, zr, err0, err1 = tri_and_errs(p0, p1)
    good = (
        has_stereo0 & book.active & (p0[:, 0] >= p1[:, 0])
        & (depth > 1.0) & (depth < 7.0) & (zr > 1.0)
        & (err0 <= 2.0 / FOCAL) & (err1 <= 2.0 / FOCAL)
    )

    if stereo_correction:
        # Sampson step on homogeneous normalized pairs (getDepth :65-121):
        # G = [Trl]× Rrlᵀ, fe = n0ᵀ G n1; Pk kills the z component
        n0 = jnp.concatenate([p0, jnp.ones((L, 1), dtype)], 1)
        n1 = jnp.concatenate([p1, jnp.ones((L, 1), dtype)], 1)
        G = lie.skew(Trl.astype(dtype)) @ Rrl.astype(dtype).T
        fe = jnp.einsum("li,ij,lj->l", n0, G, n1)
        v1 = (n0 @ G).at[:, 2].set(0.0)          # Pk Gᵀ n0
        v2 = (n1 @ G.T).at[:, 2].set(0.0)        # Pk G n1
        de = jnp.sum(v1 * v1, 1) + jnp.sum(v2 * v2, 1)
        de = jnp.where(de > 1e-12, de, 1.0)
        c0 = (p0 - (fe / de)[:, None] * v2[:, :2])
        c1 = (p1 - (fe / de)[:, None] * v1[:, :2])
        depth_c, zr_c, err0_c, err1_c = tri_and_errs(c0, c1)
        improved = good & (zr_c > 1.0) & (err0_c <= err0) & (err1_c <= err1)
        depth = jnp.where(improved, depth_c, depth)
        # the reference also overwrites point/pointRight on success
        # (feature_manager.cpp getDepth :115-116) so multiview triangulation
        # and reprojection residuals use the corrected observations too
        lanes = jnp.arange(L)
        book = dataclasses.replace(
            book,
            un=book.un.at[lanes, s].set(
                jnp.where(improved[:, None], c0, p0)),
            un_r=book.un_r.at[lanes, s].set(
                jnp.where(improved[:, None], c1, p1)))

    take = good & ~book.depth_valid
    inv_depth = jnp.where(take, 1.0 / jnp.maximum(depth, 1e-6), book.inv_depth)
    return dataclasses.replace(
        book, inv_depth=inv_depth, depth_valid=book.depth_valid | take)


@jax.jit
def stereo_depth_table(un, un_r, stereo, Rrl, Trl):
    """(L, F) instant stereo DLT depths with the bootstrap gates
    (disparity sign, z ∈ (1, 7) m — getDepth :32); −1 where invalid.

    One vmapped kernel replacing the per-(lane, frame) host-numpy SVDs the
    r2 initializer ran in a Python loop (VERDICT r2 weak #7)."""
    dtype = un.dtype
    L, F = stereo.shape
    pose0 = jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype)], 1)
    pose1 = jnp.concatenate(
        [Rrl.astype(dtype), Trl.astype(dtype)[:, None]], 1)
    p0 = un.reshape(L * F, 2)
    p1 = un_r.reshape(L * F, 2)
    z = jax.vmap(lambda a, b: _dlt_two_view(pose0, pose1, a, b))(p0, p1)[:, 2]
    z = z.reshape(L, F)
    ok = stereo & (un[..., 0] >= un_r[..., 0]) & (z > 1.0) & (z < 7.0)
    return jnp.where(ok, z, -1.0)


@functools.partial(jax.jit, static_argnames=("ex_idx",))
def triangulate_multiview(book: FeatureBook, state: WindowState, ex_idx: int):
    """Masked multi-view SVD triangulation (stereo_triangulate :822-877)."""
    dtype = book.un.dtype
    L = book.un.shape[0]
    s = start_frame(book)
    gate = book.active & (used_num(book) >= 2) & (s < WINDOW - 2) \
        & ~book.depth_valid

    Rws = lie.quat_to_rot(state.Q)                        # (11,3,3)
    Rex = lie.quat_to_rot(state.ex_q[ex_idx])
    tex = state.ex_p[ex_idx]
    t_wc = state.P + jnp.einsum("fij,j->fi", Rws, tex)    # (11,3) cam centers
    R_wc = jnp.einsum("fij,jk->fik", Rws, Rex)            # (11,3,3)

    def one(lane):
        s_l = s[lane]
        t0 = t_wc[s_l]
        R0 = R_wc[s_l]
        # relative cam poses: x_cj = Rᵀ (x_c0 - t) with R = R0ᵀ R1, t = R0ᵀ(t1-t0)
        t_rel = jnp.einsum("ij,fj->fi", R0.T, t_wc - t0)
        R_rel = jnp.einsum("ij,fjk->fik", R0.T, R_wc)
        P_rows = jnp.concatenate(
            [jnp.swapaxes(R_rel, 1, 2),
             -jnp.einsum("fij,fi->fj", R_rel, t_rel)[:, :, None]], axis=2
        )  # (11, 3, 4)
        f = jnp.concatenate([book.un[lane], jnp.ones((N_STATES, 1), dtype)], 1)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        row0 = f[:, 0:1] * P_rows[:, 2] - f[:, 2:3] * P_rows[:, 0]
        row1 = f[:, 1:2] * P_rows[:, 2] - f[:, 2:3] * P_rows[:, 1]
        m = book.obs[lane][:, None].astype(dtype)
        A = jnp.concatenate([row0 * m, row1 * m], axis=0)  # (22, 4)
        _, _, vt = jnp.linalg.svd(A)
        v = vt[-1]
        return v[2] / v[3]

    depth = jax.vmap(one)(jnp.arange(L))
    ok = gate & (depth >= 0.1)
    inv_depth = jnp.where(ok, 1.0 / jnp.maximum(depth, 1e-6), book.inv_depth)
    return dataclasses.replace(
        book, inv_depth=inv_depth, depth_valid=book.depth_valid | ok)


@jax.jit
def world_points(book: FeatureBook, state: WindowState, ex_idx: int):
    """World positions of depth-valid landmarks (anchor-frame back-projection).

    Returns (pts_w (L,3), valid (L,)): p_cam = [u, v, 1]ᵀ / λ at the anchor
    frame, mapped through extrinsic + body pose (the pointcloud the reference
    publishes with keyframes, visualization.cpp:408-463)."""
    dtype = book.un.dtype
    L = book.un.shape[0]
    s = start_frame(book)
    valid = book.active & book.depth_valid

    Rws = lie.quat_to_rot(state.Q)
    Rex = lie.quat_to_rot(state.ex_q[ex_idx])
    tex = state.ex_p[ex_idx]

    un_s = jnp.take_along_axis(
        book.un, jnp.broadcast_to(s[:, None, None], (L, 1, 2)), 1)[:, 0]
    depth = 1.0 / jnp.maximum(jnp.abs(book.inv_depth), 1e-6)
    p_cam = jnp.concatenate([un_s, jnp.ones((L, 1), dtype)], 1) * depth[:, None]
    p_body = jnp.einsum("ij,lj->li", Rex, p_cam) + tex
    pts_w = jnp.einsum("lij,lj->li", Rws[s], p_body) + state.P[s]
    return pts_w, valid


# ---------------------------------------------------------------------------
# window slide (removeBackShiftDepth :952-1018, removeFront)
# ---------------------------------------------------------------------------

@jax.jit
def slide_old(book: FeatureBook, marg_P, marg_Q, new_P, new_Q, ex_p, ex_q):
    """Slide after MARGIN_OLD: shift all observations one slot left; features
    anchored at frame 0 are re-anchored to the new frame 0 with transformed
    depth; lanes left with < 2 observations are dropped (removeBackShiftDepth).

    marg_*/new_*: body poses of the marginalized frame and new first frame;
    ex: body_T_cam of this book's left camera.
    """
    dtype = book.un.dtype
    s = start_frame(book)
    anchored0 = book.active & (s == 0) & book.obs[:, 0]

    # depth re-anchor: p_cam0 old → world → cam0 new
    Rm = lie.quat_to_rot(marg_Q)
    Rn = lie.quat_to_rot(new_Q)
    Rex = lie.quat_to_rot(ex_q)
    R_w_old = Rm @ Rex
    t_w_old = marg_P + Rm @ ex_p
    R_w_new = Rn @ Rex
    t_w_new = new_P + Rn @ ex_p

    uv0 = book.un[:, 0]
    depth = jnp.where(book.depth_valid & (jnp.abs(book.inv_depth) > 1e-9),
                      1.0 / jnp.where(jnp.abs(book.inv_depth) > 1e-9,
                                      book.inv_depth, 1.0), 1.0)
    pts_cam = jnp.concatenate([uv0, jnp.ones((uv0.shape[0], 1), dtype)], 1) \
        * depth[:, None]
    pts_w = pts_cam @ R_w_old.T + t_w_old
    pts_new = (pts_w - t_w_new) @ R_w_new
    new_depth = pts_new[:, 2]
    re_ok = anchored0 & book.depth_valid & (new_depth > 0.1)

    def shift(a):
        pad = jnp.zeros_like(a[:, -1:])
        return jnp.concatenate([a[:, 1:], pad], axis=1)

    book2 = dataclasses.replace(
        book,
        un=shift(book.un), vel=shift(book.vel),
        un_r=shift(book.un_r), vel_r=shift(book.vel_r),
        obs=shift(book.obs), stereo=shift(book.stereo),
        td_obs=shift(book.td_obs),
    )
    inv_new = jnp.where(
        anchored0,
        jnp.where(re_ok, 1.0 / jnp.maximum(new_depth, 1e-6), 0.0),
        book.inv_depth,
    )
    depth_valid = jnp.where(anchored0, re_ok, book.depth_valid)
    alive = book2.active & (jnp.sum(book2.obs, axis=1) >= 1)
    # reference drops anchored features that kept < 2 obs (":966-968")
    alive = alive & ~(anchored0 & (jnp.sum(book2.obs, axis=1) < 2))
    return dataclasses.replace(
        book2, inv_depth=jnp.where(alive, inv_new, 0.0),
        depth_valid=depth_valid & alive, active=alive,
        ids=jnp.where(alive, book2.ids, -1),
    )


@functools.partial(jax.jit, static_argnames=("frame_count",))
def slide_second_new(book: FeatureBook, frame_count: int):
    """Slide after MARGIN_SECOND_NEW (removeFront): delete slot fc-1 obs and
    move slot fc into it."""
    j = frame_count - 1

    def mv(a):
        a = a.at[:, j].set(a[:, frame_count])
        zeros = jnp.zeros_like(a[:, frame_count])
        return a.at[:, frame_count].set(zeros)

    book2 = dataclasses.replace(
        book,
        un=mv(book.un), vel=mv(book.vel), un_r=mv(book.un_r), vel_r=mv(book.vel_r),
        obs=mv(book.obs), stereo=mv(book.stereo), td_obs=mv(book.td_obs),
    )
    alive = book2.active & (jnp.sum(book2.obs, axis=1) >= 1)
    return dataclasses.replace(
        book2, active=alive, ids=jnp.where(alive, book2.ids, -1),
        depth_valid=book2.depth_valid & alive,
    )


@jax.jit
def remove_failures(book: FeatureBook):
    """Drop features whose optimized depth went negative (removeFailures)."""
    bad = book.active & book.depth_valid & (book.inv_depth < 0)
    alive = book.active & ~bad
    return dataclasses.replace(
        book, active=alive, ids=jnp.where(alive, book.ids, -1),
        depth_valid=book.depth_valid & alive,
    )
