"""Distributed bundle adjustment: landmark-sharded Schur reduction over psum.

This is the TPU-native replacement for BOTH the reference's 4-pthread Hessian
assembly (marginalization_factor.cpp:188-216) and Ceres DENSE_SCHUR
(estimator.cpp:2024-2036), scaled across a device mesh:

  * landmark lanes of each feature book are sharded over the "lm" mesh axis —
    a landmark's residual rows live entirely on its shard, so the landmark
    elimination (the expensive part of Schur) is fully local;
  * each shard computes its partial reduced camera system
    Hr_k = Hpp_k − Hpl_k hll_k⁻¹ Hlp_k, and one `lax.psum` over "lm" yields
    the global 190×190 reduced system (tiny — solved replicated);
  * the IMU + prior factors are counted once (shard 0) to avoid duplication;
  * independent windows/sequences batch over the "dp" axis (plain sharding of
    the leading batch dim; no cross-window communication).

Wall-clock model: per-shard linearization is O(L/n_lm), the collective moves
one (190, 190) array — bandwidth-trivial on ICI, so scaling is compute-bound.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from esvio_tpu.imu import preintegration as pre
from esvio_tpu.solver import gauss_newton as gn
from esvio_tpu.solver.window import DIM_ALL, FeatureBook, WindowState, apply_delta
from esvio_tpu.dist.sharding import shard_map


def _book_spec():
    lane = P(None, "lm")  # leading batch dim, lane dim sharded
    return FeatureBook(
        un=lane, vel=lane, un_r=lane, vel_r=lane, obs=lane, stereo=lane,
        td_obs=lane, inv_depth=lane, depth_valid=lane, active=lane, ids=lane,
    )


def _rep(tree):
    return jax.tree_util.tree_map(lambda _: P(None), tree,
                                  is_leaf=lambda x: x is None) if tree is None \
        else jax.tree_util.tree_map(lambda _: P(None), tree)


def make_sharded_solver(mesh, iters: int = 8, cauchy_c: float = 1.0,
                        method: str = "chol"):
    """Build a jitted distributed solver over `mesh` (axes "dp", "lm").

    Returned fn signature (all leading-batch over dp):
      (state, book_img, book_evt, preints, imu_valid, prior, g)
        → (state', book_img', book_evt', costs)
    Books' lane axis must be divisible by mesh.shape["lm"].
    """

    def local_step(state, bi, be, preints, imu_valid, prior, g, lam_damp):
        """One LM iteration on this shard's books; returns accepted update.

        Uses the structured normal-equation assembly (assemble_normal_fast)
        — per-shard H built block-wise with no (R, C) Jacobian, the same
        ~50×-fewer-FLOPs path as the single-chip solver; only the reduced
        (190, 190) system and the column norms of the shared pose block
        cross shards (psum over "lm")."""
        dtype = state.P.dtype
        first = jax.lax.axis_index("lm") == 0

        # books are the local shard; IMU+prior weighted to shard 0 only
        prior_local = dataclasses.replace(
            prior, valid=prior.valid & first)
        iv_local = imu_valid & first
        Hpp_r, Hpl_r, hll_r, bp_r, bl_r, cost2 = gn.assemble_normal_reduced(
            state, bi, be, preints, iv_local, prior_local, g, cauchy_c)
        col_norm2 = jax.lax.psum(jnp.diagonal(Hpp_r), "lm")
        col_p = jnp.sqrt(col_norm2)
        col_l = jnp.sqrt(hll_r)
        act_p = col_p > 1e-10
        act_l = col_l > 1e-10
        dp_i = jnp.where(act_p, 1.0 / jnp.where(act_p, col_p, 1.0), 0.0)
        dl_i = jnp.where(act_l, 1.0 / jnp.where(act_l, col_l, 1.0), 0.0)
        Hpp = Hpp_r * dp_i[None, :] * dp_i[:, None]
        Hpl = Hpl_r * dp_i[:, None] * dl_i[None, :]
        hll = hll_r * dl_i * dl_i
        bp = bp_r * dp_i
        bl = bl_r * dl_i
        active_lm = hll > 0.5
        inv_hll = jnp.where(active_lm, 1.0 / jnp.where(active_lm, hll, 1.0), 0.0)

        Hr_local = Hpp - (Hpl * inv_hll[None, :]) @ Hpl.T
        br_local = bp - Hpl @ (bl * inv_hll)
        Hr = jax.lax.psum(Hr_local, "lm")
        br = jax.lax.psum(br_local, "lm")

        dxp_s, finite = gn.reduced_solve(Hr, br, lam_damp, method)
        dlam_s = -(bl + Hpl.T @ dxp_s) * inv_hll * finite.astype(dtype)
        dxp = dxp_s * dp_i
        dlam = dlam_s * dl_i

        st_new = apply_delta(state, dxp)
        L_img = bi.un.shape[0]
        bi_new = dataclasses.replace(bi, inv_depth=bi.inv_depth + dlam[:L_img])
        be_new = dataclasses.replace(be, inv_depth=be.inv_depth + dlam[L_img:])

        c_old = jax.lax.psum(0.5 * cost2, "lm")
        c_new = jax.lax.psum(
            gn.problem_cost(st_new, bi_new, be_new, preints, iv_local,
                            prior_local, g, cauchy_c), "lm")
        accept = c_new < c_old
        sel = lambda a, b_: jnp.where(accept, b_, a)
        state = jax.tree_util.tree_map(sel, state, st_new)
        bi = jax.tree_util.tree_map(sel, bi, bi_new)
        be = jax.tree_util.tree_map(sel, be, be_new)
        _, lam_floor = gn.damping_schedule(dtype)
        lam_damp = jnp.where(accept, jnp.maximum(lam_damp / 10.0, lam_floor),
                             jnp.minimum(lam_damp * 100.0, 1e4))
        return state, bi, be, lam_damp, c_new

    def solve_one(state, bi, be, preints, imu_valid, prior, g):
        dtype = state.P.dtype

        def body(carry, _):
            st, bi_, be_, lam = carry
            st, bi_, be_, lam, c = local_step(st, bi_, be_, preints, imu_valid,
                                              prior, g, lam)
            return (st, bi_, be_, lam), c

        # scan carries must have stable varying-axes types under shard_map:
        # promote everything to varying over both mesh axes up front
        def vary_all(x):
            have = getattr(jax.typeof(x), "vma", frozenset())
            need = tuple(a for a in ("dp", "lm") if a not in have)
            return jax.lax.pcast(x, need, to="varying") if need else x

        lam0, _ = gn.damping_schedule(dtype)
        init = jax.tree_util.tree_map(
            vary_all, (state, bi, be, jnp.asarray(lam0, dtype)))
        (state, bi, be, _), costs = jax.lax.scan(body, init, None, length=iters)
        return state, bi, be, costs

    def sharded(state, bi, be, preints, imu_valid, prior, g):
        # vmap over the local dp batch, shard_map gives per-shard books
        f = jax.vmap(solve_one, in_axes=(0, 0, 0, 0, 0, 0, None))
        return f(state, bi, be, preints, imu_valid, prior, g)

    batch = lambda spec: jax.tree_util.tree_map(
        lambda s: P(*(("dp",) + tuple(s))), spec,
        is_leaf=lambda x: isinstance(x, P))

    state_spec = jax.tree_util.tree_map(lambda _: P("dp"), win_template_state())
    book_spec = jax.tree_util.tree_map(
        lambda _: P("dp", "lm"), win_template_book())
    pre_spec = jax.tree_util.tree_map(lambda _: P("dp"), pre_template())
    prior_spec = jax.tree_util.tree_map(lambda _: P("dp"), prior_template())

    fn = shard_map(
        sharded, mesh,
        in_specs=(state_spec, book_spec, book_spec, pre_spec, P("dp"),
                  prior_spec, P(None)),
        out_specs=(state_spec, book_spec, book_spec, P("dp")),
        # state/costs are mathematically replicated over "lm" (identical
        # psummed system solved on every shard) — skip static inference
        check_vma=False,
    )
    return jax.jit(fn)


# --- pytree "templates" used only for building matching PartitionSpec trees --

def win_template_state():
    from esvio_tpu.solver.window import init_window
    return init_window()


def win_template_book():
    from esvio_tpu.solver.window import empty_book
    return empty_book(1)


def pre_template():
    import jax.numpy as jnp
    z3 = jnp.zeros(3)
    return pre.Preintegrated(
        delta_p=z3, delta_q=jnp.zeros(4), delta_v=z3,
        jacobian=jnp.zeros((15, 15)), covariance=jnp.zeros((15, 15)),
        sum_dt=jnp.zeros(()), linearized_ba=z3, linearized_bg=z3)


def prior_template():
    return gn.empty_prior()
