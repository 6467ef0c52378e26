"""4-DoF pose-graph optimization (yaw + position), batched GN (pure JAX).

Re-derivation of PoseGraph::optimize4DoF + FourDOFError/FourDOFWeightError
(/root/reference/pose_graph/src/pose_graph.cpp:423-586, pose_graph.h:160-249):

  residual(i, j) = [ R(yaw_i, pitch_i, roll_i)ᵀ (t_j − t_i) − t_ij ;
                     wrap(yaw_j − yaw_i − yaw_ij) (/10 for loop edges) ]

  * sequential edges to each of the 4 previous keyframes, loop edges with
    Huber(0.1) loss, first keyframe fixed, ≤ 5 GN iterations
    (pose_graph.cpp:455-531);
  * pitch/roll are constants from VIO (observable), only yaw+t optimized.

Static capacity: K keyframes, E loop edges; masked lanes are zero rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from esvio_tpu.core import lie

SEQ_NEIGHBORS = 4   # pose_graph.cpp:497
HUBER_DELTA = 0.1
YAW_LOOP_WEIGHT = 0.1  # loop-edge yaw residual divided by 10


def _ypr_rot(yaw_deg, pitch_deg, roll_deg):
    return lie.ypr_to_rot(jnp.stack([yaw_deg, pitch_deg, roll_deg], axis=-1))


def _edge_residual(yaw_i, t_i, yaw_j, t_j, pitch_i, roll_i, t_ij, yaw_ij,
                   yaw_scale):
    Ri = _ypr_rot(yaw_i, pitch_i, roll_i)
    t_loc = Ri.T @ (t_j - t_i)
    r_t = t_loc - t_ij
    r_y = lie.normalize_angle_deg(yaw_j - yaw_i - yaw_ij) * yaw_scale
    return jnp.concatenate([r_t, r_y[None]])


def _huber_weight(r2, delta):
    """sqrt of Huber ρ'(s) for Ceres HuberLoss(delta), s = ‖r‖²."""
    s = jnp.sqrt(jnp.maximum(r2, 1e-24))
    return jnp.where(s <= delta, 1.0, jnp.sqrt(delta / s))


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_4dof(yaw, t, pitch, roll, kf_valid, first_idx,
                  loop_i, loop_j, loop_t_ij, loop_yaw_ij, loop_valid,
                  iters: int = 5):
    """Optimize yaw (degrees) + position for all keyframes.

    Args:
      yaw/pitch/roll: (K,) degrees from VIO; t: (K, 3).
      kf_valid: (K,) bool — occupied keyframe slots.
      first_idx: () int — earliest optimized keyframe (fixed; frames before
        the earliest loop stay untouched, pose_graph.cpp:463-495).
      loop_*: (E,) loop-edge endpoint indices + measured relative pose.

    Returns (yaw', t').
    """
    K = yaw.shape[0]
    dtype = t.dtype

    # sequential edges: (k-s → k) for s = 1..4, measured from the input poses
    # (the VIO odometry), pose_graph.cpp:497-512
    seq_i = []
    seq_j = []
    for s in range(1, SEQ_NEIGHBORS + 1):
        j_idx = jnp.arange(K)
        i_idx = j_idx - s
        seq_i.append(jnp.maximum(i_idx, 0))
        seq_j.append(j_idx)
    seq_i = jnp.concatenate(seq_i)
    seq_j = jnp.concatenate(seq_j)
    seq_ok = (seq_j - seq_i >= 1) & (seq_i >= first_idx) & kf_valid[seq_i] \
        & kf_valid[seq_j] & (seq_j > first_idx)

    Ri0 = _ypr_rot(yaw[seq_i], pitch[seq_i], roll[seq_i])
    seq_t_ij = jnp.einsum("eji,ej->ei", Ri0, t[seq_j] - t[seq_i])
    seq_yaw_ij = yaw[seq_j] - yaw[seq_i]

    free = kf_valid & (jnp.arange(K) >= first_idx) & (jnp.arange(K) != first_idx)

    def residuals_and_jac(yaw_c, t_c):
        def one(i, j, t_ij, yaw_ij, yaw_scale):
            def f(d):
                dyi, dti, dyj, dtj = d[0], d[1:4], d[4], d[5:8]
                return _edge_residual(
                    yaw_c[i] + dyi, t_c[i] + dti, yaw_c[j] + dyj, t_c[j] + dtj,
                    pitch[i], roll[i], t_ij, yaw_ij, yaw_scale)

            z = jnp.zeros(8, dtype)
            return f(z), jax.jacfwd(f)(z)

        r_seq, J_seq = jax.vmap(lambda i, j, tij, yij: one(
            i, j, tij, yij, jnp.asarray(1.0, dtype)))(
            seq_i, seq_j, seq_t_ij, seq_yaw_ij)
        r_loop, J_loop = jax.vmap(lambda i, j, tij, yij: one(
            i, j, tij, yij, jnp.asarray(YAW_LOOP_WEIGHT, dtype)))(
            loop_i, loop_j, loop_t_ij, loop_yaw_ij)
        return (r_seq, J_seq), (r_loop, J_loop)

    def gn_step(_, carry):
        yaw_c, t_c = carry
        (r_s, J_s), (r_l, J_l) = residuals_and_jac(yaw_c, t_c)
        w_s = seq_ok.astype(dtype)[:, None]
        hub = _huber_weight(jnp.sum(r_l * r_l, axis=-1), HUBER_DELTA)
        w_l = (loop_valid.astype(dtype) * hub)[:, None]
        r_s = r_s * w_s
        J_s = J_s * w_s[:, :, None]
        r_l = r_l * w_l
        J_l = J_l * w_l[:, :, None]

        # assemble H (4K × 4K), b — per-node blocks [yaw, t] of width 4
        n = 4 * K
        H = jnp.zeros((n, n), dtype)
        b = jnp.zeros((n,), dtype)

        def accumulate(H, b, idx_i, idx_j, r, J):
            ci = (idx_i * 4)[:, None] + jnp.arange(4)[None, :]
            cj = (idx_j * 4)[:, None] + jnp.arange(4)[None, :]
            cols = jnp.concatenate([ci, cj], axis=1)  # (E, 8)
            Ht = jnp.einsum("eri,erj->eij", J, J)
            bt = jnp.einsum("eri,er->ei", J, r)
            H = H.at[cols[:, :, None], cols[:, None, :]].add(Ht)
            b = b.at[cols].add(bt)
            return H, b

        H, b = accumulate(H, b, seq_i, seq_j, r_s, J_s)
        H, b = accumulate(H, b, loop_i, loop_j, r_l, J_l)

        # fix non-free nodes: zero their rows/cols, unit diagonal
        free4 = jnp.repeat(free, 4)
        H = jnp.where(free4[:, None] & free4[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(free4, 1e-8, 1.0))
        b = jnp.where(free4, b, 0.0)

        dx = -jnp.linalg.solve(H, b)
        dyaw = dx.reshape(K, 4)[:, 0]
        dt = dx.reshape(K, 4)[:, 1:4]
        return yaw_c + dyaw, t_c + dt

    yaw_o, t_o = jax.lax.fori_loop(0, iters, gn_step, (yaw, t))
    yaw_o = lie.normalize_angle_deg(yaw_o)
    return jnp.where(free, yaw_o, yaw), jnp.where(free[:, None], t_o, t)


# ---------------------------------------------------------------------------
# matrix-free sparse solve — unbounded-trajectory path
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_4dof_cg(yaw, t, pitch, roll, kf_valid, first_idx,
                     loop_i, loop_j, loop_t_ij, loop_yaw_ij, loop_valid,
                     iters: int = 5, cg_iters: int = 100):
    """4-DoF pose-graph GN with a matrix-free Jacobi-preconditioned CG solve.

    Same problem as `optimize_4dof` but never materializes the (4K)² Hessian:
    H·v is computed edge-wise (gather v at the edge endpoints, apply the
    (4, 8) edge Jacobian, scatter back), so memory and FLOPs are O(K + E)
    per CG iteration instead of O(K²)/O(K³).  This is the unbounded-
    trajectory path — the reference keeps its keyframe list unbounded and
    solves SPARSE_NORMAL_CHOLESKY (pose_graph.cpp:423-586); dense Cholesky at
    K ≳ 2k is neither possible there nor here.

    CG on the gauge-fixed normal equations converges fast because the graph
    is an expander-ish chain (4-neighbor band + loop edges) and Jacobi
    preconditioning equalizes yaw/translation scales.
    """
    K = yaw.shape[0]
    dtype = t.dtype

    seq_i = []
    seq_j = []
    for s in range(1, SEQ_NEIGHBORS + 1):
        j_idx = jnp.arange(K)
        i_idx = j_idx - s
        seq_i.append(jnp.maximum(i_idx, 0))
        seq_j.append(j_idx)
    seq_i = jnp.concatenate(seq_i)
    seq_j = jnp.concatenate(seq_j)
    seq_ok = (seq_j - seq_i >= 1) & (seq_i >= first_idx) & kf_valid[seq_i] \
        & kf_valid[seq_j] & (seq_j > first_idx)

    Ri0 = _ypr_rot(yaw[seq_i], pitch[seq_i], roll[seq_i])
    seq_t_ij = jnp.einsum("eji,ej->ei", Ri0, t[seq_j] - t[seq_i])
    seq_yaw_ij = yaw[seq_j] - yaw[seq_i]

    free = kf_valid & (jnp.arange(K) >= first_idx) & (jnp.arange(K) != first_idx)
    free4 = free[:, None] & jnp.ones((1, 4), bool)          # (K, 4)

    ei = jnp.concatenate([seq_i, loop_i])
    ej = jnp.concatenate([seq_j, loop_j])
    e_tij = jnp.concatenate([seq_t_ij, loop_t_ij])
    e_yij = jnp.concatenate([seq_yaw_ij, loop_yaw_ij])
    e_scale = jnp.concatenate([
        jnp.ones_like(seq_yaw_ij),
        jnp.full_like(loop_yaw_ij, YAW_LOOP_WEIGHT)])
    is_loop = jnp.concatenate([
        jnp.zeros(seq_i.shape[0], bool), jnp.ones(loop_i.shape[0], bool)])
    base_ok = jnp.concatenate([seq_ok, loop_valid])

    def gn_step(_, carry):
        yaw_c, t_c = carry

        def one(i, j, tij, yij, ys):
            def f(d):
                dyi, dti, dyj, dtj = d[0], d[1:4], d[4], d[5:8]
                return _edge_residual(
                    yaw_c[i] + dyi, t_c[i] + dti, yaw_c[j] + dyj, t_c[j] + dtj,
                    pitch[i], roll[i], tij, yij, ys)
            z = jnp.zeros(8, dtype)
            return f(z), jax.jacfwd(f)(z)

        r_e, J_e = jax.vmap(one)(ei, ej, e_tij, e_yij, e_scale)   # (E,4),(E,4,8)
        hub = _huber_weight(jnp.sum(r_e * r_e, axis=-1), HUBER_DELTA)
        w = base_ok.astype(dtype) * jnp.where(is_loop, hub, 1.0)
        r_e = r_e * w[:, None]
        J_e = J_e * w[:, None, None]

        # b = Jᵀ r scattered to nodes; x layout (K, 4) = [yaw, t]
        bt = jnp.einsum("era,er->ea", J_e, r_e)                   # (E, 8)
        b = jnp.zeros((K, 4), dtype)
        b = b.at[ei].add(bt[:, :4]).at[ej].add(bt[:, 4:])
        b = jnp.where(free4, b, 0.0)

        # Jacobi preconditioner: diag(H)
        d2 = jnp.einsum("era,era->ea", J_e, J_e)
        diag = jnp.full((K, 4), 1e-8, dtype)
        diag = diag.at[ei].add(d2[:, :4]).at[ej].add(d2[:, 4:])
        Minv = jnp.where(free4, 1.0 / diag, 0.0)

        def hvp(v):
            ve = jnp.concatenate([v[ei], v[ej]], axis=1)          # (E, 8)
            u = jnp.einsum("era,ea->er", J_e, ve)                 # (E, 4)
            hv = jnp.einsum("era,er->ea", J_e, u)
            out = jnp.zeros((K, 4), dtype)
            out = out.at[ei].add(hv[:, :4]).at[ej].add(hv[:, 4:])
            return jnp.where(free4, out, 0.0)

        # PCG for H dx = −b
        x0 = jnp.zeros((K, 4), dtype)
        r0 = -b
        z0 = Minv * r0
        p0 = z0

        def cg_body(carry):
            x, r, z, p, k, rz = carry
            Ap = hvp(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = Minv * r
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return x, r, z, p, k + 1, rz_new

        def cg_cond(carry):
            _, r, _, _, k, _ = carry
            return (k < cg_iters) & (jnp.sum(r * r) > 1e-16)

        dx, *_ = jax.lax.while_loop(
            cg_cond, cg_body, (x0, r0, z0, p0, jnp.asarray(0, jnp.int32),
                               jnp.sum(r0 * z0)))
        return yaw_c + dx[:, 0], t_c + dx[:, 1:4]

    yaw_o, t_o = jax.lax.fori_loop(0, iters, gn_step, (yaw, t))
    yaw_o = lie.normalize_angle_deg(yaw_o)
    return jnp.where(free, yaw_o, yaw), jnp.where(free[:, None], t_o, t)
