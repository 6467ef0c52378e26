"""Visual-inertial initialization alignment (batched linear solves).

Re-derivations of /root/reference/esvio_estimator/src/initial/initial_aligment.cpp:
  * solve_gyroscope_bias        (:3-37)   — LS gyro-bias from visual vs preintegrated ΔR
  * linear_alignment_with_depth (:280-344) — {v_k, g} linear solve, metric scale
    from stereo depth (no scale unknown)
  * refine_gravity_with_depth   (:211-278) — 2-DoF tangent-basis gravity refinement
  * linear_alignment (mono, with scale)    (:125-198) + refine_gravity (:55-123)

All operate on stacked per-frame arrays instead of std::map iteration; the
per-pair 6×8/6×9 blocks are built with vmap and scattered into the block
tridiagonal normal matrix.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from esvio_tpu.core import lie


def solve_gyroscope_bias(Rs, dq_dbg, delta_q):
    """LS Δbg from relative visual rotations vs preintegrated Δq.

    Rs: (F, 3, 3) body rotations; dq_dbg: (F-1, 3, 3) preintegration Jacobian
    block (O_R, O_BG); delta_q: (F-1, 4).
    """
    q_ij = lie.rot_to_quat(jnp.einsum("fji,fjk->fik", Rs[:-1], Rs[1:]))
    resid = 2.0 * lie.quat_mul(lie.quat_inv(delta_q), q_ij)[:, 1:]
    A = jnp.einsum("fji,fjk->ik", dq_dbg, dq_dbg)
    b = jnp.einsum("fji,fj->i", dq_dbg, resid)
    return jnp.linalg.solve(A + 1e-12 * jnp.eye(3, dtype=A.dtype), b)


def _tangent_basis(g0):
    a = g0 / jnp.linalg.norm(g0)
    tmp = jnp.where(jnp.abs(a[2]) > 0.999,
                    jnp.asarray([1.0, 0.0, 0.0], g0.dtype),
                    jnp.asarray([0.0, 0.0, 1.0], g0.dtype))
    b = tmp - a * jnp.dot(a, tmp)
    b = b / jnp.linalg.norm(b)
    c = jnp.cross(a, b)
    return jnp.stack([b, c], axis=1)  # (3, 2)


def _pair_blocks_depth(Rs, T_cam, dp, dv, dts, tic):
    """Per consecutive pair: (6×9) A rows [v_i | v_j | g] and b (6,)."""

    def one(Ri, Rj, Ti, Tj, dpk, dvk, dt):
        Rit = Ri.T
        A = jnp.zeros((6, 9), Rs.dtype)
        A = A.at[0:3, 0:3].set(-dt * jnp.eye(3, dtype=Rs.dtype))
        A = A.at[0:3, 6:9].set(Rit * (dt * dt / 2))
        A = A.at[3:6, 0:3].set(-jnp.eye(3, dtype=Rs.dtype))
        A = A.at[3:6, 3:6].set(Rit @ Rj)
        A = A.at[3:6, 6:9].set(Rit * dt)
        b0 = dpk + Rit @ Rj @ tic - tic - Rit @ (Tj - Ti)
        b = jnp.concatenate([b0, dvk])
        return A, b

    return jax.vmap(one)(Rs[:-1], Rs[1:], T_cam[:-1], T_cam[1:], dp, dv, dts)


def linear_alignment_with_depth(Rs, T_cam, dp, dv, dts, tic, g_norm):
    """Solve {v_0..v_{F-1} (body frames), g (world-b0)}; metric scale assumed.

    Returns (ok, g (3,), v (F, 3)).  ok fails if ‖g‖ is > 1 m/s² off.
    """
    F = Rs.shape[0]
    n = 3 * F + 3
    A_blocks, b_blocks = _pair_blocks_depth(Rs, T_cam, dp, dv, dts, tic)

    A = jnp.zeros((n, n), Rs.dtype)
    b = jnp.zeros((n,), Rs.dtype)

    def body(i, Ab):
        A, b = Ab
        tA = A_blocks[i]
        tb = b_blocks[i]
        rA = tA.T @ tA
        rb = tA.T @ tb
        i3 = i * 3
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (i3, i3), (6, 6)) + rA[0:6, 0:6], (i3, i3))
        b = jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (i3,), (6,)) + rb[0:6], (i3,))
        A = A.at[n - 3:, n - 3:].add(rA[6:9, 6:9])
        b = b.at[n - 3:].add(rb[6:9])
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (i3, n - 3), (6, 3)) + rA[0:6, 6:9],
            (i3, n - 3))
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (n - 3, i3), (3, 6)) + rA[6:9, 0:6],
            (n - 3, i3))
        return A, b

    A, b = jax.lax.fori_loop(0, F - 1, body, (A, b))
    x = jnp.linalg.solve(A * 1000.0 + 1e-9 * jnp.eye(n, dtype=A.dtype), b * 1000.0)
    g = x[n - 3:]
    ok = jnp.abs(jnp.linalg.norm(g) - g_norm) <= 1.0
    g_ref, v = refine_gravity_with_depth(Rs, T_cam, dp, dv, dts, tic, g, g_norm)
    return ok, g_ref, v


def refine_gravity_with_depth(Rs, T_cam, dp, dv, dts, tic, g, g_norm):
    """4 iterations on the 2-DoF gravity tangent (RefineGravityWithDepth)."""
    F = Rs.shape[0]
    n = 3 * F + 2
    dtype = Rs.dtype
    g0 = g / jnp.linalg.norm(g) * g_norm

    def iteration(_, carry):
        g0, _ = carry
        lxly = _tangent_basis(g0)

        def one(Ri, Rj, Ti, Tj, dpk, dvk, dt):
            Rit = Ri.T
            A = jnp.zeros((6, 8), dtype)
            A = A.at[0:3, 0:3].set(-dt * jnp.eye(3, dtype=dtype))
            A = A.at[0:3, 6:8].set((Rit * (dt * dt / 2)) @ lxly)
            A = A.at[3:6, 0:3].set(-jnp.eye(3, dtype=dtype))
            A = A.at[3:6, 3:6].set(Rit @ Rj)
            A = A.at[3:6, 6:8].set((Rit * dt) @ lxly)
            b0 = dpk + Rit @ Rj @ tic - tic - (Rit * (dt * dt / 2)) @ g0 \
                - Rit @ (Tj - Ti)
            b1 = dvk - (Rit * dt) @ g0
            return A, jnp.concatenate([b0, b1])

        A_blocks, b_blocks = jax.vmap(one)(
            Rs[:-1], Rs[1:], T_cam[:-1], T_cam[1:], dp, dv, dts)

        A = jnp.zeros((n, n), dtype)
        b = jnp.zeros((n,), dtype)

        def body(i, Ab):
            A, b = Ab
            rA = A_blocks[i].T @ A_blocks[i]
            rb = A_blocks[i].T @ b_blocks[i]
            i3 = i * 3
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (i3, i3), (6, 6)) + rA[0:6, 0:6],
                (i3, i3))
            b = jax.lax.dynamic_update_slice(
                b, jax.lax.dynamic_slice(b, (i3,), (6,)) + rb[0:6], (i3,))
            A = A.at[n - 2:, n - 2:].add(rA[6:8, 6:8])
            b = b.at[n - 2:].add(rb[6:8])
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (i3, n - 2), (6, 2)) + rA[0:6, 6:8],
                (i3, n - 2))
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (n - 2, i3), (2, 6)) + rA[6:8, 0:6],
                (n - 2, i3))
            return A, b

        A, b = jax.lax.fori_loop(0, F - 1, body, (A, b))
        x = jnp.linalg.solve(A * 1000.0 + 1e-9 * jnp.eye(n, dtype=dtype),
                             b * 1000.0)
        dg = x[n - 2:]
        g_new = g0 + lxly @ dg
        g_new = g_new / jnp.linalg.norm(g_new) * g_norm
        return g_new, x[: 3 * F].reshape(F, 3)

    g0, v = jax.lax.fori_loop(
        0, 4, iteration, (g0, jnp.zeros((F, 3), dtype)))
    return g0, v


# ------------------------------------------------------- mono (with scale)

def _scatter_pair(A, b, rA, rb, i3, n, tail):
    """Accumulate a pair's normal-equation block: v_i/v_j rows at i3, the
    last `tail` unknowns (gravity[, scale]) at the end."""
    A = jax.lax.dynamic_update_slice(
        A, jax.lax.dynamic_slice(A, (i3, i3), (6, 6)) + rA[0:6, 0:6], (i3, i3))
    b = jax.lax.dynamic_update_slice(
        b, jax.lax.dynamic_slice(b, (i3,), (6,)) + rb[0:6], (i3,))
    A = A.at[n - tail:, n - tail:].add(rA[6:, 6:])
    b = b.at[n - tail:].add(rb[6:])
    A = jax.lax.dynamic_update_slice(
        A, jax.lax.dynamic_slice(A, (i3, n - tail), (6, tail)) + rA[0:6, 6:],
        (i3, n - tail))
    A = jax.lax.dynamic_update_slice(
        A, jax.lax.dynamic_slice(A, (n - tail, i3), (tail, 6)) + rA[6:, 0:6],
        (n - tail, i3))
    return A, b


def linear_alignment(Rs, T_cam, dp, dv, dts, tic, g_norm):
    """Mono LinearAlignment (initial_aligment.cpp:125-198): solve
    {v_0..v_{F-1}, g, s} — the monocular SFM is up to scale, so scale s is an
    unknown (stored as s·100 like the reference for conditioning).

    Returns (ok, g (3,), v (F,3), s).  ok fails on s ≤ 0 or ‖g‖ > 1 m/s² off."""
    F = Rs.shape[0]
    n = 3 * F + 4
    dtype = Rs.dtype

    def one(Ri, Rj, Ti, Tj, dpk, dvk, dt):
        Rit = Ri.T
        A = jnp.zeros((6, 10), dtype)
        A = A.at[0:3, 0:3].set(-dt * jnp.eye(3, dtype=dtype))
        A = A.at[0:3, 6:9].set(Rit * (dt * dt / 2))
        A = A.at[0:3, 9].set(Rit @ (Tj - Ti) / 100.0)
        A = A.at[3:6, 0:3].set(-jnp.eye(3, dtype=dtype))
        A = A.at[3:6, 3:6].set(Rit @ Rj)
        A = A.at[3:6, 6:9].set(Rit * dt)
        b0 = dpk + Rit @ Rj @ tic - tic
        return A, jnp.concatenate([b0, dvk])

    A_blocks, b_blocks = jax.vmap(one)(
        Rs[:-1], Rs[1:], T_cam[:-1], T_cam[1:], dp, dv, dts)

    A = jnp.zeros((n, n), dtype)
    b = jnp.zeros((n,), dtype)

    def body(i, Ab):
        A, b = Ab
        rA = A_blocks[i].T @ A_blocks[i]
        rb = A_blocks[i].T @ b_blocks[i]
        return _scatter_pair(A, b, rA, rb, i * 3, n, 4)

    A, b = jax.lax.fori_loop(0, F - 1, body, (A, b))
    x = jnp.linalg.solve(A * 1000.0 + 1e-9 * jnp.eye(n, dtype=dtype),
                         b * 1000.0)
    s = x[n - 1] / 100.0
    g = x[n - 4: n - 1]
    ok = (jnp.abs(jnp.linalg.norm(g) - g_norm) <= 1.0) & (s >= 0)
    g_ref, v, s_ref = refine_gravity(Rs, T_cam, dp, dv, dts, tic, g, g_norm)
    ok = ok & (s_ref >= 0)
    return ok, g_ref, v, s_ref


def refine_gravity(Rs, T_cam, dp, dv, dts, tic, g, g_norm):
    """Mono RefineGravity (initial_aligment.cpp:55-123): 4 iterations on the
    2-DoF gravity tangent with scale kept as an unknown."""
    F = Rs.shape[0]
    n = 3 * F + 3
    dtype = Rs.dtype
    g0 = g / jnp.linalg.norm(g) * g_norm

    def iteration(_, carry):
        g0, _, _ = carry
        lxly = _tangent_basis(g0)

        def one(Ri, Rj, Ti, Tj, dpk, dvk, dt):
            Rit = Ri.T
            A = jnp.zeros((6, 9), dtype)
            A = A.at[0:3, 0:3].set(-dt * jnp.eye(3, dtype=dtype))
            A = A.at[0:3, 6:8].set((Rit * (dt * dt / 2)) @ lxly)
            A = A.at[0:3, 8].set(Rit @ (Tj - Ti) / 100.0)
            A = A.at[3:6, 0:3].set(-jnp.eye(3, dtype=dtype))
            A = A.at[3:6, 3:6].set(Rit @ Rj)
            A = A.at[3:6, 6:8].set((Rit * dt) @ lxly)
            b0 = dpk + Rit @ Rj @ tic - tic - (Rit * (dt * dt / 2)) @ g0
            b1 = dvk - (Rit * dt) @ g0
            return A, jnp.concatenate([b0, b1])

        A_blocks, b_blocks = jax.vmap(one)(
            Rs[:-1], Rs[1:], T_cam[:-1], T_cam[1:], dp, dv, dts)

        A = jnp.zeros((n, n), dtype)
        b = jnp.zeros((n,), dtype)

        def body(i, Ab):
            A, b = Ab
            rA = A_blocks[i].T @ A_blocks[i]
            rb = A_blocks[i].T @ b_blocks[i]
            return _scatter_pair(A, b, rA, rb, i * 3, n, 3)

        A, b = jax.lax.fori_loop(0, F - 1, body, (A, b))
        x = jnp.linalg.solve(A * 1000.0 + 1e-9 * jnp.eye(n, dtype=dtype),
                             b * 1000.0)
        dg = x[n - 3: n - 1]
        g_new = g0 + lxly @ dg
        g_new = g_new / jnp.linalg.norm(g_new) * g_norm
        return g_new, x[: 3 * F].reshape(F, 3), x[n - 1] / 100.0

    g0, v, s = jax.lax.fori_loop(
        0, 4, iteration, (g0, jnp.zeros((F, 3), dtype), jnp.zeros((), dtype)))
    return g0, v, s
