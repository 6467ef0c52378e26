"""Breakdown of the B=8 vmapped solve_window: where does the time go?

Times, at B=1 and B=8 (vmapped):
  * full solve_window (8 LM iterations)
  * one assemble_normal_fast call
  * the reduced solve alone (Schur + scaled Cholesky + triangular solves)
    on a synthetic SPD system of the same size
Run on whatever jax.default_backend() is (TPU under axon).
"""
import sys, time
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _make_problem
from esvio_tpu.solver import gauss_newton as gn
from esvio_tpu.solver.window import DIM_ALL


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(f, *a, reps=10):
    out = f(*a)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    L_img, L_evt = 64, 128
    args1 = _make_problem(jnp.float32, L_img=L_img, L_evt=L_evt)
    args8 = _make_problem(jnp.float32, L_img=L_img, L_evt=L_evt, batch=8)

    solve1 = jax.jit(lambda *a: gn.solve_window(*a, iters=8)[3])
    solve8 = jax.jit(jax.vmap(
        lambda s, bi, be, pre, iv, pr, g: gn.solve_window(
            s, bi, be, pre, iv, pr, g, iters=8)[3],
        in_axes=(0, 0, 0, 0, 0, 0, None)))
    t1 = timeit(solve1, *args1)
    t8 = timeit(solve8, *args8)
    print(f"solve_window      B=1 {t1:7.3f} ms   B=8 {t8:7.3f} ms   "
          f"eff {t1 * 8 / t8 / 8:.2f}")

    asm1 = jax.jit(lambda s, bi, be, pre, iv, pr, g:
                   gn.assemble_normal_fast(s, bi, be, pre, iv, pr, g)[2])
    asm8 = jax.jit(jax.vmap(
        lambda s, bi, be, pre, iv, pr, g:
        gn.assemble_normal_fast(s, bi, be, pre, iv, pr, g)[2],
        in_axes=(0, 0, 0, 0, 0, 0, None)))
    a1 = timeit(asm1, *args1)
    a8 = timeit(asm8, *args8)
    print(f"assemble (1 call) B=1 {a1:7.3f} ms   B=8 {a8:7.3f} ms   "
          f"eff {a1 * 8 / a8 / 8:.2f}  (x8 iters: {a1 * 8:.2f} / {a8 * 8:.2f})")

    # reduced solve alone: synthetic scaled SPD system, C = 190 + L
    C = DIM_ALL + L_img + L_evt
    rng = np.random.default_rng(0)
    A = rng.normal(0, 1, (C, DIM_ALL + 2)).astype(np.float32)
    Hpp = jnp.asarray(A[:DIM_ALL, :DIM_ALL] @ A[:DIM_ALL, :DIM_ALL].T
                      + 10 * np.eye(DIM_ALL, dtype=np.float32))
    Hpl = jnp.asarray(rng.normal(0, 0.1, (DIM_ALL, L_img + L_evt))
                      .astype(np.float32))
    hll = jnp.asarray(1.0 + rng.random(L_img + L_evt).astype(np.float32))
    bp = jnp.asarray(rng.normal(0, 1, DIM_ALL).astype(np.float32))
    bl = jnp.asarray(rng.normal(0, 1, L_img + L_evt).astype(np.float32))

    def reduced(Hpp, Hpl, hll, bp, bl):
        inv = 1.0 / hll
        Hr = Hpp - (Hpl * inv[None, :]) @ Hpl.T
        br = bp - Hpl @ (bl * inv)
        dx, fin = gn.reduced_solve(Hr, br, 1e-4)
        dlam = -(bl + Hpl.T @ dx) * inv
        return dx.sum() + dlam.sum()

    red1 = jax.jit(reduced)
    red8 = jax.jit(jax.vmap(reduced))
    r1 = timeit(red1, Hpp, Hpl, hll, bp, bl)
    e = lambda x: jnp.broadcast_to(x, (8,) + x.shape)
    r8 = timeit(red8, e(Hpp), e(Hpl), e(hll), e(bp), e(bl))
    print(f"reduced solve     B=1 {r1:7.3f} ms   B=8 {r8:7.3f} ms   "
          f"eff {r1 * 8 / r8 / 8:.2f}  (x8 iters: {r1 * 8:.2f} / {r8 * 8:.2f})")

    # cholesky alone
    Hr = Hpp
    chol1 = jax.jit(lambda H: jnp.linalg.cholesky(H).sum())
    chol8 = jax.jit(jax.vmap(lambda H: jnp.linalg.cholesky(H).sum()))
    c1 = timeit(chol1, Hr)
    c8 = timeit(chol8, e(Hr))
    print(f"cholesky 190      B=1 {c1:7.3f} ms   B=8 {c8:7.3f} ms")

    # triangular solve alone
    Lc = jnp.linalg.cholesky(Hr)
    tri1 = jax.jit(lambda L, b: jax.scipy.linalg.solve_triangular(
        L, b, lower=True).sum())
    tri8 = jax.jit(jax.vmap(lambda L, b: jax.scipy.linalg.solve_triangular(
        L, b, lower=True).sum()))
    g1 = timeit(tri1, Lc, bp)
    g8 = timeit(tri8, e(Lc), e(bp))
    print(f"trisolve 190      B=1 {g1:7.3f} ms   B=8 {g8:7.3f} ms")


if __name__ == "__main__":
    main()
