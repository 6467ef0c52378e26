"""Per-iteration cost of solve_window components, measured inside lax.scan
(8 applications chained through the carry so nothing hoists/CSEs), at B=1 and
B=8.  Subtracting the ~2.5 ms dispatch floor once per measurement instead of
per call."""
import sys, time
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _make_problem
from esvio_tpu.solver import gauss_newton as gn
from esvio_tpu.solver import factors
from esvio_tpu.solver.window import DIM_ALL, N_STATES, start_frame
import dataclasses


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


def scan8(body):
    """Chain 8 applications of body(state)->scalar through state.P."""
    def run(state, bi, be, pre, iv, pr, g):
        def step(st, _):
            c = body(st, bi, be, pre, iv, pr, g)
            st = dataclasses.replace(st, P=st.P + c * 1e-30)
            return st, c
        st, cs = jax.lax.scan(step, state, None, length=8)
        return cs.sum()
    return run


def main():
    L_img, L_evt = 64, 128
    args1 = _make_problem(jnp.float32, L_img=L_img, L_evt=L_evt)
    args8 = _make_problem(jnp.float32, L_img=L_img, L_evt=L_evt, batch=8)

    def measure(name, body):
        f1 = jax.jit(scan8(body))
        f8 = jax.jit(jax.vmap(scan8(body),
                              in_axes=(0, 0, 0, 0, 0, 0, None)))
        t1 = timeit(f1, *args1)
        t8 = timeit(f8, *args8)
        print(f"{name:28s} B=1 {t1:7.2f} ms   B=8 {t8:7.2f} ms   "
              f"per-iter B8 {(t8 - 2.5) / 8:5.2f} ms")

    # full LM step minus nothing: reuse solve_window directly for reference
    solve1 = lambda *a: gn.solve_window(*a, iters=8)[3]
    solve8 = jax.jit(jax.vmap(lambda s, bi, be, pre, iv, pr, g:
                              gn.solve_window(s, bi, be, pre, iv, pr, g,
                                              iters=8)[3],
                              in_axes=(0, 0, 0, 0, 0, 0, None)))
    t1 = timeit(jax.jit(lambda *a: solve1(*a).sum()), *args1)
    t8 = timeit(lambda *a: solve8(*a).sum(), *args8)
    print(f"{'solve_window (8 it)':28s} B=1 {t1:7.2f} ms   B=8 {t8:7.2f} ms   "
          f"per-iter B8 {(t8 - 2.5) / 8:5.2f} ms")

    # 1: factor evaluation only (residuals+jacobians, no reduction)
    def fac_only(st, bi, be, pre, iv, pr, g):
        blocks, (rp, Jp), _ = gn.factor_blocks(st, bi, be, pre, iv, pr, g,
                                               1.0, with_jac=True)
        tot = jnp.sum(rp * rp)
        for r, J, _ in blocks:
            tot = tot + jnp.sum(r * r) + jnp.sum(J * J)
        return tot
    measure("factor_blocks (r+J)", fac_only)

    # 1b: residuals only
    def res_only(st, bi, be, pre, iv, pr, g):
        blocks, (rp, _), _ = gn.factor_blocks(st, bi, be, pre, iv, pr, g,
                                              1.0, with_jac=False)
        tot = jnp.sum(rp * rp)
        for r, _, _ in blocks:
            tot = tot + jnp.sum(r * r)
        return tot
    measure("factor_blocks (r only)", res_only)

    # 2: full reduced assembly
    def asm(st, bi, be, pre, iv, pr, g):
        Hpp, Hpl, hll, bp, bl, c = gn.assemble_normal_reduced(
            st, bi, be, pre, iv, pr, g)
        return Hpp.sum() + Hpl.sum() + hll.sum() + bp.sum() + bl.sum() + c
    measure("assemble_reduced", asm)

    # 3: assembly + schur + cholesky solve (= the whole iteration w/o accept)
    def asm_solve(st, bi, be, pre, iv, pr, g):
        Hpp, Hpl, hll, bp, bl, c = gn.assemble_normal_reduced(
            st, bi, be, pre, iv, pr, g)
        col = jnp.sqrt(jnp.concatenate([jnp.diagonal(Hpp), hll]))
        act = col > 1e-10
        d = jnp.where(act, 1.0 / jnp.where(act, col, 1.0), 0.0)
        dp, dl = d[:DIM_ALL], d[DIM_ALL:]
        Hpp = Hpp * dp[None, :] * dp[:, None]
        Hpl = Hpl * dp[:, None] * dl[None, :]
        hll = hll * dl * dl
        alm = hll > 0.5
        ih = jnp.where(alm, 1.0 / jnp.where(alm, hll, 1.0), 0.0)
        Hr = Hpp - (Hpl * ih[None, :]) @ Hpl.T
        br = bp * dp - Hpl @ (bl * dl * ih)
        dx, fin = gn.reduced_solve(Hr, br, 1e-4)
        return dx.sum() + c
    measure("assemble+scale+schur+chol", asm_solve)


if __name__ == "__main__":
    main()
