import time, numpy as np, jax, jax.numpy as jnp
from esvio_tpu.events import sae as sae_mod
from esvio_tpu.events import corners as cor_mod

H, W = 260, 346
E = 1 << 17
rng = np.random.default_rng(0)
t = np.sort(rng.uniform(1.0, 1.05, E)).astype(np.float32)
chunk = sae_mod.EventChunk(
    t=jnp.asarray(t), x=jnp.asarray(rng.integers(0, W, E), jnp.int32),
    y=jnp.asarray(rng.integers(0, H, E), jnp.int32),
    p=jnp.asarray(rng.integers(0, 2, E), jnp.int32),
    valid=jnp.ones(E, bool))
state0 = sae_mod.init_sae(H, W)

upd = jax.jit(lambda s, c: sae_mod.update_sae(s, c, 0.01))
ts_f = jax.jit(lambda s: sae_mod.time_surface(s, 1.05, 20.0, False))
cor_f = jax.jit(lambda s, c: cor_mod.detect_corners(s, c, 10))

state, _ = upd(state0, chunk)

def timeit(name, f, *a):
    out = f(*a)
    d = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(d).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(*a)
    d = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(d).ravel()[0].astype(jnp.float32))
    print(f"{name}: {(time.perf_counter()-t0)/20*1000:.3f} ms")

timeit("update_sae", upd, state0, chunk)
timeit("time_surface", ts_f, state)
timeit("detect_corners", cor_f, state, chunk)
