import time, numpy as np, jax, jax.numpy as jnp

H, W = 260, 346
HW = H*W
E = 1 << 17
rng = np.random.default_rng(0)
t = jnp.asarray(np.sort(rng.uniform(1.0, 1.05, E)).astype(np.float32))
x = jnp.asarray(rng.integers(0, W, E), jnp.int32)
y = jnp.asarray(rng.integers(0, H, E), jnp.int32)
p = jnp.asarray(rng.integers(0, 2, E), jnp.int32)
pix = y * W + x
table = jnp.zeros(2*HW, jnp.float32)

def timeit(name, f, *a):
    g = jax.jit(f)
    out = g(*a); float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(20): out = g(*a)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32))
    print(f"{name}: {(time.perf_counter()-t0)/20*1000:.3f} ms")

timeit("sort3", lambda pix,t,p: jax.lax.sort((pix,t,p), num_keys=1, is_stable=True), pix, t, p)
iota = jnp.arange(E, dtype=jnp.int32)
timeit("sort1+gather", lambda pix,t,p: (lambda ps,o: (ps, t[o], p[o]))(*jax.lax.sort((pix,iota), num_keys=1, is_stable=True)), pix, t, p)
def scan2(t_s, p_s, seg):
    def combine(a,b):
        fa,va,wa=a; fb,vb,wb=b
        return fa|fb, jnp.where(fb,vb,jnp.maximum(va,vb)), jnp.where(fb,wb,jnp.maximum(wa,wb))
    return jax.lax.associative_scan(combine,(seg, jnp.where(p_s==1,t_s,-1e30), jnp.where(p_s==0,t_s,-1e30)))
seg = jnp.concatenate([jnp.ones((1,),bool), pix[1:]!=pix[:-1]])
timeit("assoc_scan2", scan2, t, p, seg)
timeit("scatter_max", lambda tab, fl, v: tab.at[fl].max(v, mode="drop"), table, p*HW+pix, t)
timeit("gather2", lambda tab, pix: (tab[pix], tab[HW+pix]), table, pix)
