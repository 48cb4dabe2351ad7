import time, numpy as np, jax, jax.numpy as jnp

def timeit(f, *a):
    float(np.asarray(f(*a)))
    t0 = time.perf_counter(); float(np.asarray(f(*a))); t1 = time.perf_counter()
    float(np.asarray(f(*a))); t2 = time.perf_counter()
    return min(t1-t0, t2-t1)

R = 50
nC, nE, K = 40962, 122880, 26
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, nC, size=(nE,)), jnp.int32)
fs = [jnp.full((nC, K), float(i+1), jnp.float32) for i in range(4)]

@jax.jit
def separate(a, b, c, d, i):
    def body(acc, k):
        j = (i + k) % nC
        g = a[j]*1.1 + b[j]*2.2 + c[j]*3.3 + d[j]*4.4
        return acc + jnp.sum(g, axis=0), ()
    acc, _ = jax.lax.scan(body, jnp.zeros((K,), jnp.float32),
                          jnp.arange(R, dtype=jnp.int32))
    return jnp.sum(acc)

@jax.jit
def packed(a, b, c, d, i):
    cat = jnp.concatenate([a, b, c, d], axis=1)
    def body(acc, k):
        j = (i + k) % nC
        g = cat[j]                       # (nE, 4K) one gather
        out = (g[:, :K]*1.1 + g[:, K:2*K]*2.2
               + g[:, 2*K:3*K]*3.3 + g[:, 3*K:]*4.4)
        return acc + jnp.sum(out, axis=0), ()
    acc, _ = jax.lax.scan(body, jnp.zeros((K,), jnp.float32),
                          jnp.arange(R, dtype=jnp.int32))
    return jnp.sum(acc)

@jax.jit
def packed3d(a, b, c, d, i):
    cat = jnp.stack([a, b, c, d], axis=1)   # (nC, 4, K)
    def body(acc, k):
        j = (i + k) % nC
        g = cat[j]                       # (nE, 4, K)
        out = (g[:, 0]*1.1 + g[:, 1]*2.2 + g[:, 2]*3.3 + g[:, 3]*4.4)
        return acc + jnp.sum(out, axis=0), ()
    acc, _ = jax.lax.scan(body, jnp.zeros((K,), jnp.float32),
                          jnp.arange(R, dtype=jnp.int32))
    return jnp.sum(acc)

for name, f in [("separate", separate), ("packed-lanes", packed), ("packed-3d", packed3d)]:
    t = timeit(f, *fs, idx)
    print(f"{name}: {t*1e3:.1f} ms  per-iter {t/R*1e6:.0f} us")
