import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

def timeit(f, *a):
    float(np.asarray(f(*a)))
    t0 = time.perf_counter(); r1 = float(np.asarray(f(*a))); t1 = time.perf_counter()
    r2 = float(np.asarray(f(*a))); t2 = time.perf_counter()
    return min(t1-t0, t2-t1)

R = 100
N = 122880
for lanes in [26, 32, 104, 128]:
    x = jnp.ones((N, lanes), jnp.float32)
    @jax.jit
    def f(x):
        def body(c, _):
            return c * 1.0001 + 1e-7, ()
        y, _ = jax.lax.scan(body, x, None, length=R)
        return jnp.sum(y)
    t = timeit(f, x)
    gb = N*lanes*4*2*R/1e9
    print(f"scan-copy (N,{lanes}): {t*1e3:.1f} ms  logical {gb/t:.0f} GB/s  per-pass {t/R*1e6:.0f} us")

nC = 40962
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, nC, size=(N,)), jnp.int32)
for lanes in [26, 104]:
    src = jnp.ones((nC, lanes), jnp.float32)
    @jax.jit
    def g(s, i):
        def body(c, k):
            # perturb indices each iter so XLA can't hoist the gather
            rows = s[(i + k) % nC]
            return c + jnp.sum(rows, axis=0), ()
        acc, _ = jax.lax.scan(body, jnp.zeros((lanes,), jnp.float32),
                              jnp.arange(R, dtype=jnp.int32))
        return jnp.sum(acc)
    t = timeit(g, src, idx)
    print(f"scan-gather lanes={lanes}: {t*1e3:.1f} ms  per-gather {t/R*1e6:.0f} us  ({N*lanes*4*R/t/1e9:.0f} GB/s logical)")
