"""Microbenchmark: lane-padding and gather costs on the real TPU.

Methodology: slope timing (t[n2]-t[n1])/(n2-n1) with
jax.lax.optimization_barrier between passes to defeat fusion, and a
host-transfer of a scalar to force sync. Calibrated: a (16384,8192) f32
barrier-chain streams at ~683 GB/s on this chip (v5e peak 819).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope(build, n1=2, n2=10, reps=5):
    g1, g2 = build(n1), build(n2)
    float(g1())
    float(g2())
    ts = []
    for g in (g1, g2):
        t0 = time.perf_counter()
        for _ in range(reps):
            float(g())
        ts.append((time.perf_counter() - t0) / reps)
    return (ts[1] - ts[0]) / (n2 - n1)


def stream_bench(shape):
    x = jnp.ones(shape, jnp.float32)

    def build(n):
        @jax.jit
        def g(a):
            for _ in range(n):
                a = jax.lax.optimization_barrier(a * 1.0000001 + 0.5)
            return jnp.sum(a[..., :1, :1])
        return lambda: g(x)
    t = slope(build)
    logical = x.size * 4 * 2
    return t, logical


def gather_bench(nC, k, idx):
    x = jnp.ones((nC, k), jnp.float32)

    def build(n):
        @jax.jit
        def g(a, i):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n):
                a = jax.lax.optimization_barrier(a)
                r = a[i]
                acc = acc + r[0, 0]
            return acc
        return lambda: g(x, idx)
    return slope(build)


def main():
    N = 122886
    print("== streaming (one read+write pass) ==")
    for shape, name in [((N, 26), "(N,26)"), ((N, 32), "(N,32)"),
                        ((N, 104), "(N,104)"), ((N, 128), "(N,128)"),
                        ((26, N), "(26,N)"), ((N // 4, 104), "(N/4,104)")]:
        t, logical = stream_bench(shape)
        print(f"{name:12s} {t*1e6:8.1f} us  logical {logical/1e6:6.1f} MB"
              f" -> {logical/t/1e9:6.1f} GB/s eff")

    print("== gathers (nE rows from (nC,k)) ==")
    nC = 40962
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, nC, size=(N,)), jnp.int32)
    idx_loc = jnp.asarray(
        np.clip(np.arange(N) // 3 + rng.integers(-40, 40, N), 0, nC - 1),
        jnp.int32)
    for k in [26, 32, 104, 128, 256]:
        t = gather_bench(nC, k, idx)
        print(f"gather (nC,{k:3d}): {t*1e6:8.1f} us  "
              f"{N*k*4/t/1e9:6.1f} GB/s logical, {t/N*1e9:5.2f} ns/row")
    t = gather_bench(nC, 104, idx_loc)
    print(f"gather local (nC,104): {t*1e6:8.1f} us  {t/N*1e9:5.2f} ns/row")
    t = gather_bench(nC, 128, idx_loc)
    print(f"gather local (nC,128): {t*1e6:8.1f} us  {t/N*1e9:5.2f} ns/row")


if __name__ == "__main__":
    main()
