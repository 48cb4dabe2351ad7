#!/usr/bin/env python
"""A/B: einsum cpi,cik->cpk vs Pallas tinydot, in the real consumption
pattern (gather -> contract -> 2-coord pick / masked reduce)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.kernels.tinydot import tinydot

NC = 40962
NE = 3 * NC - 6
R = 150


def timeit(name, body, init, r=R):
    f = jax.jit(lambda c: jax.lax.scan(
        lambda c, _: (body(c), None), c, None, length=r)[0])
    out = f(init)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(init)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best/r*1e6:10.1f} us/iter", flush=True)
    return best / r


def main():
    rng = np.random.default_rng(0)
    for K, P, I in ((26, 7, 7), (53, 7, 7), (53, 3, 7), (53, 7, 3)):
        W = jnp.asarray(rng.standard_normal((NC, P, I)) * 1e-2, jnp.float32)
        eoc = jnp.asarray(rng.integers(0, NE, (NC, I)), jnp.int32)
        c1 = jnp.asarray(rng.integers(0, NC, NE), jnp.int32)
        s1 = jnp.asarray(rng.integers(0, P, NE), jnp.int32)
        u0 = jnp.asarray(rng.standard_normal((NE, K)), jnp.float32)

        # numeric parity
        x0 = u0[eoc]
        a = jnp.einsum("cpi,cik->cpk", W, x0)
        b = tinydot(W, x0)
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"K={K} P={P} I={I}: max abs diff einsum-vs-kernel {err:.2e}")

        def body_e(c):
            u, acc = c
            g = u[eoc]
            G = jnp.einsum("cpi,cik->cpk", W, g)
            t = G[c1, s1]
            return 0.999 * u + 1e-3 * t * 0, 0.9 * acc + t

        def body_p(c):
            u, acc = c
            g = u[eoc]
            G = tinydot(W, g)
            t = G[c1, s1]
            return 0.999 * u + 1e-3 * t * 0, 0.9 * acc + t

        acc0 = jnp.zeros((NE, K), jnp.float32)
        timeit(f"einsum K={K} P={P} I={I}", body_e, (u0, acc0))
        timeit(f"pallas K={K} P={P} I={I}", body_p, (u0, acc0))

        # contraction alone (no pick): feed back through reduce
        def body_e2(c):
            u, acc = c
            G = jnp.einsum("cpi,cik->cpk", W, u[eoc])
            return 0.999 * u, 0.9 * acc + jnp.sum(G, axis=1)
        def body_p2(c):
            u, acc = c
            G = tinydot(W, u[eoc])
            return 0.999 * u, 0.9 * acc + jnp.sum(G, axis=1)
        accc = jnp.zeros((NC, K), jnp.float32)
        timeit(f"einsum+sum  K={K} P={P} I={I}", body_e2, (u0, accc))
        timeit(f"pallas+sum  K={K} P={P} I={I}", body_p2, (u0, accc))


if __name__ == "__main__":
    main()
