#!/usr/bin/env python
"""Microbenchmark: N layout (cells, nz) vs T layout (nz, cells) primitives.

Decides the round-5 dycore relayout (PERF.md 'Remaining headroom'). Timing:
one dispatch of a lax.scan whose body FEEDS ITS OUTPUT BACK into the
gathered/streamed operand (so nothing is loop-invariant and XLA cannot
hoist the op out of the loop), R large enough to swamp the ~10-100ms axon
dispatch noise, best of 3 runs.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

NC = 40962
NE = 3 * NC - 6
NZ = 26
R = 600


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
    print(f"{name:55s} {best/r*1e6:10.1f} us/iter", flush=True)
    return best / r


def main():
    rng = np.random.default_rng(0)
    xN = jnp.asarray(rng.standard_normal((NC, NZ)), jnp.float32)
    yN = jnp.asarray(rng.standard_normal((NC, NZ)), jnp.float32)
    xT = jnp.asarray(np.asarray(xN).T.copy())
    yT = jnp.asarray(np.asarray(yN).T.copy())
    c1 = jnp.asarray(rng.integers(0, NC, NE), jnp.int32)
    c2 = jnp.asarray(rng.integers(0, NC, NE), jnp.int32)
    eoc = jnp.asarray(rng.integers(0, NE, (NC, 7)), jnp.int32)
    sgn = jnp.asarray(rng.standard_normal((NC, 7)) * 1e-3, jnp.float32)
    sgnT = jnp.asarray(np.asarray(sgn).T.copy())
    fz = jnp.asarray(rng.standard_normal(NZ + 1) * 0.1, jnp.float32)

    print(f"== streaming (saxpy x1), {NC}x{NZ} ==", flush=True)
    timeit("N (nC, nz)", lambda x: 0.9999 * x + 0.0001 * yN, xN)
    timeit("T (nz, nC)", lambda x: 0.9999 * x + 0.0001 * yT, xT)

    print("== compound stencil step (pair gather + 7-slot assemble "
          "+ vertical) ==", flush=True)

    def stepN(x):
        u = x[c1] - x[c2]                               # (nE, nz)
        g = u[eoc]                                      # (nC, 7, nz)
        div = jnp.sum(sgn[:, :, None] * g, axis=1)
        mid = fz[None, 1:NZ] * x[:, 1:] + fz[None, :NZ - 1] * x[:, :-1]
        z = jnp.zeros_like(x[:, :1])
        i = jnp.concatenate([z, mid, z], axis=-1)
        return 0.999 * x + 1e-3 * div + 1e-3 * (i[:, 1:] - i[:, :-1])

    def stepT(x):
        u = x[:, c1] - x[:, c2]                         # (nz, nE)
        div = sgnT[0][None, :] * u[:, eoc[:, 0]]
        for p in range(1, 7):
            div = div + sgnT[p][None, :] * u[:, eoc[:, p]]
        mid = fz[1:NZ, None] * x[1:] + fz[:NZ - 1, None] * x[:-1]
        z = jnp.zeros_like(x[:1])
        i = jnp.concatenate([z, mid, z], axis=0)
        return 0.999 * x + 1e-3 * div + 1e-3 * (i[1:] - i[:-1])

    timeit("N compound", stepN, xN, r=200)
    timeit("T compound", stepT, xT, r=200)

    print("== compound with 4-field pack ==", flush=True)
    xN4 = jnp.concatenate([xN] * 4, axis=1)
    xT4 = jnp.concatenate([xT] * 4, axis=0)

    def stepN4(x):
        u = x[c1] - x[c2]
        g = u[eoc]
        div = jnp.sum(sgn[:, :, None] * g, axis=1)
        return 0.999 * x + 1e-3 * div

    def stepT4(x):
        u = x[:, c1] - x[:, c2]
        div = sgnT[0][None, :] * u[:, eoc[:, 0]]
        for p in range(1, 7):
            div = div + sgnT[p][None, :] * u[:, eoc[:, p]]
        return 0.999 * x + 1e-3 * div

    timeit("N compound 4f (no vertical)", stepN4, xN4, r=200)
    timeit("T compound 4f (no vertical)", stepT4, xT4, r=200)

    print("== trisk: per-cell 7x7 contraction + edge pick ==", flush=True)
    W = jnp.asarray(rng.standard_normal((NC, 7, 7)) * 1e-3, jnp.float32)
    s1 = jnp.asarray(rng.integers(0, 7, NE), jnp.int32)
    s2 = jnp.asarray(rng.integers(0, 7, NE), jnp.int32)

    def triskN(c):
        xc, ue = c
        g = ue[eoc]                                     # (nC, 7, nz)
        G = jnp.einsum("cpi,cik->cpk", W, g)
        t = G[c1, s1] + G[c2, s2]                       # (nE, nz)
        return 0.999 * xc + 1e-3 * (t[: NC] if False else 0.0) + 0.0 * xc, \
            0.999 * ue + 1e-3 * t

    WT = jnp.asarray(np.asarray(W).transpose(1, 2, 0).copy())
    oneh1 = [jnp.asarray((np.asarray(s1) == p).astype(np.float32))
             for p in range(7)]
    oneh2 = [jnp.asarray((np.asarray(s2) == p).astype(np.float32))
             for p in range(7)]

    def triskT(c):
        xc, ue = c
        gs = [ue[:, eoc[:, i]] for i in range(7)]
        t = 0.0
        for p in range(7):
            Gp = WT[p, 0][None, :] * gs[0]
            for i in range(1, 7):
                Gp = Gp + WT[p, i][None, :] * gs[i]
            t = t + oneh1[p][None, :] * Gp[:, c1] \
                + oneh2[p][None, :] * Gp[:, c2]
        return 0.999 * xc, 0.999 * ue + 1e-3 * t

    uN0 = jnp.asarray(rng.standard_normal((NE, NZ)), jnp.float32)
    uT0 = jnp.asarray(np.asarray(uN0).T.copy())
    timeit("N trisk einsum+2coord", triskN, (xN, uN0), r=200)
    timeit("T trisk FMA+masked-pick", triskT, (xT, uT0), r=200)


if __name__ == "__main__":
    main()
