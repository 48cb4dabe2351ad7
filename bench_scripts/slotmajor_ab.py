#!/usr/bin/env python
"""A/B: slot-minor (nC, mE, SK) vs slot-major (mE, nC, SK) formulations
of the two hot assemble patterns (advective tendency, trisk tangential)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

NC = 40962
NE = 3 * NC - 6
ME = 6
SK = 53
R = 100


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
    print(f"{name:56s} {best/r*1e6:10.1f} us/iter", flush=True)
    return best / r


def main():
    rng = np.random.default_rng(0)
    coc = rng.integers(0, NC, (NC, ME)).astype(np.int32)
    eoc = rng.integers(0, NE, (NC, ME)).astype(np.int32)
    cocJ = jnp.asarray(coc)
    eocJ = jnp.asarray(eoc)
    cocT = jnp.asarray(coc.T.copy())
    eocT = jnp.asarray(eoc.T.copy())
    B = jnp.asarray(rng.standard_normal((NC, 3, ME + 1)) * 1e-2,
                    jnp.float32)
    Wown = jnp.asarray(rng.standard_normal((NC, ME, 3)) * 1e-2,
                       jnp.float32)
    Wopp = jnp.asarray(rng.standard_normal((NC, ME, 3)) * 1e-2,
                       jnp.float32)
    sside = jnp.asarray(rng.standard_normal((NC, ME)), jnp.float32)
    wdiv = jnp.asarray(rng.standard_normal((NC, ME)) * 1e-3, jnp.float32)
    # slot-major weights (host-side transposes)
    B_T = jnp.asarray(np.asarray(B).transpose(1, 2, 0).copy())   # (3,ME+1,NC)
    WownT = jnp.asarray(np.asarray(Wown).transpose(1, 2, 0).copy())
    WoppT = jnp.asarray(np.asarray(Wopp).transpose(1, 2, 0).copy())
    ssideT = jnp.asarray(np.asarray(sside).T.copy())
    wdivT = jnp.asarray(np.asarray(wdiv).T.copy())

    psi0 = jnp.asarray(rng.standard_normal((NC, SK)), jnp.float32)
    ru0 = jnp.asarray(rng.standard_normal((NE, SK)), jnp.float32)

    def adv_minor(c):
        psi, ru = c
        g = psi[cocJ]                                  # (nC, mE, SK)
        F = jnp.einsum("cmi,cik->cmk", B[:, :, 1:], g) \
            + B[:, :, 0][:, :, None] * psi[:, None]
        d2own = jnp.einsum("cpm,cmk->cpk", Wown, F)
        d2opp = sum(Wopp[:, :, m, None] * F[:, m][cocJ] for m in range(3))
        ru_g = ru[eocJ]
        upw = sside[:, :, None]
        val = 0.5 * (psi[:, None] + g) + d2own + d2opp \
            + jnp.sign(ru_g) * upw * (d2own - d2opp)
        tend = -jnp.sum(wdiv[:, :, None] * ru_g * val, axis=1)
        return psi + 1e-4 * tend, ru * 0.9999

    def adv_major(c):
        psi, ru = c
        g = psi[cocT]                                  # (mE, nC, SK)
        F = [sum(B_T[m, 1 + i][:, None] * g[i] for i in range(ME))
             + B_T[m, 0][:, None] * psi for m in range(3)]
        tend = 0.0
        for s in range(ME):
            d2own = sum(WownT[s, m][:, None] * F[m] for m in range(3))
            d2opp = sum(WoppT[s, m][:, None] * F[m][cocT[s]]
                        for m in range(3))
            ru_s = ru[eocT[s]]
            val = 0.5 * (psi + g[s]) + d2own + d2opp \
                + jnp.sign(ru_s) * ssideT[s][:, None] * (d2own - d2opp)
            tend = tend + wdivT[s][:, None] * ru_s * val
        return psi - 1e-4 * tend, ru * 0.9999

    # numeric parity
    a = adv_minor((psi0, ru0))[0]
    b = adv_major((psi0, ru0))[0]
    print("adv parity:", float(jnp.max(jnp.abs(a - b))))
    timeit("adv slot-minor (current)", adv_minor, (psi0, ru0))
    timeit("adv slot-major", adv_major, (psi0, ru0))

    # trisk tangential: G = einsum(cpi,cik->cpk, triskM, u[eoc]);
    # out = G[c1,s1]+G[c2,s2]
    triskM = jnp.asarray(rng.standard_normal((NC, ME, ME)) * 1e-2,
                         jnp.float32)
    triskT = jnp.asarray(np.asarray(triskM).transpose(1, 2, 0).copy())
    c1 = jnp.asarray(rng.integers(0, NC, NE), jnp.int32)
    c2 = jnp.asarray(rng.integers(0, NC, NE), jnp.int32)
    s1 = jnp.asarray(rng.integers(0, ME, NE), jnp.int32)
    s2 = jnp.asarray(rng.integers(0, ME, NE), jnp.int32)

    def trisk_minor(c):
        u, acc = c
        g = u[eocJ]
        G = jnp.einsum("cpi,cik->cpk", triskM, g)
        t = G[c1, s1] + G[c2, s2]
        return u * 0.9999, 0.9 * acc + t

    # slot-major: build G as (mE, nC, SK) then pick via flat gather
    # Gflat (mE*nC, SK) -> rows s*NC + c  (mE*nC merge over UNPADDED
    # leading dims is free)
    def trisk_major(c):
        u, acc = c
        g = u[eocT]                                    # (mE, nC, SK)
        Gs = [sum(triskT[p, i][:, None] * g[i] for i in range(ME))
              for p in range(ME)]
        Gflat = jnp.concatenate(Gs, axis=0)            # (mE*nC, SK)
        t = Gflat[s1 * NC + c1] + Gflat[s2 * NC + c2]
        return u * 0.9999, 0.9 * acc + t

    a = trisk_minor((ru0, jnp.zeros((NE, SK), jnp.float32)))[1]
    b = trisk_major((ru0, jnp.zeros((NE, SK), jnp.float32)))[1]
    print("trisk parity:", float(jnp.max(jnp.abs(a - b))))
    timeit("trisk slot-minor (current)", trisk_minor,
           (ru0, jnp.zeros((NE, SK), jnp.float32)))
    timeit("trisk slot-major", trisk_major,
           (ru0, jnp.zeros((NE, SK), jnp.float32)))

    # plain masked-sum assemble (solve_diagnostics divergence/ke genre)
    def asm_minor(c):
        u, acc = c
        g = u[eocJ]
        d = jnp.sum(wdiv[:, :, None] * g, axis=1)
        return u * 0.9999, 0.9 * acc + d
    def asm_major(c):
        u, acc = c
        g = u[eocT]
        d = sum(wdivT[s][:, None] * g[s] for s in range(ME))
        return u * 0.9999, 0.9 * acc + d
    accc = jnp.zeros((NC, SK), jnp.float32)
    timeit("assemble slot-minor", asm_minor, (ru0, accc))
    timeit("assemble slot-major", asm_major, (ru0, accc))


if __name__ == "__main__":
    main()
