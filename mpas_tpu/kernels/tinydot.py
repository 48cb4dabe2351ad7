"""Pallas TPU kernel: per-cell tiny-matrix contraction (batched small GEMM).

The TRiSK cell-assembled operators contract a per-cell (P, I) weight
matrix with a gathered (I, K) neighbor block:   out[c,p,:] = sum_i
W[c,p,i] * X[c,i,:]   (ops/stencils.py tangential_cell_assembled,
cores/atmosphere/advection.py cell-assembled advection).  XLA lowers the
einsum "cpi,cik->cpk" as a batched dot_general whose (nC, I, K) <->
(nC*I, K) batch merges are physical relayouts across the padded sublane
axis — measured 79 ms/step of reshape + 35 ms of copy at jw_120km
(PERF.md round 4), unreachable from jnp-level code.  This kernel streams
X through VMEM once per block and performs the contraction as P*I
unrolled sublane-plane FMAs: no reshapes, no dot_general.

ref capability: the adv_coefs/weightsOnEdge stencil loops,
src/core_atmosphere/dynamics/mpas_atm_time_integration.F:4803-4813,
:5020-5035 (the TPU factorization is ours; see advection.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512


def _tinydot_kernel(P: int, I: int, w_ref, x_ref, o_ref):
    """w_ref: (B, P*I) lanes-flat weights; x_ref: (B, I, K); o_ref:
    (B, P, K). The i-loop is unrolled: X's sublane planes are read once
    each and accumulated into P accumulators."""
    x = x_ref[:]                                  # (B, I, K)
    w = w_ref[:]                                  # (B, P*I)
    for p in range(P):
        acc = w[:, p * I][:, None] * x[:, 0, :]
        for i in range(1, I):
            acc = acc + w[:, p * I + i][:, None] * x[:, i, :]
        o_ref[:, p, :] = acc


def tinydot(w, x, interpret: bool = False):
    """out[c, p, :] = sum_i w[c, p, i] * x[c, i, :].

    w: (nC, P, I); x: (nC, I, K). Returns (nC, P, K). Bitwise-equal to
    jnp.einsum("cpi,cik->cpk", w, x) up to FMA association (same
    left-to-right accumulation order as the einsum's reduction)."""
    if not interpret:
        interpret = jax.default_backend() == "cpu"
    nc, P, I = w.shape
    K = x.shape[2]
    pad = (-nc) % BLOCK
    wf = w.reshape(nc, P * I)
    if pad:
        wf = jnp.pad(wf, ((0, pad), (0, 0)))
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    nblk = (nc + pad) // BLOCK
    out = pl.pallas_call(
        functools.partial(_tinydot_kernel, P, I),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BLOCK, P * I), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, I, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, P, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc + pad, P, K), x.dtype),
        interpret=interpret,
    )(wf, x)
    return out[:nc]
