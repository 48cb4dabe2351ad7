"""Parallel vertical recurrences (levels-in-lanes layout).

The reference solves its per-column recurrences with sequential k-loops
(tridiagonal sweeps in atm_advance_acoustic_step_work,
ref: src/core_atmosphere/dynamics/mpas_atm_time_integration.F:2596-2604;
LU-prefactor recurrence in atm_compute_vert_imp_coefs_work, ref :2092-2121).
On TPU the vertical dimension lives in lanes, so a sequential loop over
levels would serialize the whole vector unit.  These helpers express the
same recurrences as O(log nz) `lax.associative_scan` passes that stay in
the (cells, levels) layout — no transposes, no unrolled graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_recurrence(a, b, axis: int = -1, reverse: bool = False):
    """Solve x[i] = a[i] * x[i-1] + b[i] along `axis` with x[-1] = 0.

    With reverse=True solves x[i] = a[i] * x[i+1] + b[i] with x[n] = 0.
    Fully parallel in lanes: affine maps f_i(x) = a_i x + b_i composed by
    an associative scan.
    """
    def combine(prev, nxt):
        a_p, b_p = prev
        a_n, b_n = nxt
        return a_p * a_n, a_n * b_p + b_n

    axis = axis % jnp.ndim(a)       # associative_scan requires axis >= 0
    res = jax.lax.associative_scan(combine, (a, b), axis=axis,
                                   reverse=reverse)
    return res[1]


def mobius_recurrence(a, b, c, axis: int = -1):
    """Solve g[i] = c[i] / (b[i] - a[i] * g[i-1]) along `axis`, g[-1] = 0.

    This is the gamma recurrence of the Thomas-LU prefactorization
    (ref :2108-2121).  Each step is the Moebius map with matrix
    [[0, c], [-a, b]]; maps compose by 2x2 matrix product, which is
    associative, so the recurrence runs as one associative scan.  Each
    composite is renormalized by its max-abs entry (scaling a Moebius
    matrix does not change the map) to keep the products in range.
    """
    p = jnp.zeros_like(a)
    q = c
    r = -a
    s = b

    def combine(prev, nxt):
        p1, q1, r1, s1 = prev
        p2, q2, r2, s2 = nxt
        # composite map = nxt o prev  (matrix M2 @ M1)
        p3 = p2 * p1 + q2 * r1
        q3 = p2 * q1 + q2 * s1
        r3 = r2 * p1 + s2 * r1
        s3 = r2 * q1 + s2 * s1
        norm = jnp.maximum(
            jnp.maximum(jnp.abs(p3), jnp.abs(q3)),
            jnp.maximum(jnp.abs(r3), jnp.abs(s3)))
        norm = jnp.where(norm > 0, norm, 1.0)
        return p3 / norm, q3 / norm, r3 / norm, s3 / norm

    res = jax.lax.associative_scan(combine, (p, q, r, s),
                                   axis=axis % jnp.ndim(a))
    _, qf, _, sf = res
    return qf / sf


def thomas_prefactor(a_mid, b_mid, c_mid):
    """LU prefactor of a tridiagonal system (interior rows only).

    Returns (alpha, gamma) with
      gamma[i] = c[i] * alpha[i]
      alpha[i] = 1 / (b[i] - a[i] * gamma[i-1]),  gamma[-1] = 0
    (ref: atm_compute_vert_imp_coefs_work :2108-2121).
    """
    gamma = mobius_recurrence(a_mid, b_mid, c_mid)
    gamma_prev = jnp.concatenate(
        [jnp.zeros_like(gamma[..., :1]), gamma[..., :-1]], axis=-1)
    alpha = 1.0 / (b_mid - a_mid * gamma_prev)
    return alpha, gamma


def thomas_solve(rhs_mid, a_mid, alpha_mid, gamma_mid):
    """Pre-factored tridiagonal solve on interior rows (boundary rows are
    identity with zero RHS, as in the acoustic w-solve).

    forward:  y[i] = (rhs[i] - a[i] * y[i-1]) * alpha[i]
    backward: x[i] = y[i] - gamma[i] * x[i+1]
    (ref: atm_advance_acoustic_step_work :2596-2604).
    """
    y = linear_recurrence(-a_mid * alpha_mid, rhs_mid * alpha_mid)
    x = linear_recurrence(-gamma_mid, y, reverse=True)
    return x
