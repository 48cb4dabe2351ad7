"""Cubic spline interpolation (vertical columns).

ref: src/operators/mpas_spline_interpolation.F (mpas_cubic_spline_coefficients
:112, mpas_interpolate_cubic_spline :271). Natural cubic splines; the
tridiagonal solve is unrolled over the (static) node count and vectorized
over leading batch dims, so whole fields of columns interpolate in one jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def cubic_spline_coefficients(x, y):
    """Second derivatives y2 at nodes for natural cubic splines.

    x: (n,) strictly increasing nodes (may be batched: (..., n));
    y: (..., n). ref: mpas_cubic_spline_coefficients :112."""
    n = x.shape[-1]
    h = x[..., 1:] - x[..., :-1]
    # tridiagonal system for y2[1..n-2]; natural BCs y2[0]=y2[n-1]=0
    a = h[..., :-1] / 6.0
    b = (h[..., :-1] + h[..., 1:]) / 3.0
    c = h[..., 1:] / 6.0
    d = (y[..., 2:] - y[..., 1:-1]) / h[..., 1:] \
        - (y[..., 1:-1] - y[..., :-2]) / h[..., :-1]
    m = n - 2
    # Thomas algorithm unrolled (m is static)
    cp = [None] * m
    dp = [None] * m
    cp[0] = c[..., 0] / b[..., 0]
    dp[0] = d[..., 0] / b[..., 0]
    for i in range(1, m):
        den = b[..., i] - a[..., i] * cp[i - 1]
        cp[i] = c[..., i] / den
        dp[i] = (d[..., i] - a[..., i] * dp[i - 1]) / den
    sol = [None] * m
    sol[m - 1] = dp[m - 1]
    for i in range(m - 2, -1, -1):
        sol[i] = dp[i] - cp[i] * sol[i + 1]
    zero = jnp.zeros_like(y[..., :1])
    return jnp.concatenate([zero] + [s[..., None] for s in sol] + [zero],
                           axis=-1)


def interpolate_cubic_spline(x, y, y2, x_eval):
    """Evaluate the spline at x_eval (..., k).
    ref: mpas_interpolate_cubic_spline :271."""
    n = x.shape[-1]
    idx = jnp.clip(jnp.searchsorted(x, x_eval, side="right") - 1, 0, n - 2)
    x0 = x[idx]
    x1 = x[idx + 1]
    h = x1 - x0
    a = (x1 - x_eval) / h
    b = (x_eval - x0) / h
    y0 = jnp.take(y, idx, axis=-1)
    y1 = jnp.take(y, idx + 1, axis=-1)
    s0 = jnp.take(y2, idx, axis=-1)
    s1 = jnp.take(y2, idx + 1, axis=-1)
    return (a * y0 + b * y1
            + ((a ** 3 - a) * s0 + (b ** 3 - b) * s1) * (h * h) / 6.0)


def interpolate_linear(x, y, x_eval):
    """Piecewise-linear interpolation (ref: mpas_linear_interp :438)."""
    return jnp.interp(x_eval, x, y)
