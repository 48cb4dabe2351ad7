"""Small-matrix utilities (API parity shim).

ref: src/operators/mpas_matrix_operations.F (rotations :xx, Gaussian
elimination mpas_migs/mpas_elgs :456,501). On TPU these map to
jnp.linalg / explicit formulas; kept as named functions for parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_matrix_2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def rotation_about_axis_3d(axis, theta):
    """Rodrigues rotation matrix about a unit axis."""
    axis = axis / jnp.linalg.norm(axis)
    x, y, z = axis[0], axis[1], axis[2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    C = 1.0 - c
    return jnp.array([[c + x * x * C, x * y * C - z * s, x * z * C + y * s],
                      [y * x * C + z * s, c + y * y * C, y * z * C - x * s],
                      [z * x * C - y * s, z * y * C + x * s, c + z * z * C]])


def solve_linear(A, b):
    """Dense solve (mpas_migs equivalent); batched over leading dims."""
    return jnp.linalg.solve(A, b)


def tridiagonal_solve(a, b, c, d):
    """Thomas algorithm over the last axis (static length), batched.
    a: sub-diagonal (first entry unused), b: diagonal, c: super-diagonal
    (last entry unused), d: rhs."""
    n = d.shape[-1]
    cp = [None] * n
    dp = [None] * n
    cp[0] = c[..., 0] / b[..., 0]
    dp[0] = d[..., 0] / b[..., 0]
    for i in range(1, n):
        den = b[..., i] - a[..., i] * cp[i - 1]
        cp[i] = jnp.where(i < n - 1, c[..., i] / den, 0.0)
        dp[i] = (d[..., i] - a[..., i] * dp[i - 1]) / den
    out = [None] * n
    out[n - 1] = dp[n - 1]
    for i in range(n - 2, -1, -1):
        out[i] = dp[i] - cp[i] * out[i + 1]
    return jnp.stack(out, axis=-1)
