"""Physical and numerical constants.

TPU-native re-implementation of the reference constant module
(ref: src/framework/mpas_constants.F:25-37 and src/framework/mpas_kind_types.F).

Unlike the reference (compile-time RKIND selection between single/double via
the SINGLE_PRECISION cpp flag), precision here is a runtime choice carried by
``mpas_tpu.config`` — float32 on TPU for speed, float64 on CPU for
reference-parity tests (enable with jax.config.update('jax_enable_x64', True)).
"""

import numpy as np

# --- physical constants (ref: mpas_constants.F:25-37) ---
pii = 3.141592653589793          # pi
a = 6371229.0                    # spherical Earth radius [m]
omega = 7.29212e-5               # Earth angular rotation rate [s-1]
gravity = 9.80616                # acceleration due to gravity [m s-2]
rgas = 287.0                     # gas constant, dry air [J kg-1 K-1]
rv = 461.6                       # gas constant, water vapor [J kg-1 K-1]
rvord = rv / rgas
cp = 7.0 * rgas / 2.0            # specific heat, dry air, const pressure
cv = cp - rgas                   # specific heat, dry air, const volume
cvpm = -cv / cp
prandtl = 1.0

# p0 reference pressure used throughout the atmosphere core
# (ref: src/core_atmosphere/dynamics/mpas_atm_time_integration.F uses 1.e5)
p0 = 1.0e5

# String-kind equivalent is irrelevant in Python; retained for parity notes:
# ref mpas_kind_types.F: StrKIND=512.
StrKIND = 512


def default_dtype():
    """The working real dtype (RKIND equivalent)."""
    from mpas_tpu import config as _config
    return _config.get_dtype()


def as_real(x):
    """Cast a numpy array/scalar to the working real dtype."""
    return np.asarray(x, dtype=default_dtype())
