"""Global runtime configuration for mpas_tpu.

Replaces the reference's compile-time RKIND / SINGLE_PRECISION switch
(ref: src/framework/mpas_kind_types.F) with a process-level dtype setting.
Core-level namelist-style configuration lives in
``mpas_tpu.framework.namelist``; this module only holds cross-cutting knobs.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

_STATE = {
    "dtype": None,   # resolved lazily
}


def set_dtype(dtype):
    """Set the working real dtype ('float32' | 'float64' | jnp dtype)."""
    _STATE["dtype"] = np.dtype(dtype)


def get_dtype():
    """Working real dtype. Defaults: float64 if jax x64 is on, else float32."""
    if _STATE["dtype"] is None:
        if jax.config.read("jax_enable_x64"):
            _STATE["dtype"] = np.dtype("float64")
        else:
            _STATE["dtype"] = np.dtype("float32")
    return _STATE["dtype"]


def index_dtype():
    """Dtype for mesh index arrays."""
    return np.dtype("int32")


def is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # no devices initialized yet
        return False
