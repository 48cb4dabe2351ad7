"""Pallas TPU kernels (used by the compute cores on TPU backends)."""

_ACOUSTIC_OVERRIDE = None

# Shape threshold for the fused acoustic column kernel, set from
# measurement on TPU v5e (jw-120km mesh, 40962 cells):
#   nz=26: kernel 46.1k col/s vs XLA 56.0k  -> XLA wins (the column
#          occupies 26/128 lanes; the in-kernel scans idle ~80% of the
#          VPU while XLA's fusion is already near memory bandwidth)
#   nz=55: kernel 69.9k col/s vs XLA 54.3k  -> kernel wins 1.29x
# Real MPAS-A runs use 55+ levels, so production configs take the kernel.
ACOUSTIC_NZ_THRESHOLD = 40


def acoustic_kernel_enabled(nz=None) -> bool:
    """Whether acoustic_step uses the fused Pallas column kernel.

    Auto mode (no override): on TPU backends with nz >= 40 — the
    measured crossover (see ACOUSTIC_NZ_THRESHOLD). The kernel is
    verified bitwise against the jnp path at all shapes
    (tests/test_acoustic_kernel)."""
    if _ACOUSTIC_OVERRIDE is not None:
        return _ACOUSTIC_OVERRIDE
    if nz is None or nz < ACOUSTIC_NZ_THRESHOLD:
        return False
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def override_acoustic_kernel(value):
    """Force-enable/disable (tests); None restores auto-detection."""
    global _ACOUSTIC_OVERRIDE
    _ACOUSTIC_OVERRIDE = value
