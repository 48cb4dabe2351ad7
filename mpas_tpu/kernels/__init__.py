"""Pallas TPU kernels (used by the compute cores on TPU backends)."""

_ACOUSTIC_ENABLED = None


def acoustic_kernel_enabled() -> bool:
    """Whether acoustic_step uses the fused Pallas column kernel.

    Default OFF: measured on JW-120km (40962 cells x 26 levels, TPU v5e)
    the kernel reaches 46.1k cell-columns/s vs 56.0k for the XLA path —
    nz=26 columns occupy 26/128 lanes of each vector register, so the
    in-kernel scans waste ~80% of the VPU while XLA's fusion of the same
    chain is already near memory bandwidth. The kernel remains available
    (override_acoustic_kernel(True)) and is verified bitwise against the
    jnp path; it becomes profitable for nz >= ~100 configurations."""
    global _ACOUSTIC_ENABLED
    if _ACOUSTIC_ENABLED is None:
        _ACOUSTIC_ENABLED = False
    return _ACOUSTIC_ENABLED


def override_acoustic_kernel(value):
    """Force-enable/disable (tests); None restores auto-detection."""
    global _ACOUSTIC_ENABLED
    _ACOUSTIC_ENABLED = value
