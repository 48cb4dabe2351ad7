"""Test configuration: CPU backend with 8 virtual devices, float64 numerics.

Mirrors the reference test strategy (SURVEY.md §4): all "distributed" tests
run as N-way decompositions on one box (the reference uses `mpirun -n {4,8}`;
here a virtual 8-device CPU mesh), and correctness is output invariance
across decompositions, restarts, and precision modes.
"""

import os

# must run before the first jax backend use (this image pre-imports jax with
# JAX_PLATFORMS=axon from sitecustomize, so env vars alone are NOT enough —
# jax.config.update is authoritative)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

from mpas_tpu.mesh.planar import planar_hex_mesh
from mpas_tpu.mesh.sphere import icosahedral_mesh

_CACHE = {}


@pytest.fixture(scope="session")
def hex_mesh_small():
    if "hex_small" not in _CACHE:
        _CACHE["hex_small"] = planar_hex_mesh(8, 8, 1000.0)
    return _CACHE["hex_small"]


@pytest.fixture(scope="session")
def sphere_mesh_small():
    if "sphere_small" not in _CACHE:
        _CACHE["sphere_small"] = icosahedral_mesh(8, lloyd_iters=2)
    return _CACHE["sphere_small"]


@pytest.fixture(scope="session")
def sphere_mesh_medium():
    if "sphere_medium" not in _CACHE:
        _CACHE["sphere_medium"] = icosahedral_mesh(16, lloyd_iters=2)
    return _CACHE["sphere_medium"]


# ---------------------------------------------------------------------------
# test tiers: `pytest -m "not slow"` is the <2-minute smoke tier; the full
# suite (~20 min) is CI's job. Step-heavy end-to-end tests are auto-marked
# slow by file; fast representatives are kept out of the list explicitly.
# ---------------------------------------------------------------------------

_SLOW_FILES = {
    "test_atm_core.py", "test_atm_distributed.py", "test_atm_mtn_wave.py",
    "test_atm_physics.py", "test_atm_physics_suite.py",
    "test_atm_scheme_variants.py", "test_atm_noah_rrtmg.py",
    "test_atm_regional.py", "test_atm_diagnostics.py", "test_driver.py",
    "test_init_real.py", "test_init_atmosphere.py",
    "test_seaice_thermo.py", "test_seaice_forcing.py",
    "test_seaice_remap.py", "test_seaice_core.py",
    "test_ocean_core.py", "test_ocean_init_configs.py",
    "test_ocean_forcing.py", "test_ocean_gm.py", "test_ocean_kpp.py",
    "test_ocean_tracer_extras.py", "test_ocean_particles.py",
    "test_ocean_analysis.py", "test_ocean_vmix_eos.py",
    "test_landice_core.py", "test_landice_enthalpy_ir.py",
    "test_landice_external.py", "test_landice_hydro.py",
    "test_rbf.py", "test_parity_dycore.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
