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
