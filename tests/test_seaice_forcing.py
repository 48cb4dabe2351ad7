"""Sea-ice forcing adapter over the framework forcing machinery.

Parity model: mpas_seaice_forcing.F — 6-hourly atmospheric group with
linear interpolation feeding the coupling fields; restart bookkeeping."""

import numpy as np
import pytest

from mpas_tpu.cores.seaice.forcing_adapter import SeaiceForcingManager
from mpas_tpu.framework.timekeeping import Time
from mpas_tpu.io.netcdf import write_netcdf


def _write(path, times, fields):
    n = len(times)
    xt = np.zeros((n, 64), dtype="S1")
    for i, t in enumerate(times):
        for j, ch in enumerate(t):
            xt[i, j] = ch.encode()
    nC = len(next(iter(fields.values()))[0])
    variables = {"xtime": (("Time", "StrLen"), xt)}
    for name, vals in fields.items():
        variables[name] = (("Time", "nCells"),
                           np.asarray(vals, dtype=np.float64))
    write_netcdf(str(path), {"Time": n, "StrLen": 64, "nCells": nC},
                 variables)


@pytest.fixture
def atm_file(tmp_path):
    p = tmp_path / "atm_forcing.nc"
    times = ["0000-01-01_00:00:00", "0000-01-01_06:00:00",
             "0000-01-01_12:00:00"]
    _write(p, times, {
        "uAirVelocity": [[0.0, 0.0], [6.0, 12.0], [12.0, 24.0]],
        "vAirVelocity": [[1.0, 1.0], [1.0, 1.0], [1.0, 1.0]],
        "airTemperature": [[-10.0, -20.0], [-4.0, -14.0], [2.0, -8.0]],
        "shortwaveDown": [[0.0, 0.0], [100.0, 100.0], [300.0, 300.0]],
        "longwaveDown": [[250.0, 250.0]] * 3,
    })
    return str(p)


def test_adapter_interpolates_to_coupling_fields(atm_file):
    mgr = SeaiceForcingManager(atm_file=atm_file)
    frc = mgr.get(Time.from_string("0000-01-01_03:00:00"),
                  n_cells=2, n_vertices=5)
    np.testing.assert_allclose(np.asarray(frc.uAirVelocity), [3.0, 6.0])
    np.testing.assert_allclose(np.asarray(frc.airTemperature),
                               [-7.0, -17.0])
    # fields with no group default to zeros / freezing SST
    assert np.allclose(np.asarray(frc.uOceanVelocity), 0.0)
    assert np.allclose(np.asarray(frc.seaSurfaceTemperature), -1.8)
    assert frc.sshGradientU.shape == (5,)


def test_adapter_feeds_timestep(atm_file):
    import jax.numpy as jnp
    from mpas_tpu.mesh.planar import box_hex_mesh
    from mpas_tpu.cores.seaice.config import SeaiceConfig
    from mpas_tpu.cores.seaice.core import seaice_timestep
    from mpas_tpu.cores.seaice.init_square import init_square

    mesh = box_hex_mesh(8, 8, 10000.0)
    cfg = SeaiceConfig(config_dt=3600.0, config_elastic_subcycle_number=30)
    grid, state, _ = init_square(mesh, cfg)
    # forcing file with per-cell data matching the mesh
    import tempfile, os
    d = tempfile.mkdtemp()
    p = os.path.join(d, "atm.nc")
    nC = mesh.nCells
    _write(p, ["0000-01-01_00:00:00", "0000-01-02_00:00:00"], {
        "uAirVelocity": [np.full(nC, 8.0)] * 2,
        "vAirVelocity": [np.zeros(nC)] * 2,
        "airTemperature": [np.full(nC, -15.0)] * 2,
        "shortwaveDown": [np.zeros(nC)] * 2,
        "longwaveDown": [np.full(nC, 230.0)] * 2,
    })
    mgr = SeaiceForcingManager(atm_file=p)
    frc = mgr.get(Time.from_string("0000-01-01_06:00:00"),
                  mesh.nCells, mesh.nVertices)
    out, _ = seaice_timestep(grid, cfg, state, frc,
                             jnp.asarray(cfg.config_dt))
    assert bool(jnp.all(jnp.isfinite(out.uVelocity)))
    # wind from +x: ice drifts eastward
    assert float(jnp.mean(out.uVelocity)) > 0.0


def test_restart_times_recorded(atm_file):
    mgr = SeaiceForcingManager(atm_file=atm_file)
    out = mgr.restart_times(Time.from_string("0000-01-01_07:00:00"))
    assert len(out) >= 1
