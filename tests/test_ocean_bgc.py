"""Ocean BGC (NPZD + DMS) tracer module.

Parity model: the ecosys coupling surface (interior tendencies +
surface ventilation) with NPZD-class conservation and bloom dynamics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.ocean.bgc import (BgcParams, bgc_step, bgc_tendencies,
                                      sink_detritus)
from mpas_tpu.cores.ocean.core import OcnConfig, OcnState, run_steps
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel
from mpas_tpu.mesh.planar import channel_hex_mesh


def _bgc_state(nC=6, nz=10, with_dms=False):
    rng = np.random.default_rng(0)
    h = jnp.full((nC, nz), 20.0)
    ntr = 7 if with_dms else 6
    tr = np.zeros((nC, nz, ntr))
    tr[..., 0] = 10.0           # T
    tr[..., 1] = 35.0           # S
    tr[..., 2] = 8.0            # N
    tr[..., 3] = 0.1            # P
    tr[..., 4] = 0.05           # Z
    tr[..., 5] = 0.01           # D
    if with_dms:
        tr[..., 6] = 0.0
    return OcnState(u=jnp.zeros((1, nz)), layerThickness=h,
                    tracers=jnp.asarray(tr), ubtr=jnp.zeros((1,)))


def test_interior_tendencies_conserve_total_n():
    st = _bgc_state()
    h = st.layerThickness
    sw = jnp.full((6,), 200.0)
    dn, dp, dz, dd = bgc_tendencies(h, sw, st.tracers[..., 2],
                                    st.tracers[..., 3], st.tracers[..., 4],
                                    st.tracers[..., 5], BgcParams())
    total = np.asarray(dn + dp + dz + dd)
    assert np.abs(total).max() < 1e-18        # closed N budget


def test_bloom_under_light():
    st = _bgc_state()
    sw = jnp.full((6,), 250.0)
    s = st
    for _ in range(40):
        s = bgc_step(s, None, 3600.0, sw)
    p0 = float(jnp.mean(st.tracers[:, 0, 3]))
    p1 = float(jnp.mean(s.tracers[:, 0, 3]))
    assert p1 > 2.0 * p0                      # surface bloom
    assert float(jnp.mean(s.tracers[:, 0, 2])) \
        < float(jnp.mean(st.tracers[:, 0, 2]))   # nutrient drawdown
    # deep layers barely grow (light-limited)
    assert float(jnp.mean(s.tracers[:, -1, 3])) < 2.0 * p0


def test_detritus_sinks_and_exports():
    st = _bgc_state()
    h = st.layerThickness
    d = jnp.zeros_like(h).at[:, 0].set(1.0)
    out = d
    for _ in range(30):
        out = sink_detritus(out, h, 50.0 / 86400.0, 3600.0)
    col0 = float(jnp.sum(d * h, axis=-1).mean())
    col1 = float(jnp.sum(out * h, axis=-1).mean())
    assert float(out[:, 0].mean()) < 0.05     # left the surface
    assert col1 <= col0 + 1e-12               # only export, no creation
    assert float(out[:, -1].mean()) > 0.0     # reached depth


def test_dms_produced_and_ventilated():
    st = _bgc_state(with_dms=True)
    sw = jnp.full((6,), 250.0)
    s = st
    for _ in range(30):
        s = bgc_step(s, None, 3600.0, sw, with_dms=True)
    dms = np.asarray(s.tracers[..., 6])
    assert dms.max() > 0.0                    # grazing produces DMS
    # ventilation keeps the surface below the subsurface max
    assert dms[:, 0].mean() <= dms.max() + 1e-12
