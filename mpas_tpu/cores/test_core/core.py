"""Test core: the framework self-test suite as a runnable core.

ref: src/core_test/mpas_test_core.F:86-171 — a full core whose core_run IS
the test suite: sorting, geometry/vector operator unit tests, threaded
halo-exchange correctness, field copy/compare, stream I/O round-trips,
timekeeping interval arithmetic. Results log SUCCESS/FAILURE per test.

Run via `run_all()` (returns {name: (ok, detail)}) or the CLI
(`python -m mpas_tpu test`). The pytest harness wraps the same entries
(tests/test_framework_selftest.py), matching the reference's dual role of
core_test as both an executable and the regression gate.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def test_sorting():
    """ref: mpas_test_core_sorting.F:33 — sort + index-sort correctness
    on random and adversarial inputs (the framework uses numpy's sorts;
    this validates the contract the reference validates for its
    quicksort)."""
    rng = np.random.default_rng(0)
    for n in (1, 2, 1000, 4096):
        a = rng.integers(-1000, 1000, n)
        s = np.sort(a)
        if not np.all(np.diff(s) >= 0):
            return False, f"sort order violated at n={n}"
        idx = np.argsort(a, kind="stable")
        if not np.all(a[idx] == s):
            return False, f"index sort mismatch at n={n}"
    return True, "sort + index sort ok"


def test_geometry():
    """ref: in-operator unit tests (mpas_geometry_utils.F:834-1596):
    spherical arcs/angles/areas, Wachspress coordinates."""
    import jax.numpy as jnp
    from mpas_tpu.ops.geometry import (arc_length, sphere_angle,
                                       triangle_signed_area_sphere,
                                       wachspress_coordinates)
    # precision-aware tolerance (the CLI may run float32; pytest runs f64)
    rtol = 1e-9 if jnp.zeros(1).dtype == jnp.float64 else 1e-5
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    c = jnp.array([0.0, 0.0, 1.0])
    # quarter-circle arc on the unit sphere
    if not np.isclose(float(arc_length(a, b)), 0.5 * np.pi, rtol=rtol):
        return False, "arc length of quarter circle wrong"
    # octant triangle: spherical excess = pi/2, all angles 90 deg
    area = float(triangle_signed_area_sphere(a, b, c))
    if not np.isclose(area, 0.5 * np.pi, rtol=rtol):
        return False, f"octant excess {area}"
    ang = float(sphere_angle(a, b, c))
    if not np.isclose(ang, 0.5 * np.pi, rtol=rtol):
        return False, f"octant angle {ang}"
    # Wachspress coordinates: polygon centroid of a square
    sq = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    lam = np.asarray(wachspress_coordinates(sq, jnp.array([0.5, 0.5])))
    if not np.allclose(lam, 0.25, rtol=rtol):
        return False, "wachspress centroid"
    return True, "geometry ok"


def test_vector_ops():
    """ref: mpas_vector_operations.F:901 unit tests — tangential
    reconstruction exactness for a uniform flow on a uniform hex mesh."""
    import jax.numpy as jnp
    from mpas_tpu.mesh.planar import planar_hex_mesh
    from mpas_tpu.ops.stencils import tangential_velocity
    mesh = planar_hex_mesh(8, 8, 1000.0)
    ang = jnp.asarray(mesh.angleEdge)
    atol = 1e-10 if ang.dtype == jnp.float64 else 1e-5
    # uniform eastward flow: u_n = cos(angle), tangential = -sin(angle)
    un = jnp.cos(ang)
    ut = tangential_velocity(mesh, un)
    err = float(jnp.max(jnp.abs(ut - (-jnp.sin(ang)))))
    if err > atol:
        return False, f"tangential reconstruct err {err}"
    return True, "vector ops ok"


def test_halo_exchange():
    """ref: mpas_test_core_halo_exch.F — N-shard halo exchange recovers
    the serial field exactly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from mpas_tpu.mesh.planar import planar_hex_mesh
    from mpas_tpu.parallel.layout import build_sharded_mesh
    from mpas_tpu.parallel.partition import sfc_partition
    from mpas_tpu.parallel.runner import (AXIS, device_mesh, halo_exchange,
                                          scatter_field, shard_leaves)

    n_parts = 4
    if jax.device_count() < n_parts:
        return True, "skipped (needs 4 devices)"
    mesh = planar_hex_mesh(8, 8, 1000.0)
    part = sfc_partition(mesh, n_parts)
    sm = build_sharded_mesh(mesh, part, halo_depth=2)
    dmesh = device_mesh(n_parts)

    glob = np.arange(mesh.nCells, dtype=np.float64)
    stacked = scatter_field(sm, glob, "cell")
    owned = np.asarray(sm.owned_cell_mask) > 0
    corrupted = np.where(owned, stacked, -1.0)

    def fn(xch_st, f_st):
        return halo_exchange(shard_leaves(xch_st), shard_leaves(f_st))[None]

    out = np.asarray(jax.jit(jax.shard_map(
        fn, mesh=dmesh,
        in_specs=(jax.tree.map(lambda _: P(AXIS), sm.cell_xch), P(AXIS)),
        out_specs=P(AXIS)))(jax.tree.map(jnp.asarray, sm.cell_xch),
                            jnp.asarray(corrupted)))
    gidx = np.asarray(sm.cell_global)
    valid = gidx >= 0
    if not np.allclose(out[valid], gidx[valid].astype(np.float64)):
        bad = int(np.sum(out[valid] != gidx[valid]))
        return False, f"halo exchange mismatch at {bad} slots"
    return True, "halo exchange ok"


def test_field_ops():
    """ref: mpas_test_core_field_tests.F — field copy/compare/shift time
    levels on the pytree state containers."""
    import jax
    import jax.numpy as jnp
    tree = {"a": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones(5)}
    copy = jax.tree.map(jnp.array, tree)
    same = all(bool(jnp.all(x == y)) for x, y in
               zip(jax.tree.leaves(tree), jax.tree.leaves(copy)))
    if not same:
        return False, "field copy mismatch"
    # time-level shift semantics: new[t-1] <- old[t]
    levs = [tree, copy]
    shifted = levs[1], levs[0]
    if shifted[0] is not copy:
        return False, "shift_time_levels order"
    return True, "field ops ok"


def test_streams_roundtrip():
    """ref: mpas_test_core_streams.F:38 — write a stream, read it back,
    bit-compare."""
    from mpas_tpu.io.netcdf import read_netcdf, write_netcdf
    rng = np.random.default_rng(1)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "stream_test.nc")
        dims = {"nCells": 10, "nVertLevels": 4}
        variables = {
            "h": (("nCells", "nVertLevels"), rng.uniform(0, 1, (10, 4))),
            "idx": (("nCells",), np.arange(10, dtype=np.int32)),
        }
        write_netcdf(path, dims, variables, attrs={"model": "mpas_tpu"})
        data, rdims, attrs = read_netcdf(path)
        if rdims["nCells"] != 10 or rdims["nVertLevels"] != 4:
            return False, "dims mismatch"
        if not np.array_equal(data["h"], variables["h"][1]):
            return False, "h not bitwise equal"
        if not np.array_equal(data["idx"], variables["idx"][1]):
            return False, "idx not equal"
        model = attrs.get("model")
        if isinstance(model, bytes):
            model = model.decode()
        if model != "mpas_tpu":
            return False, "attrs lost"
    return True, "stream round-trip ok"


def test_timekeeping():
    """ref: mpas_test_core_timekeeping_tests.F — interval arithmetic
    across calendars, alarm ringing."""
    from mpas_tpu.framework.timekeeping import (Alarm, Clock, Time,
                                                TimeInterval)
    t = Time.from_string("2000-02-28_00:00:00", calendar="gregorian")
    t2 = t + TimeInterval.from_string("1_00:00:00")
    if t2.to_string() != "2000-02-29_00:00:00":
        return False, f"gregorian leap day: {t2.to_string()}"
    t3 = Time.from_string("2001-02-28_00:00:00", calendar="gregorian") \
        + TimeInterval.from_string("1_00:00:00")
    if t3.to_string() != "2001-03-01_00:00:00":
        return False, f"gregorian non-leap: {t3.to_string()}"
    tn = Time.from_string("2000-02-28_00:00:00",
                          calendar="gregorian_noleap") \
        + TimeInterval.from_string("1_00:00:00")
    if tn.to_string() != "2000-03-01_00:00:00":
        return False, f"noleap: {tn.to_string()}"
    # interval arithmetic
    iv = TimeInterval.from_string("0_01:30:00")
    if (iv * 4).total_seconds() != 6.0 * 3600.0:
        return False, "interval multiply"
    # alarms
    clock = Clock(Time.from_string("2000-01-01_00:00:00"),
                  TimeInterval.from_seconds(1800.0))
    al = Alarm("hourly", interval=TimeInterval.from_seconds(3600.0),
               reference=Time.from_string("2000-01-01_00:00:00"))
    clock.add_alarm(al)
    rings = 0
    for _ in range(5):
        if al.is_ringing(clock.now):
            rings += 1
            al.reset(clock.now)
        clock.advance()
    if rings != 3:     # t=0h, 1h, 2h within 5 half-hour steps
        return False, f"alarm rang {rings} times, expected 3"
    return True, "timekeeping ok"


ALL_TESTS = {
    "sorting": test_sorting,
    "geometry": test_geometry,
    "vector_ops": test_vector_ops,
    "halo_exchange": test_halo_exchange,
    "field_ops": test_field_ops,
    "streams": test_streams_roundtrip,
    "timekeeping": test_timekeeping,
}


def run_all(log=print):
    """ref: test_core_run logs SUCCESS/FAILURE per test and aborts the run
    on any failure (mpas_test_core.F:86-171)."""
    results = {}
    for name, fn in ALL_TESTS.items():
        try:
            ok, detail = fn()
        except Exception as e:  # noqa: BLE001 — the suite must not abort
            ok, detail = False, f"exception: {e!r}"
        results[name] = (ok, detail)
        log(f" * {name}: {'SUCCESS' if ok else 'FAILURE'} - {detail}")
    return results
