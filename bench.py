#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Flagship config: MPAS-A dry dycore, Jablonowski-Williamson baroclinic wave
(BASELINE.json configs[1]) — split RK3, 2 acoustic substeps, 3 dynamics
substeps per step. Metric: cell-column updates/s/chip (one update = one
full split-RK3 timestep of one cell column).

vs_baseline: the reference repo publishes no numbers (BASELINE.md). The
denominator 20000 cell-columns/s is our documented estimate of the Fortran
reference on ~8 CPU cores (a 120-km JW run does ~1 step/s on a small node);
it is an anchor for trend-tracking, not a published figure.
"""

import argparse
import json
import time

BASELINE_COLUMN_UPDATES_PER_S = 2.0e4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="jw_120km",
                    choices=["jw_120km", "jw_480km", "jw_var60_15",
                             "jw_120km_nz55", "supercell_2km",
                             "ocean_channel_10km",
                             "sw_tc5_120km", "sw_tc5_480km"])
    ap.add_argument("--roofline", action="store_true",
                    help="add XLA cost-analysis flop/byte accounting")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    import numpy as np
    dtype = np.float32 if on_tpu else np.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from mpas_tpu.mesh.cache import cached
    from mpas_tpu.mesh.sphere import icosahedral_mesh

    def cast(tree):
        return jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a, dtype=dtype))
            if np.issubdtype(np.asarray(a).dtype, np.floating)
            else jnp.asarray(a), tree)

    if args.config.startswith("jw"):
        from mpas_tpu.cores.atmosphere.config import AtmConfig
        from mpas_tpu.cores.atmosphere.init_jw import init_jw
        from mpas_tpu.cores.atmosphere.time_integration import (init_carry,
                                                                run_steps)
        radius = None
        scale_with_mesh = False
        if args.config == "jw_120km":
            mesh0 = cached("icos64_l4",
                           lambda: icosahedral_mesh(64, lloyd_iters=4))
            dt, len_disp = 720.0, 120000.0
        elif args.config == "jw_var60_15":
            # BASELINE coverage config 5: variable-resolution 60-15 km full
            # dycore. DCMIP-style reduced-radius planet (R_earth/4) so the
            # 4:1 refined SCVT carries true 60 km coarse / 15 km fine cell
            # widths at a single-chip cell count; dt per the fine-cell CFL.
            from mpas_tpu.mesh.varres import variable_res_mesh
            mesh0 = cached("varres23k_r4",
                           lambda: variable_res_mesh(23000, iterations=30))
            dt, len_disp = 90.0, 15000.0
            radius = 6371229.0 / 4.0
            scale_with_mesh = True
        else:
            mesh0 = cached("icos16_l4",
                           lambda: icosahedral_mesh(16, lloyd_iters=4))
            dt, len_disp = 2400.0, 480000.0
        nz = 55 if args.config == "jw_120km_nz55" else 26
        if args.config == "jw_120km_nz55":
            mesh0 = cached("icos64_l4",
                           lambda: icosahedral_mesh(64, lloyd_iters=4))
            dt, len_disp = 720.0, 120000.0
        cfg = AtmConfig(config_nvertlevels=nz, config_dt=dt,
                        config_len_disp=len_disp,
                        config_h_ScaleWithMesh=scale_with_mesh)
        t0 = time.perf_counter()
        jw_kw = {} if radius is None else {"radius": radius}
        grid, state, diag = init_jw(mesh0, cfg, case=2, **jw_kw)
        setup_s = time.perf_counter() - t0
        grid = cast(grid)
        carry = init_carry(grid, cfg, cast(state), cast(diag), dt)
        n_cols = grid.mesh.nCells
        n_levels = cfg.config_nvertlevels

        def run(n):
            out = run_steps(grid, cfg, carry, dt, n)
            return out.state.u

        def lower_run(n):
            return run_steps.lower(grid, cfg, carry, dt, n)
    elif args.config == "supercell_2km":
        # BASELINE coverage config 3: idealized supercell with monotonic
        # moist (Kessler) transport on a doubly periodic 2-km planar mesh
        from mpas_tpu.cores.atmosphere.config import AtmConfig
        from mpas_tpu.cores.atmosphere.init_supercell import init_supercell
        from mpas_tpu.cores.atmosphere.time_integration import (init_carry,
                                                                run_steps)
        from mpas_tpu.mesh.planar import planar_hex_mesh
        cfg = AtmConfig(config_dt=12.0, config_nvertlevels=40,
                        config_len_disp=2000.0, config_xnutr=0.0,
                        config_microp_scheme="mp_kessler",
                        config_monotonic=True)
        t0 = time.perf_counter()
        mesh0 = planar_hex_mesh(96, 96, 2000.0)
        grid, state, diag = init_supercell(mesh0, cfg, case=5)
        setup_s = time.perf_counter() - t0
        grid = cast(grid)
        dt = cfg.config_dt
        carry = init_carry(grid, cfg, cast(state), cast(diag), dt)
        n_cols = grid.mesh.nCells
        n_levels = cfg.config_nvertlevels

        def run(n):
            out = run_steps(grid, cfg, carry, dt, n)
            return out.state.u

        def lower_run(n):
            return run_steps.lower(grid, cfg, carry, dt, n)
    elif args.config == "ocean_channel_10km":
        # BASELINE coverage config 4: ocean baroclinic channel,
        # split-explicit barotropic/baroclinic integrator
        from mpas_tpu.cores.ocean.core import OcnConfig
        from mpas_tpu.cores.ocean.core import run_steps as ocn_run
        from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel
        from mpas_tpu.mesh.planar import channel_hex_mesh
        t0 = time.perf_counter()
        mesh0 = channel_hex_mesh(32, 200, 10000.0)
        ogrid, ostate = init_baroclinic_channel(mesh0, nz=20)
        setup_s = time.perf_counter() - t0
        ocfg = OcnConfig(config_dt=300.0,
                         config_time_integrator="split_explicit")
        ogrid = cast(ogrid)
        ostate = cast(ostate)
        if ostate.ubtr is None:
            ostate = ostate.replace(ubtr=jnp.zeros(ogrid.mesh.nEdges,
                                                   dtype=dtype))
        n_cols = ogrid.mesh.nCells
        n_levels = ogrid.nz
        dt = ocfg.config_dt

        def run(n):
            return ocn_run(ogrid, ocfg, ostate, n).layerThickness

        def lower_run(n):
            return ocn_run.lower(ogrid, ocfg, ostate, n)
    else:
        from mpas_tpu.cores.sw.config import SWConfig
        from mpas_tpu.cores.sw.test_cases import test_case_5
        from mpas_tpu.cores.sw.time_integration import run_steps as sw_run
        from mpas_tpu.mesh.mesh import to_device
        name = "icos64_l4" if args.config == "sw_tc5_120km" else "icos16_l4"
        n = 64 if args.config == "sw_tc5_120km" else 16
        mesh0 = cached(name, lambda: icosahedral_mesh(n, lloyd_iters=4))
        dtv = 45.0 if n == 64 else 172.8
        mesh, state, h_s = test_case_5(mesh0)
        cfg = SWConfig(config_dt=dtv, config_test_case=5)
        mesh = to_device(mesh, dtype=dtype)
        state = cast(state)
        h_s = jnp.asarray(np.asarray(h_s, dtype=dtype))
        n_cols = mesh.nCells
        n_levels = 1
        setup_s = 0.0

        def run(nn):
            return sw_run(mesh, cfg, state, h_s, nn).h

        def lower_run(nn):
            return sw_run.lower(mesh, cfg, state, h_s, nn)

    # XLA cost-analysis roofline accounting: lowering the same jitted
    # callable the timing uses populates the jit cache, so this costs no
    # extra compile. 'bytes accessed' counts every HLO operand/result and
    # is an UPPER BOUND on HBM traffic (fusion keeps intermediates in
    # VMEM/registers); flops is exact. The workload is a gather/stencil
    # streaming code: arithmetic intensity ~0.02 flop/byte, so the roof
    # is HBM bandwidth, not the MXU.
    roofline = {}
    try:
        compiled = lower_run(args.steps).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        roofline = {
            "flops_per_step": float(ca.get("flops", 0.0)) / args.steps,
            "hbm_bytes_upper_bound_per_step":
                float(ca.get("bytes accessed", 0.0)) / args.steps,
        }
    except Exception as e:   # cost analysis unsupported on a backend
        roofline = {"roofline_error": str(e)[:120]}

    def timed(n):
        # NOTE: on the axon TPU platform block_until_ready() does not block;
        # a device->host transfer is the reliable sync.
        out = run(n)
        h = np.asarray(out)
        assert np.all(np.isfinite(h)), "benchmark produced NaNs"
        t0 = time.perf_counter()
        np.asarray(run(n))
        return time.perf_counter() - t0

    t1 = timed(args.steps)
    t2 = timed(2 * args.steps)
    elapsed = max(t2 - t1, 1e-9)
    value = n_cols * args.steps / elapsed
    print(json.dumps({
        "metric": "cell_column_updates_per_s_per_chip",
        "value": value,
        "unit": "cell-columns/s",
        "vs_baseline": value / BASELINE_COLUMN_UPDATES_PER_S,
        "config": args.config,
        "device": str(dev),
        "steps": args.steps,
        "elapsed_s": elapsed,
        "n_cells": n_cols,
        "n_levels": n_levels,
        "setup_s": setup_s,
        **roofline,
        **({"mfu_or_bw_util":
            roofline["hbm_bytes_upper_bound_per_step"]
            / (elapsed / args.steps) / 8.19e11,
            "bw_util_note":
            "upper-bound HBM-byte count / measured step time / 819 GB/s "
            "(v5e peak); >1 means fusion kept that fraction in VMEM"}
           if "hbm_bytes_upper_bound_per_step" in roofline else {}),
    }))


if __name__ == "__main__":
    main()
