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
                             "sw_tc5_120km", "sw_tc5_480km"])
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
        cfg = AtmConfig(config_nvertlevels=26, config_dt=dt,
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
    }))


if __name__ == "__main__":
    main()
