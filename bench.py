#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Current flagship config: shallow-water TC5 on the 480 km quasi-uniform
icosahedral mesh (BASELINE.json configs[0]); switches to the MPAS-A JW
120 km dry dycore once that core lands. Metric: cell-column updates/s/chip.

vs_baseline: the reference repo publishes no numbers (BASELINE.md). The
denominator 2.0e6 cell-column-updates/s is our documented estimate of the
Fortran reference on one modern CPU node for this config (O(2562 cells /
~1ms per RK4 step-equivalent per core-group)); it is a placeholder anchor,
not a published figure — the real target is parity+ on identical hardware.
"""

import argparse
import json
import time

BASELINE_CELL_UPDATES_PER_S = 2.0e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sw_tc5_120km",
                    choices=["sw_tc5_480km", "sw_tc5_120km"])
    ap.add_argument("--steps", type=int, default=100)
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
    from mpas_tpu.mesh.mesh import to_device
    from mpas_tpu.mesh.sphere import icosahedral_mesh
    from mpas_tpu.cores.sw.config import SWConfig
    from mpas_tpu.cores.sw.test_cases import test_case_5
    from mpas_tpu.cores.sw.time_integration import run_steps

    if args.config == "sw_tc5_480km":
        mesh0 = cached("icos16_l4",
                       lambda: icosahedral_mesh(16, lloyd_iters=4))
        dt = 172.8
    else:  # sw_tc5_120km: the 40962-cell 120 km-class mesh
        mesh0 = cached("icos64_l4",
                       lambda: icosahedral_mesh(64, lloyd_iters=4))
        dt = 45.0
    mesh, state, h_s = test_case_5(mesh0)
    cfg = SWConfig(config_dt=dt, config_test_case=5)

    mesh = to_device(mesh, dtype=dtype)
    state = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, dtype=dtype)),
                         state)
    h_s = jnp.asarray(np.asarray(h_s, dtype=dtype))

    n_levels = 1

    def timed(n):
        # NOTE: on the axon TPU platform block_until_ready() does not block;
        # a device->host transfer is the reliable sync.
        out = run_steps(mesh, cfg, state, h_s, n)
        h = np.asarray(out.h)
        assert np.all(np.isfinite(h)), "benchmark produced NaNs"
        t0 = time.perf_counter()
        out = run_steps(mesh, cfg, state, h_s, n)
        np.asarray(out.h)
        return time.perf_counter() - t0

    # marginal cost: strip dispatch/transfer overhead with two sizes
    t1 = timed(args.steps)
    t2 = timed(2 * args.steps)
    elapsed = max(t2 - t1, 1e-9)
    value = mesh.nCells * n_levels * args.steps / elapsed
    print(json.dumps({
        "metric": "cell_column_updates_per_s_per_chip",
        "value": value,
        "unit": "cell-columns/s",
        "vs_baseline": value / BASELINE_CELL_UPDATES_PER_S,
        "config": args.config,
        "device": str(dev),
        "steps": args.steps,
        "elapsed_s": elapsed,
        "n_cells": mesh.nCells,
    }))


if __name__ == "__main__":
    main()
