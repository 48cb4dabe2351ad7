#!/usr/bin/env python
"""Capture a device trace of the jw_120km step and print the per-op-class
cost breakdown (PERF.md round-4 methodology: jax.profiler.trace ->
parse the .trace.json.gz directly)."""
import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.init_jw import init_jw
from mpas_tpu.cores.atmosphere.time_integration import init_carry, run_steps
from mpas_tpu.mesh.cache import cached
from mpas_tpu.mesh.sphere import icosahedral_mesh


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jwtrace"
    nsteps = 3
    mesh0 = cached("icos64_l4", lambda: icosahedral_mesh(64, lloyd_iters=4))
    cfg = AtmConfig(config_nvertlevels=26, config_dt=720.0,
                    config_len_disp=120000.0)
    grid, state, diag = init_jw(mesh0, cfg, case=2)
    cast = lambda t: jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32))
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), t)
    grid = cast(grid)
    carry = init_carry(grid, cfg, cast(state), cast(diag), cfg.config_dt)
    dt = jnp.float32(cfg.config_dt)
    out = run_steps(grid, cfg, carry, dt, nsteps)      # compile+warm
    np.asarray(out.state.theta_m[0, 0])
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        out = run_steps(grid, cfg, carry, dt, nsteps)
        np.asarray(out.state.theta_m[0, 0])
    wall = time.perf_counter() - t0
    print(f"wall for {nsteps} steps: {wall:.3f}s "
          f"({wall/nsteps*1e3:.1f} ms/step)")

    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    files.sort(key=lambda f: -len(gzip.open(f).read()))
    ev = json.load(gzip.open(files[0]))["traceEvents"]
    # device-side complete events: pid of device lanes carry 'dur'
    cat = defaultdict(float)
    name_cost = defaultdict(float)
    total = 0.0
    nops = 0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        nm = e.get("name", "")
        args = e.get("args", {})
        hlo = args.get("hlo_op", nm) if isinstance(args, dict) else nm
        tid_name = ""
        if not re.match(r"^(fusion|copy|gather|scatter|reshape|transpose|"
                        r"dynamic|convert|select|broadcast|reduce|concat|"
                        r"slice|multiply|add|subtract|divide|dot|iota|"
                        r"bitcast|pad|rsqrt|compare|tuple|while|custom)",
                        nm):
            continue
        d = e["dur"] / 1e6  # us -> s
        total += d
        nops += 1
        cls = re.match(r"[a-z_\-]+", nm).group(0).rstrip("_-")
        cat[cls] += d
        name_cost[nm.split(".")[0]] += d
    print(f"device ops: {nops} total {total:.3f}s "
          f"({total/nsteps*1e3:.1f} ms/step)")
    print("-- by op class (ms/step) --")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {k:28s} {v/nsteps*1e3:9.2f}")
    print("-- top named ops (ms/step) --")
    for k, v in sorted(name_cost.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {k:44s} {v/nsteps*1e3:9.3f}")


if __name__ == "__main__":
    main()
