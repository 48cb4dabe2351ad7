#!/usr/bin/env python
"""Dump the optimized HLO of the jw step and rank reshape/copy/transpose
instructions by byte volume, with source attribution (metadata op_name),
to find the remaining layout-change traffic after the slot-major
relayout."""
import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.init_jw import init_jw
from mpas_tpu.cores.atmosphere.time_integration import init_carry, run_steps
from mpas_tpu.mesh.cache import cached
from mpas_tpu.mesh.sphere import icosahedral_mesh

DT = {"f32": 4, "f64": 8, "s32": 4, "s64": 8, "pred": 1, "bf16": 2,
      "u32": 4, "s8": 1, "u8": 1}


def shape_bytes(s):
    tot = 0
    for m in re.finditer(r"(f32|f64|bf16|s32|s64|u32|pred|s8|u8)"
                         r"\[([0-9,]*)\]", s):
        dims = m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        tot += n * DT[m.group(1)]
    return tot


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mesh0 = cached(f"icos{n}_l4", lambda: icosahedral_mesh(n, lloyd_iters=4))
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
    lowered = jax.jit(run_steps, static_argnums=(1, 4)).lower(
        grid, cfg, carry, dt, 1)
    txt = lowered.compile().as_text()
    print(f"HLO text {len(txt)/1e6:.1f} MB")

    kinds = ("reshape(", "copy(", "transpose(", "scatter(", "gather(")
    per_src = defaultdict(lambda: [0, 0.0])
    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?([a-z\-_]+)[\.0-9]* = (.*)", ls)
        if not m:
            continue
        op = m.group(1)
        if not any(ls.find(k) > 0 for k in kinds):
            continue
        if op not in ("reshape", "copy", "transpose", "scatter", "gather",
                      "fusion"):
            continue
        # fusion lines mentioning reshape inside are skipped here; only
        # standalone ops
        if op == "fusion":
            continue
        b = shape_bytes(ls.split(" = ")[1].split(",")[0])
        mm = re.search(r'op_name="([^"]*)"', ls)
        src = mm.group(1) if mm else "?"
        sf = re.search(r'source_file="([^"]*)".*source_line=(\d+)', ls)
        loc = f"{sf.group(1).split('/')[-1]}:{sf.group(2)}" if sf else ""
        key = (op, src[-90:], loc)
        per_src[key][0] += 1
        per_src[key][1] += b
    rows = sorted(per_src.items(), key=lambda kv: -kv[1][1])[:30]
    print(f"{'op':10s} {'count':>5s} {'MB':>9s}  source")
    for (op, src, loc), (cnt, b) in rows:
        print(f"{op:10s} {cnt:5d} {b/1e6:9.1f}  {loc}  {src}")


if __name__ == "__main__":
    main()
