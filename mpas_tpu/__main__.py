"""Command-line model driver.

ref: src/driver/mpas.F + the -n/-s flags of mpas_subdriver.F:110-141.

    python -m mpas_tpu <core> [-n namelist] [-s streams.xml]
                       [--mesh icos:16|hex:NX,NY,DC|channel:NX,NY,DC]
                       [--duration D_HH:MM:SS] [--dt SECONDS]

Cores: sw (shallow water), atmosphere (nonhydrostatic JW), ocean
(baroclinic channel).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mpas_tpu")
    ap.add_argument("core", choices=["sw", "atmosphere", "ocean", "test"])
    ap.add_argument("-n", "--namelist", default=None,
                    help="Fortran-namelist-format config file")
    ap.add_argument("-s", "--streams", default=None,
                    help="streams.<core> XML file")
    ap.add_argument("--mesh", default=None,
                    help="mesh spec (icos:N | hex:NX,NY,DC | channel:NX,NY,DC)")
    ap.add_argument("--duration", default=None)
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--run-dir", default=".")
    ap.add_argument("--x64", action="store_true",
                    help="run in float64 (implies --cpu)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args(argv)

    import jax
    if args.x64 or args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    if args.core == "test":
        # framework self-test core (ref: core_test, mpas_test_core.F:86-171)
        from mpas_tpu.cores.test_core.core import run_all
        results = run_all()
        return 0 if all(ok for ok, _ in results.values()) else 1

    from mpas_tpu.framework.driver import Driver
    from mpas_tpu.framework.namelist import from_namelist_file
    from mpas_tpu.framework.streams import parse_streams_xml

    if args.core == "sw":
        from mpas_tpu.cores.sw.hooks import HOOKS, default_mesh
    elif args.core == "atmosphere":
        from mpas_tpu.cores.atmosphere.hooks import HOOKS, default_mesh
    else:
        from mpas_tpu.cores.ocean.hooks import HOOKS, default_mesh

    if args.namelist:
        cfg = from_namelist_file(HOOKS.config_cls, args.namelist)
    else:
        cfg = HOOKS.config_cls()
    overrides = {}
    if args.duration:
        overrides["config_run_duration"] = args.duration
    if args.dt:
        overrides["config_dt"] = args.dt
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    streams = parse_streams_xml(args.streams) if args.streams else None
    mesh_spec = args.mesh or default_mesh(cfg)

    driver = Driver(HOOKS, cfg, run_dir=args.run_dir, streams=streams,
                    mesh_spec=mesh_spec)
    driver.init().run().finalize()
    return 0


if __name__ == "__main__":
    sys.exit(main())
