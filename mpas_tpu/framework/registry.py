"""Python interface to the native registry compiler.

ref: the registry toolchain capability (SURVEY §2.2): single declarative
schema -> config parsing + field allocation + stream contents + package
gating. The native binary (tools/registry/registry_compiler.cpp, C++) parses
Registry.xml and emits a Python config dataclass, a JSON field schema, and
default namelist/streams run files.
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile

_TOOL_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "tools",
                         "registry")
_BIN = os.path.join(_TOOL_DIR, "registry_compiler")


def ensure_built():
    if not os.path.exists(_BIN):
        subprocess.run(["make", "-C", _TOOL_DIR], check=True,
                       capture_output=True)
    return _BIN


def _run(registry_xml: str, mode: str) -> str:
    binp = ensure_built()
    out = subprocess.run([binp, registry_xml, mode], check=True,
                         capture_output=True, text=True)
    return out.stdout


def load_schema(registry_xml: str) -> dict:
    """Parsed field/dim/package/stream schema of a Registry.xml."""
    return json.loads(_run(registry_xml, "--schema-json"))


def generate_config_class(registry_xml: str):
    """Compile and import the namelist dataclass for a Registry.xml."""
    src = _run(registry_xml, "--config-py")
    ns: dict = {}
    exec(compile(src, "<registry_config>", "exec"), ns)
    return ns["Config"]


def generate_default_namelist(registry_xml: str) -> str:
    return _run(registry_xml, "--namelist")


def generate_default_streams(registry_xml: str) -> str:
    return _run(registry_xml, "--streams")


def build_state_pytree(schema: dict, dim_sizes: dict,
                       active_packages=None, dtype=None):
    """Allocate the per-var_struct state pytree from a registry schema,
    honoring package gating: a var whose `packages` attribute names only
    inactive packages is NOT allocated at all (ref: gen_inc.c:478 package
    parsing + mpas_dmpar.F:5226 — inactive fields are never allocated and
    exchanges skip them).

    Returns {struct_name: {var_name: zeros(dims)}}. `dim_sizes` maps dim
    names to ints; unknown dims raise. active_packages=None activates
    everything (the reference default when no package is configured)."""
    import numpy as np
    dtype = dtype or np.float64
    active = None if active_packages is None else set(active_packages)
    out = {}
    for sname, struct in schema.get("var_structs", {}).items():
        fields = {}
        for var in struct["vars"]:
            pkgs = [p for p in (var.get("packages") or "").split(";") if p]
            if pkgs and active is not None \
                    and not (set(pkgs) & active):
                continue                        # gated out: never allocated
            dims = [d.strip() for d in var["dims"].split()
                    if d.strip()]
            try:
                shape = tuple(dim_sizes[d] for d in dims)
            except KeyError as e:
                raise KeyError(
                    f"var {var['name']}: unknown dimension {e} "
                    f"(have {sorted(dim_sizes)})") from None
            np_t = {"real": dtype, "integer": np.int32,
                    "logical": np.bool_}.get(var["type"], dtype)
            fields[var["name"]] = np.zeros(shape, dtype=np_t)
        out[sname] = fields
    return out
