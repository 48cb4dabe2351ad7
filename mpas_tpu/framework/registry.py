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
