"""Build the native shared libraries (g++ -O2 -shared -fPIC).

Invoked lazily on first import of the native wrappers; artifacts land next
to the sources as ``lib<name>.so``.  Failures are non-fatal — every native
component has a numpy fallback with the identical contract.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))

_TARGETS = {
    "kdtree_build": ["kdtree_build.cpp"],
    "objloader": ["objloader.cpp"],
}


def lib_path(name: str) -> str:
    return os.path.join(_DIR, f"lib{name}.so")


def ensure_built(name: str) -> str | None:
    """Compile lib<name>.so if missing or older than its sources."""
    out = lib_path(name)
    srcs = [os.path.join(_DIR, s) for s in _TARGETS[name]]
    if all(os.path.exists(s) for s in srcs):
        if os.path.exists(out) and all(
            os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
        ):
            return out
        cmd = ["g++", "-O2", "-march=native", "-std=c++17", "-shared", "-fPIC",
               "-o", out, *srcs]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return out
        except Exception:
            return None
    return None
