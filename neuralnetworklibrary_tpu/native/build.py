"""Lazy g++ build + ctypes loading for the native components.

Sources compile once into ``<package>/native/_<name>.so`` (rebuilt when the
source is newer).  ``load_library`` returns None when compilation fails —
callers keep a pure-python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_lock = threading.Lock()
_cache: dict = {}


def _build(name: str) -> str | None:
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_DIR, f"_{name}.so")
    if not os.path.isfile(src):
        return None
    if os.path.isfile(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out, src],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except Exception:
        try:  # -march=native can fail on exotic hosts; retry generic
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
                check=True, capture_output=True, timeout=120,
            )
            return out
        except Exception:
            return None


def load_library(name: str):
    """ctypes.CDLL for native/<name>.cpp, building if needed; None on failure."""
    with _lock:
        if name in _cache:
            return _cache[name]
        path = _build(name)
        lib = None
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                lib = None
        _cache[name] = lib
        return lib
