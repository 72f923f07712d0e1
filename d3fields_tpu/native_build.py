"""Shared g++ build-and-load bridge for the native/ C++ runtime.

One place for the compile command, mtime staleness check, process-wide
lock, and atomic .so replacement used by every ctypes binding
(``mesh/_native.py``, ``ops/pointcloud_native.py``). Python<->C++ binding
is plain ctypes per the framework's no-pybind11 policy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Dict, Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE_DIR = os.path.join(_REPO_ROOT, "native")

_LOCK = threading.Lock()
_cache: Dict[str, Optional[ctypes.CDLL]] = {}


def load_native(
    src_name: str,
    lib_name: str,
    declare: Callable[[ctypes.CDLL], None],
    *,
    required: bool,
) -> Optional[ctypes.CDLL]:
    """Build ``native/<src_name>`` into ``native/<lib_name>`` (first use or
    stale mtime) and return the loaded CDLL with ``declare`` applied.

    ``required=True`` propagates build/load errors; ``required=False``
    warns once and returns None so callers can take a numpy fallback.
    The build writes to a temp path and ``os.replace``s it so concurrent
    processes never load a half-written library.
    """
    src = os.path.join(NATIVE_DIR, src_name)
    lib_path = os.path.join(NATIVE_DIR, lib_name)
    with _LOCK:
        if lib_name in _cache:
            return _cache[lib_name]
        try:
            if (not os.path.exists(lib_path)) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(lib_path)
            ):
                tmp = f"{lib_path}.build.{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     src, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, lib_path)
            lib = ctypes.CDLL(lib_path)
            declare(lib)
            _cache[lib_name] = lib
        except Exception as e:
            if required:
                raise
            import warnings

            detail = ""
            if isinstance(e, subprocess.CalledProcessError):
                detail = (e.stderr or b"").decode(errors="replace")[:500]
            warnings.warn(
                f"native library {lib_name} unavailable; falling back to "
                f"slower numpy paths ({type(e).__name__}: {detail})"
            )
            _cache[lib_name] = None
        return _cache[lib_name]
