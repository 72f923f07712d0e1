"""Shared g++ build-and-load bridge for the native/ C++ runtime.

One place for the compile command, mtime staleness check, process-wide
lock, and atomic .so replacement used by every ctypes binding
(``mesh/_native.py``, ``ops/pointcloud_native.py``). Python<->C++ binding
is plain ctypes per the framework's no-pybind11 policy.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Callable, Dict, Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
# installed-wheel location: setup.py's build hook copies native/*.cpp here
PKG_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "_native_src")

_LOCK = threading.Lock()
_cache: Dict[str, Optional[ctypes.CDLL]] = {}


def find_source(src_name: str) -> Optional[str]:
    """Locate a C++ source: repo checkout layout first (``native/``),
    then the packaged copy inside an installed wheel."""
    for d in (NATIVE_DIR, PKG_SRC_DIR):
        p = os.path.join(d, src_name)
        if os.path.exists(p):
            return p
    return None


def lib_dir_for(src_path: str) -> str:
    """Where to write the compiled ``.so``: next to the source when that
    directory is writable (the checkout case — keeps the mtime staleness
    check and reuse across venvs), else a per-user cache dir (read-only
    site-packages installs)."""
    d = os.path.dirname(src_path)
    if os.access(d, os.W_OK):
        return d
    cache = os.environ.get(
        "D3F_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "d3fields_tpu"),
    )
    os.makedirs(cache, exist_ok=True)
    return cache


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
    src = find_source(src_name)
    if src is not None:
        lib_dir = lib_dir_for(src)
        if lib_dir != os.path.dirname(src):
            # shared user cache: key the artifact by source content so
            # different installed versions never collide on one filename
            # (mtime staleness is meaningless across wheel extractions)
            with open(src, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            stem, ext = os.path.splitext(lib_name)
            lib_name = f"{stem}-{digest}{ext}"
        lib_path = os.path.join(lib_dir, lib_name)
    else:
        # no source shipped (unusual): fall back to a prebuilt .so if one
        # exists in either location
        lib_path = os.path.join(NATIVE_DIR, lib_name)
        if not os.path.exists(lib_path):
            lib_path = os.path.join(PKG_SRC_DIR, lib_name)
    with _LOCK:
        if lib_name in _cache:
            return _cache[lib_name]
        try:
            if src is None and not os.path.exists(lib_path):
                raise FileNotFoundError(
                    f"native source {src_name} not found in {NATIVE_DIR} or "
                    f"{PKG_SRC_DIR}, and no prebuilt {lib_name} exists"
                )
            if (not os.path.exists(lib_path)) or (
                src is not None
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
