"""Persistent XLA executable cache for apps and driver surfaces.

First compiles through the remote TPU tunnel's compile service cost
30-120 s PER SHAPE (in-process re-runs are cached, new processes are
not). JAX's persistent compilation cache
(``jax_compilation_cache_dir``) serializes executables to disk so a new
process reuses them; on any key mismatch (jax/runtime upgrade, flag
change) it falls back to a normal compile, so enabling it is safe.

Apps/bench/entry call :func:`enable_compilation_cache` at startup.
Opt out with ``D3F_COMPILE_CACHE=0``; relocate with
``D3F_COMPILE_CACHE_DIR``. Tests deliberately do NOT enable it (the
suite measures real compilation behavior, e.g. the cache-clearing
segfault mitigation in tests/conftest.py).
"""

from __future__ import annotations

import os
from typing import Optional


def _host_signature() -> str:
    """Stable fingerprint of THIS host's CPU capabilities.

    XLA's cache key does not cover the host CPU feature set, so a CPU AOT
    executable compiled on one machine can be loaded on another that lacks
    some of its ISA extensions — the loader warns "could lead to execution
    errors such as SIGILL" (observed when a cache dir written on one driver
    host was read on a second). Namespacing the cache dir by the host's
    feature flags makes each machine's executables invisible to the others
    while keeping full reuse on the same machine.

    cpuinfo flags alone do NOT determine the AOT target: XLA:CPU bakes in
    LLVM target-feature choices (e.g. ``+prefer-no-gather``) that vary with
    the jax/jaxlib build, so the signature also folds in both versions —
    a runtime upgrade rolls the namespace instead of loading stale
    executables with "machine type doesn't match" loader errors.

    Versions + flags are still not enough: LLVM picks tuning features from
    the host CPUID (vendor/family/model/stepping), so two machines with
    identical flag sets but different microarchitectures (observed: a
    driver-host swap between Xeon generations) produce AOT executables
    that warn on each other. The signature therefore folds in the cpuinfo
    identity lines too — the same signals LLVM's host detection reads.
    """
    import hashlib
    import platform

    import jax
    import jaxlib

    sig = " ".join([
        platform.machine(),
        f"jax={getattr(jax, '__version__', '?')}",
        f"jaxlib={getattr(jaxlib, '__version__', '?')}",
    ])
    try:
        ident = _cpu_identity()
        sig += " " + " ".join(f"{k}={v}" for k, v in sorted(ident.items()))
    except OSError:
        sig += " " + platform.processor()
    return hashlib.sha1(sig.encode()).hexdigest()[:12]


def _cpu_identity(path: str = "/proc/cpuinfo") -> dict:
    """ISA flags + CPUID identity lines of the first core (see
    :func:`_host_signature` for why identity matters, not just flags)."""
    ident = {}
    with open(path) as f:
        for line in f:
            key = line.split(":", 1)[0].strip()
            if key in ("flags", "Features") and "flags" not in ident:
                ident["flags"] = " ".join(sorted(line.split(":", 1)[1].split()))
            elif key in ("vendor_id", "cpu family", "model",
                         "model name", "stepping") and key not in ident:
                ident[key] = line.split(":", 1)[1].strip()
    return ident


def enable_compilation_cache() -> Optional[str]:
    """Point JAX at a persistent on-disk executable cache.

    Returns the cache dir, or None when disabled via ``D3F_COMPILE_CACHE=0``
    or when this jax build rejects the config (older versions) — callers
    need no branch.
    """
    if os.environ.get("D3F_COMPILE_CACHE", "1").lower() in ("0", "false"):
        return None
    d = os.environ.get(
        "D3F_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "d3fields_tpu",
                     "xla_cache", _host_signature()),
    )
    try:
        os.makedirs(d, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        # cache every executable no matter how quick the compile: through
        # the tunnel even small modules pay the round trip
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - jax version dependent
        import warnings

        warnings.warn(f"persistent compilation cache unavailable: {e}")
        return None
    return d
