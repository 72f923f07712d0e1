"""Tracing / profiling: the systematic layer the reference lacks.

The reference measures with ad-hoc ``time.time()`` deltas
(``fusion.py:1718-1727``) and CUDA events inside XMem's eval harness
(``XMem/eval.py:146-250``). Here profiling is a first-class module:

- :class:`StageTimer` — per-stage wall-clock with device synchronization
  (a host fetch per output buffer: ``block_until_ready`` alone does not
  synchronize through remote-tunnel TPU backends, see the verify skill);
- :func:`trace` — context manager around ``jax.profiler`` TensorBoard
  traces;
- :class:`Throughput` — FPS/points-per-second accounting matching XMem's
  ``total_frames / total_process_time`` (``XMem/eval.py:248-250``).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


def sync(tree) -> None:
    """Force execution + completion of every array in a pytree."""
    import jax

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "reshape"):
            np.asarray(leaf.reshape(-1)[:1])


class StageTimer:
    """Accumulates per-stage latencies; ``report()`` prints a table."""

    def __init__(self):
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, result_tree=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            sync(holder.get("out", result_tree))
            self.times[name].append(time.perf_counter() - t0)

    def report(self) -> str:
        lines = [f"{'stage':<28}{'calls':>6}{'mean ms':>10}{'min ms':>10}{'total s':>10}"]
        for name, ts in self.times.items():
            a = np.asarray(ts)
            lines.append(
                f"{name:<28}{len(ts):>6}{a.mean() * 1e3:>10.1f}"
                f"{a.min() * 1e3:>10.1f}{a.sum():>10.2f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (open with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measured_matmul_peak_tflops(dtype="bfloat16", n=8192, chain=8,
                                repeats=3) -> float:
    """Delivered dense-matmul peak of the current default backend.

    Times a jitted chain of ``chain`` dependent (n, n) @ (n, n) matmuls
    (2·chain·n³ FLOPs) and returns the best TFLOP/s over ``repeats``. This
    is the denominator for MFU statements: the peak the chip actually
    delivers through this allocation/tunnel, not the datasheet number.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.full((n, n), 1.0 / n, dtype)

    @jax.jit
    def f(x):
        for _ in range(chain):
            x = (x @ x) * (1.0 / n)  # rescale keeps bf16 away from inf
        return x

    float(f(x).reshape(-1)[0])  # compile + sync (tunnel-safe)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(x).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return 2.0 * chain * n**3 / best / 1e12


def measured_dispatch_floor_ms(reps: int = 10) -> float:
    """Measured cost of ONE dispatch + scalar fetch round trip on the
    current default backend (a trivial jitted add on 8 floats, min of
    ``reps``). On a remote-tunnel TPU this is ~30 ms — the latency floor
    under every per-frame/per-stage latency row; a stage whose wall-clock
    sits near k x this floor for k dispatches is dispatch-bound, not
    compute-bound (the quantitative basis for those claims in bench/README
    rows)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def triv(x):
        return x + 1.0

    x = jnp.zeros((8,), jnp.float32)
    float(triv(x)[0])  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(triv(x)[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def xla_flops(jitted, *args, **kwargs):
    """FLOPs XLA counts for one call of a jitted function, or None when the
    backend exposes no cost analysis. Pair with a measured wall-clock and
    :func:`measured_matmul_peak_tflops` for an MFU statement.

    CAVEAT: XLA counts a ``lax.scan`` / ``lax.map`` / ``while`` BODY once,
    regardless of trip count — an executable that loops (query-tiled
    gathers, per-view ``lax.map``, optimizer scans) under-reports by the
    trip count. Count an un-tiled lowering or multiply by the trip count
    at the call site (see ``bench.bench_grounded_sam``)."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


class Throughput:
    """XMem-eval-style FPS accounting (``XMem/eval.py:146,216,248-250``)."""

    def __init__(self):
        self.total_time = 0.0
        self.total_units = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, units: int = 1, result_tree=None):
        sync(result_tree)
        self.total_time += time.perf_counter() - self._t0
        self.total_units += units

    @property
    def per_second(self) -> float:
        return self.total_units / max(self.total_time, 1e-9)
