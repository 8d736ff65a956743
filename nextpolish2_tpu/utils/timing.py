"""Per-stage timing hooks (SURVEY §5: the reference has only an exit-time
getrusage summary; here stages are first-class metrics)."""

from __future__ import annotations

import sys
import time
from collections import defaultdict
from contextlib import contextmanager

_ENABLED = False
_totals: dict = defaultdict(float)
_counts: dict = defaultdict(int)


def enable(flag: bool = True) -> None:
    global _ENABLED
    _ENABLED = flag


@contextmanager
def stage(name: str):
    if not _ENABLED:
        yield
        return
    t0 = time.time()
    try:
        yield
    finally:
        _totals[name] += time.time() - t0
        _counts[name] += 1


def reset() -> None:
    _totals.clear()
    _counts.clear()


def snapshot() -> dict:
    """Stage name -> cumulative seconds since the last reset()."""
    return dict(_totals)


def report(out=sys.stderr) -> None:
    if not _totals:
        return
    print("[np2 timing]", file=out)
    for name in sorted(_totals, key=lambda k: -_totals[k]):
        print(f"  {name:<28} {_totals[name]:8.2f}s  x{_counts[name]}", file=out)


def profiler_trace(log_dir: str):
    """jax.profiler trace context (works on real TPU backends; no-op on
    failure — the tunneled axon backend may not support it)."""
    import contextlib

    try:
        import jax

        return jax.profiler.trace(log_dir)
    except Exception:
        return contextlib.nullcontext()
