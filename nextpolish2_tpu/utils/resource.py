"""Resource reporting (reference src/utils/resource.rs:15-57): version, argv,
wall time, CPU time, peak RSS — printed to stderr at exit."""

from __future__ import annotations

import resource
import sys
import time

_START = time.monotonic()


def realtime() -> float:
    return time.monotonic() - _START


def cputime() -> float:
    ru = resource.getrusage(resource.RUSAGE_SELF)
    return ru.ru_utime + ru.ru_stime


def peakrss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)


def resource_str(version: str = "") -> str:
    return (
        f"Version: {version}\n"
        f"CMD: {' '.join(sys.argv)}\n"
        f"Real time: {realtime():.3f} sec; CPU: {cputime():.3f} sec; "
        f"Peak RSS: {peakrss_gb():.3f} GB"
    )
