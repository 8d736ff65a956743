"""nextpolish2_tpu — a TPU-native, repeat-aware genome-assembly polishing framework.

Re-designed from scratch for JAX/XLA/Pallas on TPU, with the same capabilities as
the reference NextPolish2 (Nextomics/NextPolish2): HiFi-based assembly polishing
with heterozygous-site phasing and short-read k-mer (yak-table) rechecking.

Top-level API:
    polish(assembly, bam, yak_tables, config) -> PolishedAssembly
"""

__version__ = "0.1.0"

import os as _os

# Large numpy buffers default to madvise(MADV_HUGEPAGE); with THP defrag in
# [madvise] mode each fault then does synchronous compaction, which collapses to
# ~10-20 MB/s once physical memory is fragmented (measured: a 2 GB buffer fill
# drops from 1.5 s to ~300 s). Genome-scale contigs allocate multi-GB pileup
# streams, so force regular 4 KB pages.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
try:  # in case numpy was imported before us (env var only read at import)
    import numpy._core._multiarray_umath as _mau  # type: ignore

    _mau._set_madvise_hugepage(False)
except Exception:
    pass

# Keep freed heap memory mapped. On this class of VM, first-touch page faults
# are serviced by the hypervisor at ~4-40 MB/s while already-mapped memory
# writes at ~3 GB/s (measured; the host reclaims freed pages via free-page
# hinting, so every alloc/free cycle re-pays provisioning). Disabling glibc's
# mmap path and heap trimming makes every large allocation come from the
# process heap, which only grows: the provisioning cost is paid once per
# high-water byte and all reuse runs at memory speed. Opt out: NP2_NO_MALLOPT=1.
if not _os.environ.get("NP2_NO_MALLOPT"):
    try:
        import ctypes as _ct

        _libc = _ct.CDLL(None)
        _libc.mallopt(-4, 0)           # M_MMAP_MAX = 0
        _libc.mallopt(-3, 2**31 - 1)   # M_MMAP_THRESHOLD = max
        _libc.mallopt(-1, 2**31 - 1)   # M_TRIM_THRESHOLD = max
    except Exception:
        pass

from .config import PolishConfig  # noqa: F401


def polish(fa_path, bam_path, yak_paths, cfg=None, **kw):
    """Top-level API: polish all contigs; see pipeline.orchestrator.polish."""
    from .pipeline.orchestrator import polish as _polish

    return _polish(fa_path, bam_path, yak_paths, cfg, **kw)
