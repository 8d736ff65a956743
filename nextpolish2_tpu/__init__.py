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

from .config import PolishConfig  # noqa: F401


def polish(fa_path, bam_path, yak_paths, cfg=None, **kw):
    """Top-level API: polish all contigs; see pipeline.orchestrator.polish."""
    from .pipeline.orchestrator import polish as _polish

    return _polish(fa_path, bam_path, yak_paths, cfg, **kw)
