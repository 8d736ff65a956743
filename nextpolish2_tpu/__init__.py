"""nextpolish2_tpu — a TPU-native, repeat-aware genome-assembly polishing framework.

Re-designed from scratch for JAX/XLA/Pallas on TPU, with the same capabilities as
the reference NextPolish2 (Nextomics/NextPolish2): HiFi-based assembly polishing
with heterozygous-site phasing and short-read k-mer (yak-table) rechecking.

Top-level API:
    polish(assembly, bam, yak_tables, config) -> PolishedAssembly
"""

__version__ = "0.1.0"

from .config import PolishConfig  # noqa: F401


def polish(fa_path, bam_path, yak_paths, cfg=None, **kw):
    """Top-level API: polish all contigs; see pipeline.orchestrator.polish."""
    from .pipeline.orchestrator import polish as _polish

    return _polish(fa_path, bam_path, yak_paths, cfg, **kw)
