"""Oracle per-contig polishing driver: reference-faithful end-to-end engine.

Mirrors the reference worker loop (src/main.rs:1726-1837): build alignseqs, run
iter_count rounds of MSA -> consensus DP -> LQ detection, with read phasing on
non-final rounds and seed/recheck splicing on the final round.

This NumPy/Python implementation is the executable spec; the TPU engine
(nextpolish2_tpu.ops / pipeline) must match its output exactly.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import numpy as np

from ..config import PolishConfig
from ..io.bam import BamRecord
from ..io.yak import KmerTable
from ..utils.seqcodes import ASCII2CODE
from .oracle_align import AlignTags, filter_by_clip, record_to_tags, ref_as_tags
from .oracle_lq import (
    L_SUCC,
    extract_alleles,
    fill_seed_lqseqs,
    mark_hete_lqseqs,
    phase_reads_by_lqseqs,
    retrieve_kmer_count,
    reupdate_consensus_with_lqseqs,
    update_consensus_with_lqseqs,
)
from .oracle_msa import Consensus, backtrack_lq, build_msas, consensus_dp


def passthrough_consensus(tseq: bytes) -> Consensus:
    """seq2consensusbase_vec (main.rs:598-605): identity consensus."""
    return Consensus(pos=np.arange(len(tseq), dtype=np.int64),
                     base=np.frombuffer(tseq, dtype=np.uint8).copy())


def build_alignseqs(tseq: bytes, records: Iterable[BamRecord],
                    cfg: PolishConfig) -> List[AlignTags]:
    """Reference pseudo-alignment + filtered/trimmed reads + clip filter
    (main.rs:1732-1817)."""
    tseq_codes = ASCII2CODE[np.frombuffer(tseq, dtype=np.uint8)]
    alignseqs: List[AlignTags] = [ref_as_tags(tseq_codes)]
    for rec in records:
        tags = record_to_tags(rec, tseq_codes, len(tseq), cfg)
        if tags is not None:
            alignseqs.append(tags)
    filter_by_clip(alignseqs, cfg)
    return alignseqs


def build_alignseqs_native(bam_path: str, tid: int, tseq: bytes,
                           cfg: PolishConfig) -> Optional[List[AlignTags]]:
    """Native fast path: fused BAM decode + filter + expand + trim + 3-mer
    streams (io/_native/np2native.cc); returns None if the library is missing.
    Produces the same AlignTags as build_alignseqs, with kmer keys cached
    (each AlignTags is a view into one contiguous contig stream; `delta`
    derives lazily from t_pos)."""
    from ..io.native import extract_contig_native

    tseq_codes = ASCII2CODE[np.frombuffer(tseq, dtype=np.uint8)]
    res = extract_contig_native(bam_path, tid, tseq_codes, cfg)
    if res is None:
        return None
    t_pos, key, read_start, bounds, clips = res
    n = len(t_pos)
    # out= + unsafe cast: `(key & 0xF).astype(u8)` would materialize a 4-byte
    # temp of the whole contig stream (first-touch page faults are ~4-40 MB/s
    # on the target VMs — that temp alone cost minutes at 138M entries)
    q_base = np.empty(n, dtype=np.uint8)
    np.bitwise_and(key, 0xF, out=q_base, casting="unsafe")

    alignseqs: List[AlignTags] = [ref_as_tags(tseq_codes)]
    ends = np.append(read_start[1:], n)
    for i in range(len(read_start)):
        s, e = int(read_start[i]), int(ends[i])
        alignseqs.append(AlignTags(
            aln_t_s=int(bounds[i, 0]), aln_t_e=int(bounds[i, 1]),
            t_pos=t_pos[s:e], q_base=q_base[s:e],
            clip_label=bool(clips[i]), kkey=key[s:e]))
    filter_by_clip(alignseqs, cfg)
    return alignseqs


def polish_contig(tseq: bytes, records: Sequence[BamRecord],
                  tables: Sequence[KmerTable],
                  cfg: Optional[PolishConfig] = None,
                  alignseqs: Optional[List[AlignTags]] = None) -> Consensus:
    """Polish one contig; returns the consensus base list (pos, ascii base).

    alignseqs: optional prebuilt alignments (e.g. from the native ingest);
    must be in pre-phasing state (only clip-filter drops applied)."""
    cfg = cfg or PolishConfig()
    if len(tseq) < cfg.min_ctg_len:
        return passthrough_consensus(tseq)

    tables = sorted(tables, key=lambda t: t.ksize)  # option.rs:238
    if alignseqs is None:
        alignseqs = build_alignseqs(tseq, records, cfg)

    for i in range(cfg.iter_count):
        out_cns = i + 1 == cfg.iter_count
        msas = build_msas(alignseqs, len(tseq))
        _, bestis, gb = consensus_dp(msas)
        cb, lqseqs = backtrack_lq(msas, bestis, gb, cfg.hq_min_qv, cfg.lq_min_length)
        del msas
        if not lqseqs:
            if out_cns:
                return cb
            continue  # no LQ regions -> nothing to phase (main.rs:1638-1639)

        extract_alleles(alignseqs, lqseqs, tables[0], cfg.lqseq_max_can_count)
        retrieve_kmer_count(lqseqs, tables[0], cfg.min_kmer_count)
        if out_cns:
            fill_seed_lqseqs(lqseqs, cfg.max_indel_len, cfg.lqseq_max_can_count)
            consensus = update_consensus_with_lqseqs(lqseqs, cb, L_SUCC)
            for p, table in enumerate(tables):
                consensus = reupdate_consensus_with_lqseqs(
                    lqseqs, consensus, table, cfg.min_kmer_count, p + 1,
                    cfg.lqseq_max_can_count)
            return consensus
        mark_hete_lqseqs(lqseqs, cfg.lqseq_max_can_count)
        invalid = phase_reads_by_lqseqs(lqseqs, cfg.model == "ref", cfg.use_all_reads)
        for order in invalid:
            alignseqs[order].dropped = True

    raise AssertionError("unreachable: iter_count >= 1 required")


def consensus_to_bytes(cb: Consensus) -> bytes:
    return cb.to_bytes()
