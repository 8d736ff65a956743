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
    res = build_alignseqs_native_flat(bam_path, tid, tseq, cfg)
    return None if res is None else res[0]


def build_alignseqs_native_flat(bam_path: str, tid: int, tseq: bytes,
                                cfg: PolishConfig) -> Optional[tuple]:
    """build_alignseqs_native + the whole-contig flat stream, zero-copy.

    Returns (alignseqs, flat) where flat = {"t", "k", "q": i32/i32/u8 arrays
    of the FULL stream (ref pseudo-alignment first, then every kept read in
    BAM order — exactly the alignseqs order, dropped reads included),
    "aoff": i64 exclusive offsets per alignseq}. The ref stream is written
    into lead_room the extraction pass left in front of the read stream, so
    neither the window planner (_collect_stream) nor allele extraction
    (ea_concat) pays the ~400 MB/contig re-concatenation the round-3 profile
    charged them (stream_collect 185 s + extract glue 170 s on the 92 Mb
    run)."""
    from ..io.native import extract_contig_native
    from .oracle_msa import kmer_stream

    from ..utils.timing import stage

    tseq_codes = ASCII2CODE[np.frombuffer(tseq, dtype=np.uint8)]
    nref = len(tseq_codes)
    res = extract_contig_native(bam_path, tid, tseq_codes, cfg,
                                lead_room=nref)
    if res is None:
        return None
    t_pos, key, read_start, bounds, clips = res
    n = len(t_pos)
    t_full = t_pos.base if t_pos.base is not None else t_pos
    k_full = key.base if key.base is not None else key
    assert len(t_full) == nref + n
    with stage("ingest_refstream"):
        # ref pseudo-alignment stream in front (reference main.rs:1732-1739)
        t_full[:nref] = np.arange(nref, dtype=np.int32)
        rk = kmer_stream(ref_as_tags(tseq_codes))[1]
        k_full[:nref] = rk.astype(np.uint32).view(np.int32)
        # out= + unsafe cast: `(key & 0xF).astype(u8)` would materialize a
        # 4-byte temp of the whole contig stream (first-touch page faults
        # are ~4-40 MB/s on the target VMs — that temp alone cost minutes at
        # 138M entries)
        q_full = np.empty(nref + n, dtype=np.uint8)
        np.bitwise_and(k_full, 0xF, out=q_full, casting="unsafe")

    ref_tags = AlignTags(aln_t_s=0, aln_t_e=nref - 1, t_pos=t_full[:nref],
                         q_base=q_full[:nref], kkey=k_full[:nref])
    alignseqs: List[AlignTags] = [ref_tags]
    ends = np.append(read_start[1:], n)
    for i in range(len(read_start)):
        s, e = int(read_start[i]), int(ends[i])
        alignseqs.append(AlignTags(
            aln_t_s=int(bounds[i, 0]), aln_t_e=int(bounds[i, 1]),
            t_pos=t_pos[s:e], q_base=q_full[nref + s:nref + e],
            clip_label=bool(clips[i]), kkey=key[s:e]))
    filter_by_clip(alignseqs, cfg)
    aoff = np.empty(len(alignseqs) + 1, dtype=np.int64)
    aoff[0] = 0
    aoff[1] = nref
    aoff[2:] = nref + np.append(read_start[1:], n)
    flat = {"t": t_full, "k": k_full, "q": q_full, "aoff": aoff}
    return alignseqs, flat


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
