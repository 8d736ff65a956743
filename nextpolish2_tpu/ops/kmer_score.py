"""Device k-mer scoring from raw allele bytes (k < 32).

The host path (models.oracle_lq.batch_min_kscores) rolls canonical k-mers,
yak-hashes them and probes the table per batch; routing that through the
device HBM table used to require uploading precomputed (hi, lo, slot)
query planes — 12 bytes per k-mer, which loses to the host composite on a
tunneled link. This module moves the WHOLE chain on device instead: upload
the joined allele codes (1 byte per base), then rolling k-mer extraction,
canonical min(fwd, revcomp), the invertible yak hash (kmer.rs:223-233
semantics via models' yak_hash64), the open-addressing probe
(ops.kmer_table layout) and the per-allele min-count reduction all run in
ONE jitted dispatch; only a [n_seqs] count vector is pulled back.

64-bit values ride (hi, lo) uint32 plane pairs (TPU has no native u64):
shifts compose across the boundary, adds propagate one carry. For k < 32
the 2k-bit packed k-mer's 2-bit contributions never straddle bit 32
(positions are even), so fwd/rev accumulate with plain ORs.

Bit-exact vs the host chain: tests/test_kmer_device.py::test_device_score_*.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .kmer_table import MAX_PROBES

_U32 = jnp.uint32
SEP_CODE = 5  # joined-stream separator; any code >= 4 is an invalid base


# ---- u64 arithmetic on (hi, lo) uint32 pairs --------------------------------

def _shl(h, l, s: int):
    """(h,l) << s for 0 < s < 32."""
    return (h << _U32(s)) | (l >> _U32(32 - s)), l << _U32(s)


def _shr(h, l, s: int):
    """(h,l) >> s for 0 < s < 32."""
    return h >> _U32(s), (l >> _U32(s)) | (h << _U32(32 - s))


def _add(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(_U32)
    return ah + bh + carry, lo


def _yak_hash64_u32(h, l, mask_hi: int, mask_lo: int):
    """yak_hash64(key, mask) on uint32 plane pairs (io.yak.yak_hash64)."""
    mh, ml = _U32(mask_hi), _U32(mask_lo)
    # key = (~key + (key << 21)) & mask
    sh, sl = _shl(h, l, 21)
    h, l = _add(~h, ~l, sh, sl)
    h, l = h & mh, l & ml
    # key ^= key >> 24
    sh, sl = _shr(h, l, 24)
    h, l = h ^ sh, l ^ sl
    # key = (key + (key << 3) + (key << 8)) & mask
    ah, al = _shl(h, l, 3)
    bh, bl = _shl(h, l, 8)
    h, l = _add(h, l, ah, al)
    h, l = _add(h, l, bh, bl)
    h, l = h & mh, l & ml
    # key ^= key >> 14
    sh, sl = _shr(h, l, 14)
    h, l = h ^ sh, l ^ sl
    # key = (key + (key << 2) + (key << 4)) & mask
    ah, al = _shl(h, l, 2)
    bh, bl = _shl(h, l, 4)
    h, l = _add(h, l, ah, al)
    h, l = _add(h, l, bh, bl)
    h, l = h & mh, l & ml
    # key ^= key >> 28
    sh, sl = _shr(h, l, 28)
    h, l = h ^ sh, l ^ sl
    # key = (key + (key << 31)) & mask
    sh, sl = _shl(h, l, 31)
    h, l = _add(h, l, sh, sl)
    return h & mh, l & ml


# ---- the fused scorer --------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("ksize", "table_size", "min_count", "n_seqs",
                              "n_probes"))
def device_min_kscores_jit(key_hi, key_lo, counts, codes, starts,
                           ksize: int, table_size: int, min_count: int,
                           n_seqs: int, n_probes: int = MAX_PROBES):
    """codes u8 [L] (joined alleles, SEP_CODE separators, pad >= 4),
    starts i32 [n_seqs] (allele start offsets, ascending; repeats allowed
    for padding) -> i32 [n_seqs] min k-mer count per allele (0 if any k-mer
    absent/below min_count, or no valid k-mer).
    key_hi/key_lo/counts: the resident DeviceKmerTable planes.
    The per-position allele id is derived HERE (scatter + cumsum) so the
    upload is 1 byte/base + 4 bytes/allele, not 4 bytes/base."""
    L = codes.shape[0]
    c = codes.astype(_U32)
    pos = jnp.arange(L, dtype=jnp.int32)
    # sid[p] = #{i > 0 : starts[i] <= p}; starts[0] == 0 is not scattered so
    # sid starts at 0. Padding alleles repeat starts == L-ish offsets and
    # simply produce empty segments.
    sid = jnp.cumsum(jnp.zeros(L, jnp.int32).at[starts[1:]].add(
        1, mode="drop"))

    # trailing valid-run length (invalid base resets; io.yak.rolling_kmers)
    last_bad = jnp.where(c >= 4, pos, -1)
    last_bad = jax.lax.cummax(last_bad)
    valid = (pos - last_bad) >= ksize

    # rolling 2k-bit fwd/revcomp on u32 planes; contribution bit offsets are
    # even so no 2-bit field straddles bit 32 -> plain ORs, no carries.
    # End position j takes window codes c[j-k+1 .. j]; the code at window
    # offset t (0 = leftmost) is roll(c, k-1-t)[j]. Wrapped positions only
    # feed j < k-1, which `valid` masks off.
    fwd_hi = jnp.zeros(L, _U32)
    fwd_lo = jnp.zeros(L, _U32)
    rev_hi = jnp.zeros(L, _U32)
    rev_lo = jnp.zeros(L, _U32)
    for t in range(ksize):
        ct = jnp.roll(c, ksize - 1 - t) & _U32(3)
        bf = 2 * (ksize - 1 - t)
        if bf >= 32:
            fwd_hi = fwd_hi | (ct << _U32(bf - 32))
        else:
            fwd_lo = fwd_lo | (ct << _U32(bf))
        rc = ct ^ _U32(3)
        br = 2 * t
        if br >= 32:
            rev_hi = rev_hi | (rc << _U32(br - 32))
        else:
            rev_lo = rev_lo | (rc << _U32(br))
    use_fwd = (fwd_hi < rev_hi) | ((fwd_hi == rev_hi) & (fwd_lo < rev_lo))
    kh = jnp.where(use_fwd, fwd_hi, rev_hi)
    kl = jnp.where(use_fwd, fwd_lo, rev_lo)

    kmask = (1 << (2 * ksize)) - 1
    qh, ql = _yak_hash64_u32(kh, kl, kmask >> 32, kmask & 0xFFFFFFFF)

    # start slot = ((hash >> 10) ^ (hash << 7)) & (size - 1); only low bits
    # survive the size mask, and a left shift never feeds hi bits into lo
    s10h, s10l = _shr(qh, ql, 10)
    slot0 = ((s10l ^ (ql << _U32(7)))
             & _U32(table_size - 1)).astype(jnp.int32)

    qhi = jax.lax.bitcast_convert_type(qh, jnp.int32)
    qlo = jax.lax.bitcast_convert_type(ql, jnp.int32)
    # double-hashing stride (ops/kmer_table.py MAX_PROBES comment): low 32
    # bits of (hash >> 10) forced odd — s10l is exactly that
    stride = jax.lax.bitcast_convert_type(
        (s10l | _U32(1)) & _U32(table_size - 1), jnp.int32)
    out = jnp.zeros(L, jnp.int32)
    found = jnp.zeros(L, bool)
    for probe in range(n_probes):
        idx = (slot0 + probe * stride) & (table_size - 1)
        hit = (key_hi[idx] == qhi) & (key_lo[idx] == qlo) & ~found
        out = jnp.where(hit, counts[idx], out)
        found = found | hit
    out = jnp.where(out >= min_count, out, 0)

    # per-allele min over valid end positions; alleles with no valid k-mer
    # score 0 (host batch_min_kscores semantics)
    BIG = jnp.int32(np.iinfo(np.int32).max)
    vals = jnp.where(valid, out, BIG)
    mins = jax.ops.segment_min(vals, sid, num_segments=n_seqs,
                               indices_are_sorted=True)
    has = jax.ops.segment_max(valid.astype(jnp.int32), sid,
                              num_segments=n_seqs,
                              indices_are_sorted=True)
    return jnp.where((has > 0) & (mins != BIG), mins, 0)


def device_min_kscores(table, seqs, min_count: int) -> np.ndarray | None:
    """Score alleles on device from raw bytes. Returns i32 [len(seqs)] or
    None when the path does not apply (k >= 32, empty batch). `table` is an
    io.yak.KmerTable with use_device set and a buildable device table."""
    if not seqs or table.ksize >= 32:
        return None
    from ..utils.jaxcfg import bucket_pow2
    from ..utils.seqcodes import seq_to_codes

    tab = table.device_table()
    if tab is None:
        return None
    dtab, jhi, jlo, jct = tab
    n = len(seqs)
    lens = np.fromiter((len(s) for s in seqs), dtype=np.int64, count=n)
    joined = b"\xff".join(seqs)        # placeholder; recoded below
    codes = seq_to_codes(joined).astype(np.uint8)
    # separators must be distinguishable from INTERNAL invalid bases (N):
    # both are >= 4 (invalid), but allele ids come from the start-offset
    # table, not the separators, so any >= 4 value works
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    codes[starts[1:] - 1] = SEP_CODE
    L = bucket_pow2(max(len(codes), 1), 1 << 16)
    if L > len(codes):
        codes = np.concatenate(
            [codes, np.full(L - len(codes), SEP_CODE, np.uint8)])
    S = bucket_pow2(n, 1024)
    # padding alleles scatter past the end (dropped): empty segments -> 0
    starts_p = np.full(S, L, dtype=np.int32)
    starts_p[:n] = starts
    out = device_min_kscores_jit(
        jhi, jlo, jct, jnp.asarray(codes), jnp.asarray(starts_p),
        ksize=table.ksize, table_size=dtab.size, min_count=int(min_count),
        n_seqs=S, n_probes=dtab.n_probes)
    return np.asarray(out)[:n]
