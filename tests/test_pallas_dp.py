"""Pallas DP kernel vs XLA consensus_dp: bit-exact (interpret mode on CPU)."""

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamRecord
from nextpolish2_tpu.models.oracle import build_alignseqs
from nextpolish2_tpu.pipeline.windows import aggregate_host, build_window_batch
from nextpolish2_tpu.utils.seqcodes import ASCII2CODE


def build_tables(seed=70, n=3000, n_reads=12, err=0.01):
    rng = np.random.default_rng(seed)
    t = bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))
    recs = []
    for s in range(0, n - 800, (n - 800) // n_reads):
        seq = bytearray(t[s : s + 800])
        out = bytearray()
        for ch in seq:  # subs + indels to exercise insertion levels
            r = rng.random()
            if r < err / 3:
                out.append(int(rng.choice(list(b"ACGT"))))
            elif r < 2 * err / 3:
                out.append(ch)
                out.append(int(rng.choice(list(b"ACGT"))))
            elif r < err:
                continue
            else:
                out.append(ch)
        from nextpolish2_tpu.pipeline.hifi_align import TargetIndex, align_read
        idx = TargetIndex.build(t)
        res = align_read(idx, t, bytes(out))
        if res:
            recs.append(BamRecord(qname=f"r{s}".encode(), flag=0, tid=0,
                                  pos=res.pos, mapq=60, cigar=res.cigar,
                                  seq=bytes(out)))
    recs.sort(key=lambda r: r.pos)
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50)
    aligns = build_alignseqs(t, recs, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(t, dtype=np.uint8)]
    wb = build_window_batch(aligns, n, ref_codes, target=512)
    K = 16
    key, cnt, cov, ns, over = aggregate_host(wb, K)
    assert not over.any()
    lead = np.maximum(wb.window_start - 2, 0)
    seed_anchor = wb.window_start > 0
    return key, cnt, cov, lead, seed_anchor


def test_pallas_dp_matches_xla():
    import jax.numpy as jnp

    from nextpolish2_tpu.ops.consensus import SlotTables, consensus_dp
    from nextpolish2_tpu.ops.consensus_pallas import consensus_dp_pallas

    key, cnt, cov, lead, seed_anchor = build_tables()
    B, W, K = key.shape
    tables = SlotTables(jnp.asarray(key), jnp.asarray(cnt), jnp.asarray(cov),
                        jnp.asarray((key >= 0).sum(2).astype(np.int32)),
                        jnp.asarray(np.zeros(B, bool)))
    sc_x, bi_x, lvl_x = consensus_dp(tables, jnp.asarray(lead),
                                     jnp.asarray(seed_anchor))
    sc_p, bi_p, lvl_p = consensus_dp_pallas(
        jnp.asarray(key), jnp.asarray(cnt), jnp.asarray(cov),
        jnp.asarray(lead), jnp.asarray(seed_anchor), interpret=True)

    sc_x, bi_x = np.asarray(sc_x), np.asarray(bi_x)
    sc_p, bi_p = np.asarray(sc_p), np.asarray(bi_p)
    # compare only windows within the XLA path's level cap (the Pallas kernel
    # has no cap and is correct beyond it; XLA flags those windows instead)
    ok = ~np.asarray(lvl_x)
    assert ok.any()
    valid = (key >= 0) & ok[:, None, None]
    np.testing.assert_array_equal(np.where(valid, sc_x, 0),
                                  np.where(valid, sc_p, 0))
    np.testing.assert_array_equal(np.where(valid, bi_x, 0),
                                  np.where(valid, bi_p.astype(np.int64), 0))


def test_pallas_dynamic_k_matches_static():
    """Dynamic-K kernel (per-column slot-loop bound = column's real max slot
    count) must be bit-identical to the static kernel on real-shaped tables,
    including slots at/above the bound (init rows: NEG_INF scores, besti 0)."""
    import jax.numpy as jnp

    from nextpolish2_tpu.ops.consensus_pallas import consensus_dp_pallas

    key, cnt, cov, lead, seed_anchor = build_tables(seed=71)
    ns = (key >= 0).sum(2).astype(np.int32)
    sc_s, bi_s, _ = consensus_dp_pallas(
        jnp.asarray(key), jnp.asarray(cnt), jnp.asarray(cov),
        jnp.asarray(lead), jnp.asarray(seed_anchor), interpret=True)
    sc_d, bi_d, _ = consensus_dp_pallas(
        jnp.asarray(key), jnp.asarray(cnt), jnp.asarray(cov),
        jnp.asarray(lead), jnp.asarray(seed_anchor), interpret=True,
        n_slots_bw=jnp.asarray(ns), dynamic_k=True)
    valid = key >= 0
    np.testing.assert_array_equal(np.asarray(sc_s), np.asarray(sc_d))
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(bi_s), 0),
        np.where(valid, np.asarray(bi_d), 0))
    # rows past each column's bound must be untouched init values
    past = ~valid
    assert (np.asarray(sc_d)[past] == -(1 << 30)).all()


def test_pallas_v2_span_matches_base():
    """The reduction-free v2 kernel (production default), with and without
    the span column bound, must be bit-identical to the base formulation —
    including the memset values on pad columns past every window's span."""
    import jax.numpy as jnp

    from nextpolish2_tpu.ops.consensus_pallas import consensus_dp_pallas

    key, cnt, cov, lead, seed_anchor = build_tables(seed=72)
    B, W, K = key.shape
    # real spans: last column with any real slot, +1; pad W so the span
    # bound actually skips trailing chunks
    span = W - np.argmax((key >= 0).any(2)[:, ::-1], axis=1)
    Wp = W + 96
    key_p = np.full((B, Wp, K), -1, key.dtype)
    key_p[:, :W] = key
    cnt_p = np.zeros((B, Wp, K), cnt.dtype)
    cnt_p[:, :W] = cnt
    cov_p = np.zeros((B, Wp), cov.dtype)
    cov_p[:, :W] = cov
    args = (jnp.asarray(key_p), jnp.asarray(cnt_p), jnp.asarray(cov_p),
            jnp.asarray(lead), jnp.asarray(seed_anchor))
    sc_b, bi_b, _ = consensus_dp_pallas(*args, interpret=True, variant="base")
    sc_v, bi_v, _ = consensus_dp_pallas(*args, interpret=True, variant="v2")
    sc_s, bi_s, _ = consensus_dp_pallas(*args, interpret=True, variant="v2",
                                        span=jnp.asarray(span.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(sc_b), np.asarray(sc_v))
    np.testing.assert_array_equal(np.asarray(bi_b), np.asarray(bi_v))
    np.testing.assert_array_equal(np.asarray(sc_b), np.asarray(sc_s))
    np.testing.assert_array_equal(np.asarray(bi_b), np.asarray(bi_s))
