"""Host (numpy) vs device (XLA sort) pileup aggregation consistency."""

import numpy as np

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamRecord
from nextpolish2_tpu.models.oracle import build_alignseqs
from nextpolish2_tpu.pipeline.windows import aggregate_host, build_window_batch
from nextpolish2_tpu.utils.seqcodes import ASCII2CODE


def test_host_vs_device_aggregation():
    import jax.numpy as jnp

    from nextpolish2_tpu.ops.consensus import aggregate_windows

    rng = np.random.default_rng(50)
    t = bytes(rng.choice(list(b"ACGT"), size=2000).astype(np.uint8))
    reads = []
    for s in range(0, 1500, 150):
        seq = bytearray(t[s : s + 600])
        for _ in range(3):  # sprinkle errors to create slot diversity
            i = int(rng.integers(len(seq)))
            seq[i] = int(rng.choice(list(b"ACGT")))
        reads.append(BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s,
                               mapq=60, cigar=[(0, 600)], seq=bytes(seq)))
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50)
    aligns = build_alignseqs(t, reads, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(t, dtype=np.uint8)]
    wb = build_window_batch(aligns, len(t), ref_codes, target=512)
    K = 32

    hkey, hcnt, hcov, hns, hover = aggregate_host(wb, K)
    pcols, pkeys = wb.padded()
    dev = aggregate_windows(jnp.asarray(pcols), jnp.asarray(pkeys),
                            wb.width, K)
    np.testing.assert_array_equal(hkey, np.asarray(dev.key))
    np.testing.assert_array_equal(hcnt, np.asarray(dev.count))
    np.testing.assert_array_equal(hcov, np.asarray(dev.coverage))
    np.testing.assert_array_equal(hns, np.asarray(dev.n_slots))
    np.testing.assert_array_equal(hover, np.asarray(dev.overflow))


def test_native_vs_numpy_aggregation():
    from nextpolish2_tpu.io.native import available

    if not available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(51)
    t = bytes(rng.choice(list(b"ACGT"), size=3000).astype(np.uint8))
    reads = []
    for s in range(0, 2200, 200):
        seq = bytearray(t[s : s + 700])
        for _ in range(6):
            i = int(rng.integers(len(seq)))
            seq[i] = int(rng.choice(list(b"ACGT")))
        reads.append(BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s,
                               mapq=60, cigar=[(0, 700)], seq=bytes(seq)))
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50)
    aligns = build_alignseqs(t, reads, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(t, dtype=np.uint8)]
    wb = build_window_batch(aligns, len(t), ref_codes, target=512)
    for K in (8, 32):  # small K to exercise overflow flags
        a = aggregate_host(wb, K, use_native=False)
        b = aggregate_host(wb, K, use_native=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def _fake_wb(t_sorted, k_sorted, lo, hi, lead):
    from types import SimpleNamespace

    return SimpleNamespace(t_sorted=np.asarray(t_sorted, dtype=np.int32),
                           k_sorted=np.asarray(k_sorted, dtype=np.int32),
                           lo=np.asarray(lo, dtype=np.int64),
                           hi=np.asarray(hi, dtype=np.int64),
                           lead=np.asarray(lead, dtype=np.int64),
                           n_windows=len(lo))


def test_native_aggregation_many_distinct_keys():
    """Regression: a column with >512 distinct keys used to spin the native
    open-addressing hash forever (structural-variant pileups carry thousands
    of distinct 3-mers; seen on the bundled 100 kb contig)."""
    from nextpolish2_tpu.io.native import available

    if not available():
        import pytest
        pytest.skip("native library unavailable")
    n_distinct = 700  # > the old 512-slot table, < the new CAP
    # distinct insertion keys: flags 0b0101, increasing delta, varying base
    keys = ((np.arange(n_distinct, dtype=np.int64) << 16)
            | (0b0101 << 12) | (np.arange(n_distinct) % 4)).astype(np.int32)
    # one hot column (t=5) + a few normal match columns around it
    t_sorted = np.concatenate([np.full(4, 3), np.full(n_distinct, 5),
                               np.full(4, 7)]).astype(np.int32)
    k_sorted = np.concatenate([np.array([1, 1, 2, 2], dtype=np.int32), keys,
                               np.array([3, 3, 3, 4], dtype=np.int32)])
    wb = _fake_wb(t_sorted, k_sorted, [0], [len(t_sorted)], [0])
    for K in (8, 64):
        a = aggregate_host(wb, K, width=16, n_windows=1, use_native=False)
        b = aggregate_host(wb, K, width=16, n_windows=1, use_native=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        assert a[4][0]  # >K distinct keys in one column -> overflow window


def test_native_aggregation_beyond_cap_terminates():
    """>CAP distinct keys in one column: native must terminate and flag the
    window overflow (the host fallback recomputes it exactly)."""
    from nextpolish2_tpu.io.native import aggregate3_native, available

    if not available():
        import pytest
        pytest.skip("native library unavailable")
    n_distinct = 5000  # > CAP = 4096
    keys = ((np.arange(n_distinct, dtype=np.int64) << 16)
            | (0b0101 << 12)).astype(np.int32)
    t_sorted = np.full(n_distinct, 2, dtype=np.int32)
    res = aggregate3_native(t_sorted, keys, np.array([0], dtype=np.int64),
                            np.array([n_distinct], dtype=np.int64),
                            np.array([0], dtype=np.int64), B=1, W=8, K=16)
    assert res is not None and bool(res[4][0])


def test_col_slot_counts_native_vs_numpy():
    """Per-column distinct-key counts: native == numpy fallback on a random
    stream, and both bound every window's aggregated n_slots."""
    from nextpolish2_tpu.io.native import available, col_slots_native
    from nextpolish2_tpu.pipeline.windows import col_slot_counts

    rng = np.random.default_rng(51)
    n_pos = 300
    n = 20000
    t_sorted = np.sort(rng.integers(0, n_pos, size=n)).astype(np.int32)
    k_sorted = (rng.integers(0, 12, size=n, dtype=np.int64) << 16
                | rng.integers(0, 2, size=n, dtype=np.int64) << 12
                | rng.integers(0, 4096, size=n, dtype=np.int64)
                ).astype(np.int32)
    ref = col_slot_counts(t_sorted, k_sorted, n_pos)  # native if available
    # independent numpy model
    packed = (t_sorted.astype(np.int64) << 32) | \
        k_sorted.view(np.uint32).astype(np.int64)
    cols = (np.unique(packed) >> 32).astype(np.int64)
    expect = np.bincount(cols, minlength=n_pos).astype(np.int32)
    np.testing.assert_array_equal(ref, expect)
    if available():
        nat = col_slots_native(t_sorted, k_sorted, n_pos)
        np.testing.assert_array_equal(nat, expect)


def test_aggregate_win_idx_matches_range():
    """aggregate_host(win_idx=...) == the range path row-for-row, for an
    arbitrary (unsorted) window subset — the K-tier regrouping contract."""
    rng = np.random.default_rng(52)
    t = bytes(rng.choice(list(b"ACGT"), size=2000).astype(np.uint8))
    reads = []
    for s in range(0, 1500, 150):
        seq = bytearray(t[s : s + 600])
        for _ in range(3):
            i = int(rng.integers(len(seq)))
            seq[i] = int(rng.choice(list(b"ACGT")))
        reads.append(BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s,
                               mapq=60, cigar=[(0, 600)], seq=bytes(seq)))
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50)
    aligns = build_alignseqs(t, reads, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(t, dtype=np.uint8)]
    wb = build_window_batch(aligns, len(t), ref_codes, target=512)
    K = 16
    full = aggregate_host(wb, K, n_windows=wb.n_windows)
    idx = rng.permutation(wb.n_windows)[: max(2, wb.n_windows // 2)]
    for use_native in (False, True):
        sub = aggregate_host(wb, K, n_windows=len(idx), win_idx=idx,
                             use_native=use_native)
        for fi, si in zip(full, sub):
            np.testing.assert_array_equal(fi[idx], si)


def test_sparse_dispatch_matches_dense():
    """dp_backtrack_sparse (dense-8 + scattered exceptions) emits exactly
    what the dense K-table dispatch does on a fat synthetic chunk."""
    import jax
    import jax.numpy as jnp

    from nextpolish2_tpu.ops.consensus import (SlotTables, dp_backtrack,
                                               dp_backtrack_sparse)
    from nextpolish2_tpu.pipeline.windows import split_sparse

    rng = np.random.default_rng(53)
    t = bytes(rng.choice(list(b"ACGT"), size=3000).astype(np.uint8))
    reads = []
    for s in range(0, 2400, 120):
        # divergent random insertions at a shared hotspot column -> many
        # distinct (delta, base) slots there (the fat-chunk trigger)
        ins = bytes(rng.choice(list(b"ACGT"),
                               size=int(rng.integers(3, 12))).astype(np.uint8))
        seq = bytearray(t[s : s + 300]) + bytearray(ins) + \
            bytearray(t[s + 300 : s + 600])
        for _ in range(10):
            i = int(rng.integers(len(seq)))
            seq[i] = int(rng.choice(list(b"ACGT")))
        cig = [(0, 300), (1, len(ins)), (0, 300)]
        reads.append(BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s,
                               mapq=60, cigar=cig, seq=bytes(seq)))
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50)
    aligns = build_alignseqs(t, reads, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(t, dtype=np.uint8)]
    wb = build_window_batch(aligns, len(t), ref_codes, target=512)
    K = 48
    B = wb.n_windows
    key_tab, cnt_tab, coverage, n_slots, overflow = aggregate_host(wb, K)
    assert int(n_slots.max()) > 8  # the fixture must actually be fat
    lead = np.maximum(wb.window_start - 2, 0)
    seed = wb.window_start > 0
    last = (wb.window_start + wb.window_len - 1 - lead).astype(np.int32)
    max_steps = wb.width + 128

    tables = SlotTables(key=jnp.asarray(key_tab), count=jnp.asarray(cnt_tab),
                        coverage=jnp.asarray(coverage), n_slots=None,
                        overflow=jnp.asarray(overflow))
    dense = jax.device_get(dp_backtrack(
        tables, jnp.asarray(lead), jnp.asarray(seed), jnp.asarray(last),
        max_steps))

    for kd in (4, 8):
        dk, dc, eb, ew, ek, ekey, ecnt = split_sparse(key_tab, cnt_tab,
                                                      n_slots, kd)
        sparse = jax.device_get(dp_backtrack_sparse(
            jnp.asarray(dk), jnp.asarray(dc.astype(np.uint16)),
            jnp.asarray(coverage.astype(np.uint16)),
            jnp.asarray(overflow), jnp.asarray(eb), jnp.asarray(ew),
            jnp.asarray(ek), jnp.asarray(ekey), jnp.asarray(ecnt),
            jnp.asarray(lead), jnp.asarray(seed), jnp.asarray(last),
            K=K, max_steps=max_steps))
        for a, b in zip(dense[0], sparse[0]):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(dense[1], sparse[1])

    # the CSR upload (the production single-device format) must match too
    from nextpolish2_tpu.ops.consensus import dp_backtrack_csr
    from nextpolish2_tpu.pipeline.windows import split_csr

    W = key_tab.shape[1]
    csr = jax.device_get(dp_backtrack_csr(
        *(jnp.asarray(x) for x in split_csr(key_tab, cnt_tab, n_slots)),
        jnp.asarray(overflow), jnp.asarray(lead), jnp.asarray(seed),
        jnp.asarray(last), B=B, W=W, K=K, max_steps=max_steps))
    for a, b in zip(dense[0], csr[0]):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(dense[1], csr[1])

    # the one-buffer blob dispatch (production single-device path) must
    # match bit-for-bit after the host decode
    from nextpolish2_tpu.ops.consensus import (decode_backtrack_words,
                                               dp_backtrack_csr_blob)
    from nextpolish2_tpu.pipeline.windows import pack_csr_blob

    parts = split_csr(key_tab, cnt_tab, n_slots)
    blob = pack_csr_blob(*parts, lead, seed, last,
                         nibble_ns=K < 16 and (B * W) % 2 == 0)
    packed_arr = jax.device_get(dp_backtrack_csr_blob(
        jnp.asarray(blob), B=B, W=W, K=K, P=len(parts[1]),
        Pd=len(parts[3]), Pe=len(parts[5]), max_steps=max_steps))
    cols_b, packed_b, qv_b, best_b, trunc_b, lvl_b = \
        decode_backtrack_words(packed_arr, last)
    np.testing.assert_array_equal(cols_b.astype(np.int64),
                                  dense[0][0].astype(np.int64))
    np.testing.assert_array_equal(packed_b, dense[0][1])
    np.testing.assert_array_equal(qv_b, dense[0][2])
    np.testing.assert_array_equal(best_b, dense[0][3])
    np.testing.assert_array_equal(trunc_b, dense[0][5])
    np.testing.assert_array_equal(lvl_b, dense[1])


def test_csr_assembly_exceptions_roundtrip():
    """assemble_csr rebuilds EXACTLY the dense tables + coverage from the
    flat 4-byte-per-slot stream, including entries whose delta or count
    overflow a byte (the exception scatter) and zero-slot columns."""
    import jax
    import jax.numpy as jnp

    from nextpolish2_tpu.ops.consensus import assemble_csr
    from nextpolish2_tpu.pipeline.windows import split_csr

    rng = np.random.default_rng(54)
    B, W, K = 3, 97, 7
    n_slots = rng.integers(0, K + 1, size=(B, W)).astype(np.int32)
    n_slots[:, ::5] = 0  # runs of empty columns
    key_tab = np.full((B, W, K), -1, dtype=np.int32)
    cnt_tab = np.zeros((B, W, K), dtype=np.int32)
    for b in range(B):
        for w in range(W):
            for k in range(int(n_slots[b, w])):
                delta = int(rng.choice([0, 1, 2, 3, 300, 70000]))
                flag = int(rng.integers(0, 6))
                q = rng.integers(0, 16, size=3)
                key_tab[b, w, k] = np.int32(np.uint32(
                    (min(delta, 0xFFFF) << 16) | (flag << 12)
                    | (int(q[0]) << 8) | (int(q[1]) << 4) | int(q[2])))
                cnt_tab[b, w, k] = int(rng.choice([1, 2, 200, 400, 70000]))
    parts = split_csr(key_tab, cnt_tab, n_slots, e_bucket=8, p_bucket=64)
    n_exc = int((parts[5] < len(parts[1])).sum())
    assert n_exc > 0, "fixture must exercise the exception scatter"
    akey, acnt, acov = jax.device_get(jax.jit(
        assemble_csr, static_argnames=("B", "W", "K"))(
        *(jnp.asarray(x) for x in parts), B=B, W=W, K=K))
    np.testing.assert_array_equal(akey, key_tab)
    np.testing.assert_array_equal(acnt, cnt_tab)
    exp_cov = np.where((key_tab != -1) & (((key_tab >> 12) & 1) == 0),
                       cnt_tab, 0).sum(axis=2)
    np.testing.assert_array_equal(acov, exp_cov)

    # the paired-scatter A/B variant (NP2_ASM_PAIRED=1: one (key, cnt)
    # row-pair scatter instead of two scalar scatters) must be bit-exact
    import os

    for knob in ("two", "fused1", "narrow", "paired"):
        os.environ["NP2_ASM_VARIANT"] = knob
        try:
            pkey, pcnt, pcov = jax.device_get(jax.jit(
                assemble_csr, static_argnames=("B", "W", "K"))(
                *(jnp.asarray(x) for x in parts), B=B, W=W, K=K))
        finally:
            os.environ.pop("NP2_ASM_VARIANT", None)
        np.testing.assert_array_equal(pkey, key_tab, err_msg=knob)
        np.testing.assert_array_equal(pcnt, cnt_tab, err_msg=knob)
        np.testing.assert_array_equal(pcov, exp_cov, err_msg=knob)


def test_csr_blob_nibble_ns_k8():
    """The K<16 blob rides nibble-packed per-column slot counts (two
    columns per byte); the device unpack + DP must match the plain dense
    dispatch bit-for-bit, columns reconstructed from the dec bits."""
    import jax
    import jax.numpy as jnp

    from nextpolish2_tpu.ops.consensus import (SlotTables,
                                               decode_backtrack_words,
                                               dp_backtrack,
                                               dp_backtrack_csr_blob)
    from nextpolish2_tpu.pipeline.windows import pack_csr_blob, split_csr

    rng = np.random.default_rng(55)
    t = bytes(rng.choice(list(b"ACGT"), size=2000).astype(np.uint8))
    reads = []
    for s in range(0, 1500, 150):
        seq = bytearray(t[s : s + 600])
        for _ in range(4):
            i = int(rng.integers(len(seq)))
            seq[i] = int(rng.choice(list(b"ACGT")))
        reads.append(BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s,
                               mapq=60, cigar=[(0, 600)], seq=bytes(seq)))
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50)
    aligns = build_alignseqs(t, reads, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(t, dtype=np.uint8)]
    wb = build_window_batch(aligns, len(t), ref_codes, target=512)
    K = 8
    key_tab, cnt_tab, coverage, n_slots, overflow = aggregate_host(wb, K)
    assert int(n_slots.max()) <= K and (wb.n_windows * wb.width) % 2 == 0
    B, W = wb.n_windows, wb.width
    lead = np.maximum(wb.window_start - 2, 0)
    seed = wb.window_start > 0
    last = (wb.window_start + wb.window_len - 1 - lead).astype(np.int32)
    max_steps = W + 128

    tables = SlotTables(key=jnp.asarray(key_tab), count=jnp.asarray(cnt_tab),
                        coverage=jnp.asarray(coverage), n_slots=None,
                        overflow=jnp.asarray(overflow))
    dense = jax.device_get(dp_backtrack(
        tables, jnp.asarray(lead), jnp.asarray(seed), jnp.asarray(last),
        max_steps))

    parts = split_csr(key_tab, cnt_tab, n_slots)
    blob = pack_csr_blob(*parts, lead, seed, last, nibble_ns=True)
    packed_arr = jax.device_get(dp_backtrack_csr_blob(
        jnp.asarray(blob), B=B, W=W, K=K, P=len(parts[1]),
        Pd=len(parts[3]), Pe=len(parts[5]), max_steps=max_steps))
    cols_b, packed_b, qv_b, best_b, trunc_b, lvl_b = \
        decode_backtrack_words(packed_arr, last)
    np.testing.assert_array_equal(cols_b.astype(np.int64),
                                  dense[0][0].astype(np.int64))
    np.testing.assert_array_equal(packed_b, dense[0][1])
    np.testing.assert_array_equal(qv_b, dense[0][2])
    np.testing.assert_array_equal(best_b, dense[0][3])
    np.testing.assert_array_equal(lvl_b, dense[1])


def test_native_csr_direct_matches_split_csr():
    """aggregate_csr_host (native CSR-direct, no dense host tables) must
    assemble to EXACTLY the tables aggregate_host + split_csr produce, on
    real window streams, including exception entries and pad lanes."""
    import jax
    import jax.numpy as jnp
    import pytest

    from nextpolish2_tpu.io.native import available
    from nextpolish2_tpu.ops.consensus import assemble_csr
    from nextpolish2_tpu.pipeline.windows import (aggregate_csr_host,
                                                  aggregate_host, split_csr)

    if not available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(56)
    t = bytes(rng.choice(list(b"ACGT"), size=3000).astype(np.uint8))
    reads = []
    for s in range(0, 2400, 120):
        ins = bytes(rng.choice(list(b"ACGT"),
                               size=int(rng.integers(3, 12))).astype(np.uint8))
        seq = bytearray(t[s : s + 300]) + bytearray(ins) + \
            bytearray(t[s + 300 : s + 600])
        for _ in range(10):
            i = int(rng.integers(len(seq)))
            seq[i] = int(rng.choice(list(b"ACGT")))
        cig = [(0, 300), (1, len(ins)), (0, 300)]
        reads.append(BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s,
                               mapq=60, cigar=cig, seq=bytes(seq)))
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50)
    aligns = build_alignseqs(t, reads, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(t, dtype=np.uint8)]
    wb = build_window_batch(aligns, len(t), ref_codes, target=512)
    K = 48
    ids = np.arange(wb.n_windows)
    B = wb.n_windows + 3  # pad lanes included
    W = wb.width

    key_tab, cnt_tab, cov, n_slots, ovf_d = aggregate_host(
        wb, K, width=W, n_windows=B, win_idx=ids)
    csr = aggregate_csr_host(wb, K, width=W, n_windows=B, win_idx=ids)
    assert csr is not None
    ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt, ovf_c = csr
    # aggregate_host additionally flags >0xFFFF-coverage windows (u16 device
    # upload guard); the CSR path recomputes coverage on device in i32 and
    # deliberately omits that flag (windows.py docstring) — mask it out
    ovf_cov = cov.max(axis=1) > 0xFFFF
    np.testing.assert_array_equal(ovf_c | ovf_cov, ovf_d | ovf_cov)

    asm = jax.jit(assemble_csr, static_argnames=("B", "W", "K"))
    akey, acnt, acov = jax.device_get(asm(
        *(jnp.asarray(x) for x in
          (ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt)),
        B=B, W=W, K=K))
    # overflow lanes are host-fallback; their truncated tables may differ
    ok = ~ovf_d
    np.testing.assert_array_equal(akey[ok], key_tab[ok])
    np.testing.assert_array_equal(acnt[ok], cnt_tab[ok])
    np.testing.assert_array_equal(acov[ok], cov[ok])

    # and the split_csr route assembles to the same thing
    parts = split_csr(key_tab, cnt_tab, n_slots)
    bkey, bcnt, bcov = jax.device_get(asm(
        *(jnp.asarray(x) for x in parts), B=B, W=W, K=K))
    np.testing.assert_array_equal(akey[ok], bkey[ok])
    np.testing.assert_array_equal(acnt[ok], bcnt[ok])


def test_csr_direct_high_coverage_divergence():
    """Documented divergence (windows.py): aggregate_host flags windows whose
    coverage exceeds u16 (dense-dispatch upload guard) while the CSR-direct
    path does not (device recomputes coverage in i32). Exercise a >0xFFFF
    coverage column and pin both behaviors."""
    import pytest

    from nextpolish2_tpu.io.native import available
    from nextpolish2_tpu.pipeline.windows import (WindowBatch, WindowPlan,
                                                  aggregate_csr_host,
                                                  aggregate_host)

    if not available():
        pytest.skip("native library unavailable")

    n = 70000  # one column, coverage > 0xFFFF
    t_sorted = np.zeros(n, dtype=np.int32)
    k_sorted = np.full(n, 1, dtype=np.int32)  # base code 1, flags 0 => delta 0
    wb = WindowBatch(
        plan=WindowPlan(starts=np.array([0]), ends=np.array([0]),
                        anchors=np.zeros(1, dtype=bool)),
        n_windows=1, width=8, stream_len=n,
        t_sorted=t_sorted, k_sorted=k_sorted,
        lo=np.array([0], dtype=np.int64), hi=np.array([n], dtype=np.int64),
        lead=np.array([0], dtype=np.int64),
        window_start=np.array([0], dtype=np.int64),
        window_len=np.array([1], dtype=np.int32))
    ids = np.array([0])
    _, _, cov, _, ovf_d = aggregate_host(wb, 8, width=8, n_windows=1,
                                         win_idx=ids)
    assert int(cov[0, 0]) == n
    assert bool(ovf_d[0])  # dense path: host-fallback flag set
    csr = aggregate_csr_host(wb, 8, width=8, n_windows=1, win_idx=ids)
    assert csr is not None
    ovf_c = csr[-1]
    assert not bool(ovf_c[0])  # CSR path: stays on the device lane (exact)
    # the count itself rides the exception list with the full i32 value
    xcnt = csr[7]
    assert n in xcnt.tolist()


def test_pack_decode_backtrack_words_roundtrip():
    """pack_backtrack_out -> decode_backtrack_words roundtrips the per-window
    meta through the trailing lo/hi u16 pairs, INCLUDING negative best
    scores (sign bits must survive the u16 split), and the emission words
    through the qv<<7|packed u16 layout."""
    import jax.numpy as jnp

    from nextpolish2_tpu.ops.consensus import (decode_backtrack_words,
                                               pack_backtrack_out)

    rng = np.random.default_rng(77)
    B, S = 5, 37
    packed = rng.integers(0, 128, size=(B, S)).astype(np.uint8)
    qv = rng.integers(0, 256, size=(B, S)).astype(np.uint8)
    cols = np.zeros((B, S), np.int32)  # not shipped; rebuilt from dec bits
    best = np.array([-1, -(2**30), 0, 7, 2**30 - 1], np.int64)
    n_steps = np.array([1, 5, 37, 0, 12], np.int32)
    trunc = np.array([0, 1, 0, 1, 0], bool)
    lvl = np.array([1, 0, 0, 1, 0], bool)
    arr = np.asarray(pack_backtrack_out(
        (jnp.asarray(cols), jnp.asarray(packed), jnp.asarray(qv),
         jnp.asarray(best), jnp.asarray(n_steps), jnp.asarray(trunc)),
        jnp.asarray(lvl)))
    assert arr.shape == (B, S + 8) and arr.dtype == np.uint16
    last_col = rng.integers(100, 2000, size=B).astype(np.int32)
    cols_r, packed_r, qv_r, best_r, trunc_r, lvl_r = \
        decode_backtrack_words(arr, last_col)
    np.testing.assert_array_equal(packed_r, packed)
    np.testing.assert_array_equal(qv_r, qv)
    np.testing.assert_array_equal(best_r, best.astype(np.int32))
    np.testing.assert_array_equal(trunc_r, trunc)
    np.testing.assert_array_equal(lvl_r, lvl)
    # cols: last_col minus running dec-bit count (exclusive)
    dec = (packed >> 6) & 1
    exp_cols = (last_col[:, None]
                - (np.cumsum(dec, axis=1) - dec)).astype(np.uint16)
    np.testing.assert_array_equal(cols_r, exp_cols)


def test_encode_dgap_roundtrip_with_escapes():
    """Gap-encoded delta sidecar (u16 gaps, escape entries for gaps > 0xFFFF)
    decodes back to exactly the original sorted-unique index list via the
    device rule didx = cumsum(dgap) - 1, dval == 0 dropped. Exercises the
    escape path real chunks almost never hit (a 65k+ run without deltas)."""
    from nextpolish2_tpu.pipeline.windows import encode_dgap

    def decode(dgap, dval):
        cum = np.cumsum(dgap.astype(np.int64))
        real = dval > 0
        return cum[real] - 1, dval[real]

    rng = np.random.default_rng(5)
    cases = [
        np.array([], np.int64),                      # no deltas
        np.array([0], np.int64),                     # first entry
        np.array([70000], np.int64),                 # escape at the front
        np.array([65534, 65535, 65536, 131071, 131072, 500000], np.int64),
        np.sort(rng.choice(2_000_000, size=300, replace=False)),
        np.arange(50),                               # dense run
    ]
    for didx in cases:
        didx = didx.astype(np.int32)
        dval = rng.integers(1, 256, size=len(didx)).astype(np.uint8)
        dgap, dv = encode_dgap(didx, dval)
        assert dgap.dtype == np.uint16 and dv.dtype == np.uint8
        rid, rval = decode(dgap, dv)
        np.testing.assert_array_equal(rid, didx.astype(np.int64))
        np.testing.assert_array_equal(rval, dval)
        # escapes only where gaps demanded them
        gaps = np.diff(didx.astype(np.int64), prepend=-1)
        assert len(dgap) == len(didx) + int(((gaps - 1) // 0xFFFF).sum())
