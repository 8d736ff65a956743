"""Unit tests for the intricate LQ helper functions against hand-computed values
(reference main.rs:780-860 semantics)."""

import numpy as np

from nextpolish2_tpu.models.oracle_lq import (LqSeq, fill_order_stat,
                                              get_min_count, is_valid_snp,
                                              no_dupseq_lqseq)
from nextpolish2_tpu.models.oracle_msa import LqRegion


def mk(seqs_scores):
    r = LqRegion(start=0, end=1)
    r.seqs = [LqSeq(order=i, kscore=k, kmer=0, seq=s)
              for i, (s, k) in enumerate(seqs_scores)]
    return r


def test_get_min_count():
    # coverage-scaled thresholds (main.rs:803-811)
    assert [get_min_count(c) for c in (1, 5, 6, 8, 9, 100)] == [1, 1, 2, 2, 3, 3]


def test_is_valid_snp_homopolymer_compression():
    # equal after homopolymer compression -> NOT a valid SNP (main.rs:780-801)
    assert not is_valid_snp(b"AAAG", b"AG")
    assert not is_valid_snp(b"GAGCTCT", b"GAGCTCT")
    assert is_valid_snp(b"GAGCTCT", b"GAGTTCT")
    # prefix relationship after compression -> false (reference comment:
    # 'such as GAGCTCT vs GAGCTCTCT, so here we always return false')
    assert not is_valid_snp(b"GAGCTCT", b"GAGCTCTAT"[:7] + b"AT")


def test_fill_order_stat_counts_and_maxima():
    # order 0 = ref allele 'AA'; three reads 'AT', one more 'AA', one 'AT'
    lq = mk([(b"AA", 5), (b"AT", 5), (b"AT", 5), (b"AA", 5), (b"AT", 5)])
    stats = [0] * 60
    order_stat = {}
    m1c, m1p, m2c, m2p = fill_order_stat(lq, stats, order_stat)
    # 'AT' count 3 from first occurrence idx1; 'AA' count 2 from idx0
    assert (m1c, m1p) == (3, 1)
    assert (m2c, m2p) == (2, 0)
    assert order_stat == {0: 2, 1: 3}
    assert stats[:5] == [2, 3, 3, 2, 3]


def test_fill_order_stat_ref_tie_preference():
    # tie between ref allele and another: ref (order 0) wins max1 (main.rs:838)
    lq = mk([(b"AA", 5), (b"AT", 5), (b"AT", 5), (b"AA", 5)])
    stats = [0] * 60
    m1c, m1p, m2c, m2p = fill_order_stat(lq, stats, {})
    assert (m1c, m1p) == (2, 0)  # ref preferred on equal counts
    assert (m2c, m2p) == (2, 1)


def test_fill_order_stat_skips_zero_kscore():
    lq = mk([(b"AA", 5), (b"AT", 0), (b"AT", 0), (b"AT", 5)])
    stats = [0] * 60
    os_ = {}
    m1c, m1p, _, _ = fill_order_stat(lq, stats, os_)
    # kscore==0 seqs are not counted as first occurrences, but counts from a
    # valid first occurrence include them via seqs[p1..] scan
    assert m1p in (0, 3)
    assert 0 in os_


def test_no_dupseq_excludes_ref():
    # duplicate between ref (idx0) and a read does NOT count (main.rs:851-860)
    assert no_dupseq_lqseq(mk([(b"AA", 1), (b"AA", 1), (b"AT", 1)]))
    assert not no_dupseq_lqseq(mk([(b"AA", 1), (b"AT", 1), (b"AT", 1)]))


def test_phase_communities_len_model():
    """model=len: communities sorted by weight; conflicting smaller one dropped
    (louvain.rs:317-339)."""
    from nextpolish2_tpu.models.louvain import insert_data, new_data, phase_communities

    data = new_data()
    # clique A {1,2,3} (weight 3), clique B {4,5} (weight 1), conflict A-B
    for a, b in ((1, 2), (2, 3), (1, 3), (4, 5)):
        insert_data(data, a, b, 1.0)
        insert_data(data, b, a, 1.0)
    insert_data(data, 1, 4, -1.0)
    insert_data(data, 4, 1, -1.0)
    dropped = phase_communities(data, None)
    assert sorted(dropped) == [4, 5]


def test_phase_communities_ref_model_overrides_weight():
    """model=ref: the community agreeing with the reference wins even when the
    other has more internal weight (louvain.rs:294-316)."""
    from nextpolish2_tpu.models.louvain import insert_data, new_data, phase_communities

    data = new_data()
    for a, b in ((1, 2), (2, 3), (1, 3), (4, 5)):
        insert_data(data, a, b, 1.0)
        insert_data(data, b, a, 1.0)
    insert_data(data, 1, 4, -1.0)
    insert_data(data, 4, 1, -1.0)
    # reference agrees with the SMALLER clique {4,5}
    ref_weight = {4: 1.0, 5: 1.0, 1: -1.0, 2: -1.0, 3: -1.0}
    dropped = phase_communities(data, ref_weight)
    assert sorted(dropped) == [1, 2, 3]


def test_phase_reads_vectorized_matches_scalar_edges():
    """The vectorized phase_reads_by_lqseqs edge builder must reproduce the
    scalar pair-loop's (data, ref_weight, invalid_ids) exactly, across random
    het scenarios (incl. ref alleles, kscore-zero skips, >=3-conflict
    overrides, and invalidated reads that leave empty rows)."""
    from nextpolish2_tpu.models.oracle_lq import (L_HETE, _phase_edges_scalar,
                                                  _phase_edges_vec,
                                                  phase_reads_by_lqseqs)
    from nextpolish2_tpu.models.louvain import phase_communities

    rng = np.random.default_rng(44)
    alleles = [b"ACGT", b"AGGT", b"ACT", b"ACGTT"]
    for trial in range(30):
        n_reads = int(rng.integers(4, 30))
        lqseqs = []
        for _ in range(int(rng.integers(1, 12))):
            label = L_HETE if rng.random() < 0.8 else 0
            members = rng.choice(np.arange(1, n_reads + 1),
                                 size=int(rng.integers(2, min(n_reads, 12))),
                                 replace=False)
            members = np.sort(members)
            seqs = []
            if rng.random() < 0.7:  # ref allele first (order 0)
                seqs.append(LqSeq(order=0, kscore=int(rng.random() < 0.8),
                                  kmer=0,
                                  seq=alleles[int(rng.integers(4))]))
            for m in members:
                seqs.append(LqSeq(order=int(m),
                                  kscore=int(rng.random() < 0.8), kmer=0,
                                  seq=alleles[int(rng.integers(4))]))
            lqseqs.append(LqRegion(start=0, end=1, label=label, seqs=seqs))
        for asref in (False, True):
            for use_all in (False, True):
                data, ref_w, inv = _phase_edges_scalar(lqseqs, asref, use_all)
                vdata, vref_w, vinv = _phase_edges_vec(lqseqs, asref, use_all)
                # exact graph equality, including empty rows and edge values
                assert vdata == data, (trial, asref, use_all)
                assert vref_w == ref_w, (trial, asref, use_all)
                assert vinv == inv, (trial, asref, use_all)
                expect = sorted(phase_communities(data, ref_w) + list(inv))
                got = sorted(phase_reads_by_lqseqs(lqseqs, asref, use_all))
                assert got == expect, (trial, asref, use_all)


def test_louvain_vectorized_first_stage_matches_scalar():
    """Vectorized first_stage must reproduce the scalar local-moving phase
    exactly (same final communities AND phase_communities output) on random
    signed graphs, including multi-level aggregation + decluster paths."""
    from nextpolish2_tpu.models.louvain import (Louvain, insert_data,
                                                new_data, phase_communities)

    rng = np.random.default_rng(55)
    for trial in range(40):
        n = int(rng.integers(3, 40))
        data = new_data()
        for _ in range(int(rng.integers(n, 4 * n))):
            a, b = rng.integers(1, n + 1, size=2)
            if a == b:
                continue
            w = float(rng.integers(1, 4)) * (1.0 if rng.random() < 0.6
                                             else -1.0)
            insert_data(data, int(a), int(b), w)
            insert_data(data, int(b), int(a), w)
        if not data:
            continue

        import copy
        lv_v = Louvain(copy.deepcopy(data))
        lv_s = Louvain(copy.deepcopy(data))
        lv_s.first_stage = lv_s._first_stage_scalar  # type: ignore
        moved_v = lv_v.first_stage()
        moved_s = lv_s._first_stage_scalar()
        assert moved_v == moved_s, trial
        assert {k: v for k, v in lv_v.communities.items() if v} == \
               {k: v for k, v in lv_s.communities.items() if v}, trial
        assert {k: lv_v.node[k].id for k in lv_v.node} == \
               {k: lv_s.node[k].id for k in lv_s.node}, trial

        # end-to-end: full execute via the production path vs a Louvain
        # whose every level runs the scalar stage
        out_v = phase_communities(copy.deepcopy(data), None)

        class ScalarLouvain(Louvain):
            first_stage = Louvain._first_stage_scalar

        lv = ScalarLouvain(copy.deepcopy(data))
        data2, communities = lv.execute()
        communities.sort(key=lambda x: x.weight, reverse=True)
        invalid_ids = set()
        for p, community in enumerate(communities):
            if community.id in invalid_ids:
                continue
            id_vs = data2.get(community.id)
            if id_vs:
                for check in communities[p + 1:]:
                    if check.id in invalid_ids:
                        continue
                    if check.id in id_vs:
                        invalid_ids.add(check.id)
        expect = []
        for community in communities:
            if community.id in invalid_ids:
                expect.extend(community.nodes)
        assert sorted(out_v) == sorted(expect), trial


def test_extract_alleles_native_matches_python_fuzz():
    """Differential fuzz: the native np2_extract_alleles pass must reproduce
    the Python spec (_extract_alleles_py) exactly — entries, order, seqs,
    k-mers — including the sticky region cursor on non-monotone aln_t_s,
    the 60-cap, gap bases, dropped alignments and k >= 32 wrapped rolling."""
    import copy

    import pytest

    from nextpolish2_tpu.io.native import available
    from nextpolish2_tpu.io.yak import KmerTable
    from nextpolish2_tpu.models.oracle_align import AlignTags
    from nextpolish2_tpu.models.oracle_lq import (_extract_alleles_py,
                                                  extract_alleles)
    from nextpolish2_tpu.models.oracle_msa import LqRegion

    if not available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(202)
    for trial in range(8):
        ksize = [5, 7, 21, 31, 32, 33][trial % 6]
        table = KmerTable(ksize=ksize, pre=1,
                          keys=np.zeros(0, np.uint64),
                          counts=np.zeros(0, np.uint16),
                          bin_off=np.zeros(3, np.int64))
        n_pos = 400
        ats = []
        for a in range(25):
            s = int(rng.integers(0, n_pos - 60))
            e = min(n_pos - 1, s + int(rng.integers(40, 200)))
            # tag stream: ref positions s..e with occasional insertions (same
            # t_pos repeated) and gap bases (q_base == 4)
            t_parts, q_parts = [], []
            for p in range(s, e + 1):
                reps = 1 + (int(rng.integers(0, 8)) == 0)
                for rpt in range(reps):
                    t_parts.append(p)
                    q_parts.append(int(rng.integers(0, 5)))  # 4 = gap
            t_pos = np.array(t_parts, dtype=np.int64)
            q = np.array(q_parts, dtype=np.int64)
            ats.append(AlignTags(s, e, t_pos, q_base=q,
                                 dropped=bool(rng.integers(0, 10) == 0)))
        # ref pseudo-alignment first (order 0, spans everything)
        full = np.arange(n_pos, dtype=np.int64)
        ats.insert(0, AlignTags(0, n_pos - 1, full,
                                q_base=rng.integers(0, 4, n_pos)))
        # descending non-overlapping regions
        bounds = np.sort(rng.choice(np.arange(10, n_pos - 10), size=24,
                                    replace=False))
        regions = []
        for i in range(0, len(bounds) - 1, 2):
            regions.append(LqRegion(start=int(bounds[i]),
                                    end=int(bounds[i + 1])))
        regions = regions[::-1]  # descending genome order
        max_can = [60, 3][trial % 2]

        lq_a = copy.deepcopy(regions)
        lq_b = copy.deepcopy(regions)
        extract_alleles(ats, lq_a, table, max_can)       # native
        _extract_alleles_py(ats, lq_b, table, max_can)   # spec
        for ra, rb in zip(lq_a, lq_b):
            assert len(ra.seqs) == len(rb.seqs)
            for sa, sb in zip(ra.seqs, rb.seqs):
                assert (sa.order, sa.kmer, sa.seq) == (sb.order, sb.kmer, sb.seq)


def test_fill_order_stat_grouped_matches_scalar_fuzz():
    """The O(n) grouped fill_order_stat must reproduce the literal-port scalar
    on randomized candidate lists (ties, zero kscores, duplicate alleles)."""
    from nextpolish2_tpu.models.oracle_lq import (LqSeq,
                                                  _fill_order_stat_scalar,
                                                  fill_order_stat)
    from nextpolish2_tpu.models.oracle_msa import LqRegion

    rng = np.random.default_rng(203)
    for _ in range(200):
        n = int(rng.integers(0, 30))
        alleles = [bytes(rng.choice(list(b"ACGT"),
                                    size=int(rng.integers(1, 4))))
                   for _ in range(4)]
        seqs = [LqSeq(order=int(rng.integers(0, 10)),
                      kscore=int(rng.integers(0, 3)),
                      kmer=0,
                      seq=alleles[int(rng.integers(0, len(alleles)))])
                for _ in range(n)]
        lq_a = LqRegion(start=0, end=1, seqs=list(seqs))
        lq_b = LqRegion(start=0, end=1, seqs=list(seqs))
        stats_a, stats_b = [0] * 60, [0] * 60
        os_a, os_b = {}, {}
        ra = fill_order_stat(lq_a, stats_a, os_a)
        rb = _fill_order_stat_scalar(lq_b, stats_b, os_b)
        assert ra == rb
        assert stats_a == stats_b
        assert os_a == os_b
