"""Vectorized trim vs scalar reference-port oracle."""

import numpy as np

from nextpolish2_tpu.models.oracle_align import Expanded, trim


def scalar_trim(aln, length):
    """Direct scalar port of Alignment::trim (main.rs:446-513)."""
    t, q = aln.t_codes, aln.q_codes
    n = len(t)
    match = t == q
    j = 0
    start_found = False
    for i in range(n):
        if match[i]:
            j += 1
            aln.aln_t_s += 1
            aln.aln_q_s += 1
        else:
            if t[i] != 4:
                aln.aln_t_s += 1
            if q[i] != 4:
                aln.aln_q_s += 1
            j = 0
        if j == length:
            aln.aln_t_s -= length
            aln.aln_q_s -= length
            aln.shift = i + 1 - length
            start_found = True
            break
    if start_found:
        j = 0
        for i in range(n - 1, -1, -1):
            if match[i]:
                j += 1
                aln.aln_t_e -= 1
                aln.aln_q_e -= 1
            else:
                if t[i] != 4:
                    aln.aln_t_e -= 1
                if q[i] != 4:
                    aln.aln_q_e -= 1
                j = 0
            if j == length:
                aln.aln_t_e += length
                aln.aln_q_e += length
                new_len = i + length
                if new_len < n:
                    aln.t_codes = aln.t_codes[:new_len]
                    aln.q_codes = aln.q_codes[:new_len]
                break
    else:
        aln.shift = n


def mk(t, q, t_s=100):
    t = np.array(t, dtype=np.uint8)
    q = np.array(q, dtype=np.uint8)
    nt = int((t != 4).sum())
    nq = int((q != 4).sum())
    return Expanded(aln_t_s=t_s, aln_t_e=t_s + nt, aln_q_s=7, aln_q_e=7 + nq,
                    q_codes=q, t_codes=t, t_gap=t == 4, q_gap=q == 4)


def test_trim_matches_scalar_random():
    rng = np.random.default_rng(40)
    for trial in range(300):
        n = int(rng.integers(1, 120))
        t = rng.integers(0, 4, size=n).astype(np.uint8)
        q = t.copy()
        # inject mismatches and gaps
        for _ in range(int(rng.integers(0, 10))):
            i = int(rng.integers(n))
            kind = rng.integers(3)
            if kind == 0:
                q[i] = (q[i] + 1) % 4
            elif kind == 1:
                q[i] = 4
            else:
                t[i] = 4
        # a column can't be gap in both
        both = (t == 4) & (q == 4)
        q[both] = 0
        for length in (2, 4, 8):
            a = mk(t.copy(), q.copy())
            b = mk(t.copy(), q.copy())
            trim(a, length)
            scalar_trim(b, length)
            assert a.shift == b.shift, (trial, length)
            assert (a.aln_t_s, a.aln_t_e, a.aln_q_s, a.aln_q_e) == \
                   (b.aln_t_s, b.aln_t_e, b.aln_q_s, b.aln_q_e), (trial, length)
            assert len(a.t_codes) == len(b.t_codes), (trial, length)
