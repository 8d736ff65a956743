"""Unsorted-runs anchor sweep vs the sorted-stream sweep (bit-identical).

np2_find_anchors_runs computes the anchor bitmap + column counts straight
from the flat per-read run stream with the drop mask applied — anchors are
order-independent per-column aggregates, so no sort is needed. The
segmented lookahead relies on this to plan (and cut) before the sort
lands (pipeline/segmented.py); this test pins bit-identity against
find_anchors_native over the drop-filtered sorted stream.
"""

import numpy as np
import pytest

from nextpolish2_tpu.io.native import (
    available,
    find_anchors_native,
    find_anchors_runs_native,
    sort_stream_runs_native,
)

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library unavailable")


def _mk(seed, n_pos=5000, nr=60, mismatch=0.05, insert=0.02, dropf=0.2):
    rng = np.random.default_rng(seed)
    ref_codes = rng.integers(0, 4, n_pos).astype(np.uint8)
    runs_t, runs_k, aoff = [], [], [0]
    for _ in range(nr):
        s = int(rng.integers(0, n_pos - 400))
        length = int(rng.integers(100, 400))
        t = np.arange(s, s + length, dtype=np.int32)
        k = ref_codes[t].astype(np.int64)
        mis = rng.random(length) < mismatch
        k[mis] = (k[mis] + 1) % 4
        ins = rng.random(length) < insert
        k[ins] |= 0x1000
        # sprinkle nonzero deltas in the key high bits (must not affect
        # anchors beyond the insert flag / base nibble)
        k |= rng.integers(0, 4, length).astype(np.int64) << 16
        runs_t.append(t)
        runs_k.append(k.astype(np.int32))
        aoff.append(aoff[-1] + length)
    t_flat = np.concatenate(runs_t)
    k_flat = np.concatenate(runs_k)
    aoff = np.array(aoff, dtype=np.int64)
    drop = (rng.random(nr) < dropf).astype(np.uint8)
    startcnt = np.zeros(n_pos, dtype=np.int64)
    for r in range(nr):
        if not drop[r]:
            startcnt[t_flat[aoff[r]]] += 1
    return t_flat, k_flat, aoff, drop, ref_codes, startcnt, n_pos


@pytest.mark.parametrize("seed", [3, 9, 21])
def test_runs_anchors_bit_identical_to_sorted(seed):
    t_flat, k_flat, aoff, drop, ref, startcnt, n_pos = _mk(seed)
    ts, ks, _ = sort_stream_runs_native(t_flat, k_flat, aoff, drop, n_pos,
                                        None, None)
    a1, c1 = find_anchors_native(ts, ks, n_pos, ref, startcnt)
    a2, c2 = find_anchors_runs_native(t_flat, k_flat, aoff, drop, n_pos,
                                      ref, startcnt)
    assert np.array_equal(c1, c2)
    assert np.array_equal(a1, a2)
    assert a1.sum() > 0  # the fixture must actually produce anchors


def test_runs_anchors_all_dropped():
    t_flat, k_flat, aoff, drop, ref, startcnt, n_pos = _mk(7)
    drop[:] = 1
    a, c = find_anchors_runs_native(t_flat, k_flat, aoff, drop, n_pos,
                                    ref, np.zeros(n_pos, np.int64))
    assert not a.any() and not c.any()


def test_runs_anchors_contract_violation():
    t_flat, k_flat, aoff, drop, ref, startcnt, n_pos = _mk(5)
    with pytest.raises(ValueError):
        find_anchors_runs_native(t_flat, k_flat, aoff, drop[:-1], n_pos,
                                 ref, startcnt)
