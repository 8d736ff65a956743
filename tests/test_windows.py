"""Window planner native-vs-Python differential + scale tests."""

import numpy as np



def test_plan_windows_native_matches_python_fuzz():
    """Native np2_plan_windows must reproduce the Python greedy spec on
    random anchor patterns (sparse, dense, none, edges)."""
    import pytest

    from nextpolish2_tpu.io.native import available, plan_windows_native

    if not available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(301)
    for trial in range(30):
        n_pos = int(rng.integers(3, 3000))
        density = [0.0, 0.002, 0.05, 0.5][trial % 4]
        anchors = rng.random(n_pos) < density
        anchors[:2] = False
        target = int(rng.integers(8, 600))
        nat = plan_windows_native(anchors, n_pos, target)
        assert nat is not None
        # python spec: inline copy of the greedy loop (plan_windows itself
        # dispatches to native)
        starts = [0]
        ends = []
        anchor_idx = np.nonzero(anchors)[0]
        while True:
            s = starts[-1]
            if s + target >= n_pos:
                ends.append(n_pos - 1)
                break
            j = np.searchsorted(anchor_idx, s + target, side="right") - 1
            if j >= 0 and anchor_idx[j] > s:
                e = int(anchor_idx[j])
            else:
                j2 = np.searchsorted(anchor_idx, s + 1, side="left")
                e = int(anchor_idx[j2]) if j2 < len(anchor_idx) else n_pos - 1
            ends.append(e)
            if e >= n_pos - 1:
                break
            starts.append(e)
        np.testing.assert_array_equal(nat[0], np.array(starts))
        np.testing.assert_array_equal(nat[1], np.array(ends))


def test_window_max_slots_native_matches_numpy():
    import pytest

    from nextpolish2_tpu.io.native import available, window_max_native

    if not available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(302)
    n_pos = 5000
    colslots = rng.integers(0, 50, n_pos).astype(np.int32)
    lead = np.sort(rng.integers(0, n_pos - 1, 700)).astype(np.int64)
    ends = np.minimum(lead + rng.integers(1, 400, 700), n_pos - 1)
    nat = window_max_native(colslots, lead, ends)
    expect = np.array([colslots[l: e + 1].max(initial=0)
                       for l, e in zip(lead, ends)], dtype=np.int32)
    np.testing.assert_array_equal(nat, expect)


def test_plan_windows_scale_100mb():
    """Planning a synthetic 100 Mb contig's windows stays in single-digit
    seconds (VERDICT r2 item 5): ~highly-anchored real-data-like pattern."""
    import time

    import pytest

    from nextpolish2_tpu.io.native import available
    from nextpolish2_tpu.pipeline.windows import plan_windows

    if not available():
        pytest.skip("native library unavailable")
    n_pos = 100_000_000
    anchors = np.zeros(n_pos, dtype=bool)
    anchors[np.arange(37, n_pos, 97)] = True  # ~1M anchors
    t0 = time.time()
    plan = plan_windows(anchors, n_pos, target=1024)
    dt = time.time() - t0
    assert len(plan.starts) > 90_000
    assert dt < 9.0, f"plan_windows took {dt:.1f}s on 100 Mb"
