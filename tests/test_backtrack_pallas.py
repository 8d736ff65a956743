"""Pallas backtrack (unwired alternative) stays bit-exact vs the XLA path."""

import numpy as np

from tests.test_pallas_dp import build_tables


def test_backtrack_pallas_matches_xla():
    import jax.numpy as jnp

    from nextpolish2_tpu.ops.backtrack_pallas import backtrack_pallas
    from nextpolish2_tpu.ops.consensus import SlotTables, backtrack, consensus_dp

    key, cnt, cov, lead, seed_anchor = build_tables()
    B, W, K = key.shape
    tables = SlotTables(jnp.asarray(key), jnp.asarray(cnt), jnp.asarray(cov),
                        jnp.asarray((key >= 0).sum(2).astype(np.int32)),
                        jnp.asarray(np.zeros(B, bool)))
    sc, bi, _ = consensus_dp(tables, jnp.asarray(lead), jnp.asarray(seed_anchor))
    last = np.full(B, W - 1, np.int32)
    a = backtrack(tables, sc, bi, jnp.asarray(last), jnp.asarray(seed_anchor),
                  W + 128)
    b = backtrack_pallas(tables.key, tables.count, tables.coverage, sc, bi,
                         jnp.asarray(last), jnp.asarray(seed_anchor), W + 128,
                         interpret=True)
    ok_a, ok_b = np.asarray(a[4]), np.asarray(b[4])
    np.testing.assert_array_equal(ok_a, ok_b)
    for i in range(4):
        # compare in int64: the wired backtrack emits small dtypes (i16/u16)
        np.testing.assert_array_equal(
            np.where(ok_a, np.asarray(a[i]).astype(np.int64), -1),
            np.where(ok_b, np.asarray(b[i]).astype(np.int64), -1))
    np.testing.assert_array_equal(np.asarray(a[5]), np.asarray(b[5]))
    np.testing.assert_array_equal(np.asarray(a[7]), np.asarray(b[7]))
