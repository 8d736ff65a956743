#!/usr/bin/env python3
"""K-mer table capacity proof through the SHARDED path (VERDICT r4 item 5).

Builds ShardedKmerTable instances at increasing key counts on an 8-virtual-
device CPU mesh (the same mesh/shard_map/psum code the production engine's
KmerTable.get_sharded dispatches to), verifies exact lookups on a sample
(present keys -> exact counts, absent keys -> 0), and records the capacity
curve to KMER_CAPACITY_r05.json.

Human-scale context: 60x human short reads yield ~2-4 G distinct 21-mers
(~32-64 GB resident at 16 B/key) — BASELINE config 5 requires sharding that
across >=2 hosts' HBM (the reference streams the .yak file per contig
instead, kmer.rs:132-170). The per-shard structure here is exactly what each
host would hold.

Usage: kmer_capacity.py [--sizes 64e6,250e6,1e9] [--shards 8] [-o OUT.json]
"""
import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sizes", default="64e6,250e6,1e9")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--queries", type=int, default=1_000_000)
    p.add_argument("-o", default="KMER_CAPACITY_r05.json")
    a = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from nextpolish2_tpu.parallel.mesh import make_mesh
    from nextpolish2_tpu.parallel.sharded_kmer import (ShardedKmerTable,
                                                       make_sharded_lookup)

    n_dev = len(jax.devices())
    shards = min(a.shards, n_dev)
    mesh = make_mesh(n_win=n_dev // shards, n_kmer=shards)
    results = []
    for size_s in a.sizes.split(","):
        n = int(float(size_s))
        rng = np.random.default_rng(7)
        t0 = time.time()
        # distinct keys by construction: bit 62 set separates from absents
        hashes = rng.choice(1 << 61, size=n,
                            replace=False).astype(np.uint64) \
            if n <= (1 << 24) else None
        if hashes is None:
            # sampling without replacement at 1e9 is slow; use a strided
            # unique construction instead (distinct by construction)
            base = rng.integers(0, 1 << 30, size=n, dtype=np.uint64)
            hashes = (np.arange(n, dtype=np.uint64) << np.uint64(31)) | base
        counts = rng.integers(1, 1023, size=n).astype(np.int64)
        gen_s = time.time() - t0

        t0 = time.time()
        tab = ShardedKmerTable.build(hashes, counts, 21, n_shards=shards)
        build_s = time.time() - t0
        table_gb = (tab.key_hi.nbytes + tab.key_lo.nbytes +
                    tab.counts.nbytes) / 1e9

        # exact-lookup verification: present sample + absent sample
        qn = min(a.queries, n)
        qi = rng.integers(0, n, size=qn)
        q_present = hashes[qi]
        q_absent = hashes[rng.integers(0, n, size=qn)] ^ np.uint64(1) << np.uint64(62)
        fn = make_sharded_lookup(mesh, axis="kmer", min_count=1)
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        ksh = NamedSharding(mesh, P("kmer"))
        thi = jax.device_put(jnp.asarray(tab.key_hi), ksh)
        tlo = jax.device_put(jnp.asarray(tab.key_lo), ksh)
        tct = jax.device_put(jnp.asarray(tab.counts), ksh)

        def run(qs):
            arrs = tab.query_host_arrays(qs)
            out = fn(thi, tlo, tct, *[jnp.asarray(x) for x in arrs])
            return np.asarray(jax.device_get(out))

        t0 = time.time()
        got = run(q_present)
        lookup_s = time.time() - t0
        exp = counts[qi]
        assert np.array_equal(got, exp), "present-key lookup mismatch"
        got0 = run(q_absent)
        assert not got0.any(), "absent keys returned nonzero counts"
        peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        row = {
            "keys": n, "shards": shards, "shard_slots": tab.shard_size,
            "table_gb": round(table_gb, 2), "build_s": round(build_s, 1),
            "gen_s": round(gen_s, 1),
            "lookup_mq_per_s": round(qn / lookup_s / 1e6, 2),
            "verified_exact": True, "peak_rss_gb": round(peak_gb, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        del tab, thi, tlo, tct, hashes, counts
    out = {
        "what": "ShardedKmerTable capacity curve on an 8-virtual-device CPU "
                "mesh (shard_map + psum lookups = the production "
                "KmerTable.get_sharded path). Human-scale story: 2-4 G "
                "distinct 21-mers (60x human short reads) = 32-64 GB "
                "resident; at these measured shard sizes that spans 2-4 "
                "hosts' HBM via the same shard-by-hash routing "
                "(kmer.rs:96-98 analogue).",
        "mesh": f"{n_dev // shards}x{shards}",
        "rows": results,
    }
    with open(a.o, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {a.o}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
