"""CLI mirroring the reference nextPolish2 interface (src/utils/option.rs:43-228).

    nextpolish2 [-o FILE] [options] HiFi.map.bam genome.fa[.gz] short.read.yak...

All reference flags are supported plus TPU-engine knobs (--engine, --window-len).
"""

from __future__ import annotations

import argparse
import os
import sys

from . import __version__
from .config import PolishConfig, parse_min_map_len


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nextpolish2",
        description="Repeat-aware polishing genomes assembled using HiFi long reads "
                    "(TPU-native reimplementation)",
    )
    p.add_argument("bam", help="HiFi-to-ref mapping file in sorted BAM format.")
    p.add_argument("fa", help="genome assembly file in [GZIP] FASTA format.")
    p.add_argument("yak", nargs="+",
                   help="one or more k-mer dataset in yak format.")
    p.add_argument("-o", "--out", default="stdout", help="output file.")
    p.add_argument("-u", "--uppercase", action="store_true",
                   help="output in uppercase sequences.")
    p.add_argument("--out_pos", action="store_true",
                   help="output each base and its position.")
    p.add_argument("-k", "--min_kmer_count", type=int, default=5,
                   help="filter kmers in k-mer dataset with count <= INT.")
    p.add_argument("-t", "--thread", type=int, default=1, help="number of threads.")
    p.add_argument("-i", "--iter_count", type=int, default=2,
                   help="number of iterations to attempt phasing.")
    p.add_argument("-m", "--model", choices=["ref", "len"], default="ref",
                   type=str.lower, help="phasing model.")
    p.add_argument("-l", "--min_read_len", type=int, default=1000,
                   help="filter reads with length <= INT.")
    p.add_argument("-L", "--min_ctg_len", type=int, default=1_000_000,
                   help="don't correct reference sequences with length <= INT.")
    p.add_argument("-n", "--max_indel_len", type=int, default=20,
                   help="ignore indel errors with length > INT.")
    p.add_argument("-s", "--use_supplementary", action="store_true",
                   help="use supplementary alignments.")
    p.add_argument("-S", "--use_secondary", action="store_true",
                   help="use secondary alignments, consider setting "
                        "`min_map_qual` to -1 when using this option.")
    p.add_argument("-a", "--min_map_len", type=float, default=500.5,
                   help="filter alignments with alignment length <= "
                        "min(INT, FLOAT * read_length).")
    p.add_argument("-q", "--min_map_qual", type=int, default=1,
                   help="filter alignments with mapping quality <= INT.")
    p.add_argument("-c", "--max_clip_len", type=int, default=100,
                   help="filter alignments with unaligned length >= INT.")
    p.add_argument("-r", "--use_all_reads", action="store_true",
                   help="use all unfiltered reads, reads with different haplotypes "
                        "from the reference assembly are discarded by default.")
    p.add_argument("--min_base_cov", type=int, default=1, help=argparse.SUPPRESS)
    p.add_argument("--engine", choices=["tpu", "oracle"], default="tpu",
                   help="compute engine: TPU windowed (default) or host oracle.")
    p.add_argument("--window-len", type=int, default=1024,
                   help="device window target length (columns).")
    p.add_argument("--platform", choices=["auto", "cpu", "tpu"], default="auto",
                   help="JAX platform; 'cpu' forces host execution even when "
                        "a TPU backend is registered (the JAX_PLATFORMS env "
                        "var is ignored by some TPU plugins).")
    p.add_argument("--mesh", default="auto",
                   help="device mesh 'WINxKMER' (e.g. 4x2), 'auto' (all "
                        "devices on the win axis), or 'off' (single device).")
    p.add_argument("--resume", action="store_true",
                   help="append to an existing -o FILE, skipping contigs "
                        "already present (crash recovery).")
    p.add_argument("--verbose", action="store_true",
                   help="per-contig progress to stderr.")
    p.add_argument("--timing", action="store_true",
                   help="per-stage timing summary to stderr.")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax profiler trace to this directory.")
    p.add_argument("--version", action="version", version=__version__)
    return p


def args_to_config(a: argparse.Namespace) -> PolishConfig:
    mml, mmf = parse_min_map_len(a.min_map_len)
    return PolishConfig(
        min_kmer_count=a.min_kmer_count,
        iter_count=a.iter_count,
        min_read_len=a.min_read_len,
        min_ctg_len=a.min_ctg_len,
        max_indel_len=a.max_indel_len,
        use_supplementary=a.use_supplementary,
        use_secondary=a.use_secondary,
        use_all_reads=a.use_all_reads,
        min_map_qual=a.min_map_qual,
        min_map_len=mml,
        min_map_fra=mmf,
        max_clip_len=a.max_clip_len,
        model=a.model,
        uppercase=a.uppercase,
        out_pos=a.out_pos,
        min_base_cov=a.min_base_cov,
        window_len=a.window_len,
        threads=a.thread,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    for path in [args.bam, args.fa] + args.yak:
        if not os.path.exists(path):
            print(f"{path!r} does not exist!", file=sys.stderr)
            return 2
    # canonicalize inputs at parse time (option.rs:294-306 to_abspath_string):
    # later chdirs (or worker threads with their own cwd) must not re-resolve
    args.bam = os.path.abspath(args.bam)
    args.fa = os.path.abspath(args.fa)
    args.yak = [os.path.abspath(y) for y in args.yak]
    if args.out != "stdout":
        args.out = os.path.abspath(args.out)

    from .io.native import available as native_available

    if not native_available():
        print("nextpolish2: WARNING: native io module unavailable "
              "(io/_native build failed); falling back to the pure-Python "
              "BAM/aggregation path, which is much slower.", file=sys.stderr)
    if args.out != "stdout" and os.path.exists(args.out) and not args.resume:
        print(f"{args.out!r} already exists!", file=sys.stderr)  # option.rs:312-316
        return 2
    cfg = args_to_config(args)

    if args.platform != "auto":
        import jax

        jax.config.update("jax_platforms", args.platform)

    from .pipeline.orchestrator import PolishStats, completed_contigs, polish
    from .utils.resource import resource_str

    if args.engine == "tpu" and args.mesh != "off":
        from .parallel.mesh import auto_mesh, make_mesh, set_active_mesh

        if args.mesh == "auto":
            # kmer-axis width from the table footprint: shard tables that
            # would not fit replicated in per-device HBM (parallel/mesh.py)
            yak_bytes = sum(os.path.getsize(p) for p in args.yak
                            if os.path.exists(p))
            mesh = auto_mesh(yak_bytes=yak_bytes)
            from .parallel.mesh import axis_size

            if axis_size(mesh, "kmer") > 1:
                print(f"[np2] mesh auto: {axis_size(mesh, 'win')}x"
                      f"{axis_size(mesh, 'kmer')} (tables "
                      f"{yak_bytes/1e9:.1f} GB shard over the kmer axis)",
                      file=sys.stderr)
            set_active_mesh(mesh)
        else:
            n_win, n_kmer = (int(x) for x in args.mesh.lower().split("x"))
            set_active_mesh(make_mesh(n_win=n_win, n_kmer=n_kmer))

    from .parallel.distributed import init_distributed

    shard = init_distributed()  # no-op unless NP2_COORDINATOR is set
    out_path = args.out
    if shard.n_hosts > 1 and args.out != "stdout":
        out_path = shard.shard_path(args.out)
        # a stale .done sentinel from a crashed previous run would let host 0
        # merge while this host is still re-polishing — clear ours up front
        try:
            os.remove(f"{args.out}.shard{shard.host_id}.done")
        except OSError:
            pass
    skip = None
    if args.resume and out_path != "stdout":
        from .pipeline.orchestrator import trim_partial_output

        # trim FIRST: a record truncated mid-write must be re-polished, so it
        # must not be counted complete (and then silently lost to the trim)
        trim_partial_output(out_path, out_pos=cfg.out_pos)
        skip = completed_contigs(out_path, out_pos=cfg.out_pos)
        if skip:
            print(f"resume: skipping {len(skip)} completed contigs",
                  file=sys.stderr)
    out = sys.stdout.buffer if out_path == "stdout" else open(
        out_path, "ab" if args.resume else "wb")
    stats = PolishStats()
    from .utils import timing

    if args.timing:
        timing.enable()
    trace = timing.profiler_trace(args.profile_dir) if args.profile_dir else None
    try:
        if trace is not None:
            with trace:
                polish(args.fa, args.bam, args.yak, cfg, engine=args.engine,
                       out=out, stats=stats, skip_contigs=skip,
                       verbose=args.verbose,
                       host_shard=shard if shard.n_hosts > 1 else None)
        else:
            polish(args.fa, args.bam, args.yak, cfg, engine=args.engine,
                   out=out, stats=stats, skip_contigs=skip, verbose=args.verbose,
                   host_shard=shard if shard.n_hosts > 1 else None)
    finally:
        if out is not sys.stdout.buffer:
            out.close()
    if shard.n_hosts > 1 and args.out != "stdout" and \
            not os.environ.get("NP2_NO_AUTOMERGE"):
        from .parallel.distributed import finalize_shards

        if finalize_shards(args.out, shard, args.fa, out_pos=cfg.out_pos):
            print(f"merged {shard.n_hosts} host shards -> {args.out}",
                  file=sys.stderr)
    if args.timing:
        timing.report()
        try:
            # distinct compiled device-program shapes (each is minutes of
            # axon compile at scale; the pow2 P/Pd/Pe buckets bound this)
            from .ops import consensus as _c

            n_prog = sum(f._cache_size() for f in (
                _c.dp_backtrack_csr_blob, _c.dp_backtrack_csr_blob_sharded,
                _c.dp_backtrack_sparse_packed))
            print(f"[np2 timing] device DP programs compiled: {n_prog}",
                  file=sys.stderr)
        except Exception:
            pass
    print(resource_str(__version__), file=sys.stderr)
    print(f"Contigs: {stats.contigs} ({stats.polished} polished, "
          f"{stats.passthrough} passthrough); bases {stats.in_bases} -> "
          f"{stats.out_bases}", file=sys.stderr)
    if stats.batches:
        dense = (f", dense fallbacks: {stats.dense_reasons}"
                 if stats.dense_reasons else "")
        print(f"Device batches: {stats.batches} (cross-contig lane fill "
              f"{stats.batch_fill:.1%}, {stats.csr_batches} CSR-direct"
              f"{dense})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
