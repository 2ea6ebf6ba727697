"""Command-line interface mirroring the reference launcher.

Command dispatch follows ``bin/reflexiv:252-268`` and the per-command main
classes (``main/Main.java`` etc.); option names follow
``util/Parameter.java:68-104`` (same flags, one leading dash). The Spark
``--``-prefixed layer has no equivalent — device placement is JAX's.

Usage examples (cf. docs/example.html "Test run"):

    python -m reflexiv_tpu.cli run -fastq './example/paired_dat*.fq.gz' \
        -outfile ./result -kmer 31 -cover 3
    python -m reflexiv_tpu.cli counter -fastq reads.fq.gz -outfile ./out -kmer 31
    python -m reflexiv_tpu.cli meta -fastq reads.fq.gz -outfile ./out
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import sys
import time

from . import __version__
from .params import DEFAULT_KLIST, Params

log = logging.getLogger("reflexiv_tpu")

COMMANDS = (
    "run", "meta", "counter", "reduce", "reassembler",
    "merger", "mercy", "preprocess", "stitch",
)


def _add_common(p: argparse.ArgumentParser) -> None:
    # input (Parameter.java:68-104 option names)
    p.add_argument("-fastq", help="input FASTQ file(s), glob/comma list")
    p.add_argument("-fasta", help="input FASTA file(s)")
    p.add_argument("-paired", help="paired FASTQ files 'mate1,mate2'")
    p.add_argument("-single", help="single-end FASTQ file(s)")
    p.add_argument("-inter", help="interleaved paired FASTQ file(s)")
    p.add_argument("-kmerc", help="counted k-mer CSV input (skip counting)")
    p.add_argument("-frag", help="pre-assembled contig/fragment FASTA")
    p.add_argument("-contig", help="input contig FASTA (merger/stitch/"
                   "reassembler; alias of -frag)")
    p.add_argument("-outfile", required=True, help="output directory")
    p.add_argument("-infmt", default="auto",
                   help="input compression format (reference: 4mc/gzip/"
                        "bzip; here loaders sniff by extension)")
    p.add_argument("-reads", type=int, default=0,
                   help="use only the first N input reads (0 = all)")
    # k-mer geometry
    p.add_argument("-kmer", type=int, default=31, help="k-mer size (default 31)")
    p.add_argument("-klist", default=",".join(map(str, DEFAULT_KLIST)),
                   help="comma list of k sizes for dynamic assembly")
    p.add_argument("-overlap", type=int, default=0,
                   help="overlap between adjacent k-mers (parsed but unused "
                        "by every reference pipeline; kept for parity)")
    # coverage
    p.add_argument("-cover", type=int, default=2,
                   help="min k-mer coverage (default 2)")
    p.add_argument("-maxcov", type=int, default=10_000_000,
                   help="max k-mer coverage")
    p.add_argument("-error", type=int, default=None,
                   help="min error-correction coverage (default 4*2)")
    # contig / iteration
    p.add_argument("-mincontig", type=int, default=500,
                   help="min contig length to report")
    p.add_argument("-maxiter", type=int, default=150)
    p.add_argument("-miniter", type=int, default=15)
    p.add_argument("-bubble", dest="bubble", action="store_false",
                   default=True,
                   help="set to NOT remove bubbles: skips both fork-filter "
                        "stages (Parameter.java:209-210 disable switch)")
    p.add_argument("-stitch", action="store_true",
                   help="disable stitch k-mers (reference STITCH option "
                        "is also a disable switch)")
    # clipping / filtering
    p.add_argument("-clipf", type=int, default=0, help="front clip")
    p.add_argument("-clipe", type=int, default=0, help="end clip")
    p.add_argument("-minlength", type=int, default=0,
                   help="drop reads shorter than this")
    p.add_argument("-trustqual", type=int, default=0,
                   help="preprocess: never correct bases with phred >= N "
                        "(quality-aware correction; 0 = coverage-only)")
    # misc
    p.add_argument("-gzip", action="store_true", help="gzip outputs")
    p.add_argument("-accurate", action="store_true",
                   help="sensitive mode (mercy k-mers)")
    p.add_argument("-patch", action="store_true",
                   help="meta: enable the read-pair contig connection "
                        "stage (the reference ships it disabled)")
    p.add_argument("-scaffold", action="store_true",
                   help="meta: with -patch, execute overlap-less supported "
                        "links as N-gap scaffolds (implies -patch)")
    p.add_argument("-partition", type=int, default=0,
                   help="re-partition number (>1 forces chunked streaming "
                        "counting in that many row batches, the analog of "
                        "the reference's repartition(n) memory control)")
    p.add_argument("-partitionredu", type=int, default=0,
                   help="shuffle partition count (informational; sharding "
                        "is mesh-driven)")
    p.add_argument("-cache", action="store_true",
                   help="cache intermediate data (informational; arrays "
                        "stay device-resident)")
    p.add_argument("-mode", default="", help="pipeline mode string")
    p.add_argument("-sbin", default=None,
                   help="external binary dir (reference-only: flash/"
                        "minimap2 live in-process here; ignored)")
    p.add_argument("-seed", type=int, default=0,
                   help="orientation-draw seed (TPU build extra)")


def params_from_args(args: argparse.Namespace) -> Params:
    # -paired/-single/-inter are alternative read sources; counting and
    # assembly are pair-agnostic, so they fold into the fastq pattern
    # (preprocess treats an exactly-two-file input as a mate pair)
    fastq = args.fastq
    for alt in (args.paired, args.single, args.inter):
        if alt and not fastq:
            fastq = alt
    return Params(
        k=args.kmer,
        klist=tuple(int(x) for x in args.klist.split(",")),
        min_kmer_coverage=args.cover,
        max_kmer_coverage=args.maxcov,
        # the reference keeps minErrorCoverage at its constructed default
        # (4 * default cover = 8) unless -error is given; see params.py
        min_error_coverage=args.error if args.error is not None else 8,
        min_contig=args.mincontig,
        max_iterations=args.maxiter,
        min_iterations=args.miniter,
        bubble=args.bubble,
        front_clip=args.clipf,
        end_clip=args.clipe,
        min_read_length=args.minlength,
        read_limit=args.reads,
        trust_quality=args.trustqual,
        kmer_overlap=args.overlap,
        stitch_kmer=not args.stitch,
        input_fastq=fastq,
        input_fasta=args.fasta,
        input_kmer=args.kmerc,
        input_contig=args.frag or args.contig,
        output_path=args.outfile,
        gzip_output=args.gzip,
        partitions=args.partition,
        shuffle_partitions=args.partitionredu,
        cache=args.cache,
        sensitive=args.accurate,
        interleaved=bool(args.inter),
        input_format=args.infmt,
        mode=args.mode,
        patch=args.patch or args.scaffold,
        scaffold=args.scaffold,
    )


def _load_read_matrix(params: Params):
    from .io import load_reads_filtered

    pattern = params.input_fastq or params.input_fasta
    if not pattern:
        raise SystemExit("error: provide -fastq or -fasta input")
    mat, lens = load_reads_filtered(pattern, params)
    if mat.shape[0] == 0:
        raise SystemExit(f"error: no reads found in {pattern}")
    return mat, lens


def cmd_counter(params: Params, seed: int) -> None:
    """K-mer counting only (MainOfCounter -> ReflexivDataFrameCounter).

    With ``-frag``/``-contig``, also counts k-mers from the fragment
    contigs (``ReflexivDataFrameReAssembleCounter``: contig input at
    ``:138-149``, contig k-mer extraction
    ``ReverseComplementKmerBinaryExtractionFromContig``): contigs enter the
    same pass as (k-1)-overlap segments, so their k-mer multiset is exact.
    """
    from .count import count_kmers, count_kmers_from_files
    from .io import ingest_budget_bytes
    from .kmer_io import write_count_table

    budget = ingest_budget_bytes()
    # read counting with the read filters (clips); fragments count in their
    # own unclipped pass below — clips are read-trimming semantics and must
    # not drop interior contig k-mers at segment boundaries
    if budget:
        pattern = params.input_fastq or params.input_fasta
        if not pattern:
            raise SystemExit("error: provide -fastq or -fasta input")
        limbs, counts = count_kmers_from_files(
            pattern, k=params.k, min_cov=1, max_cov=2_000_000_000,
            front_clip=params.front_clip, end_clip=params.end_clip,
            params=params, budget_bytes=budget,
        )
        mat = None
    else:
        mat, lens = _load_read_matrix(params)
        limbs, counts = count_kmers(
            mat, lens, k=params.k,
            min_cov=1, max_cov=2_000_000_000,
            front_clip=params.front_clip, end_clip=params.end_clip,
        )
    if params.input_contig:
        import numpy as _np

        import jax.numpy as _jnp

        from .count import merge_count_tables
        from .io import contigs_to_segment_matrix, expand_paths, iter_fasta

        frags = [
            s.decode()
            for _name, s in iter_fasta(expand_paths(params.input_contig))
        ]
        fmat, flens = contigs_to_segment_matrix(
            frags, k=params.k,
            seg=max(mat.shape[1] if mat is not None else 0, 256))
        flimbs, fcounts = count_kmers(
            fmat, flens, k=params.k, min_cov=1, max_cov=2_000_000_000)
        log.info("injected %d fragment segments into counting", len(flens))

        def _pow2pad(a, c):
            n = len(c)
            cap = 1
            while cap < max(n, 1):
                cap <<= 1
            return (_np.pad(a, ((0, cap - n), (0, 0))),
                    _np.pad(c, (0, cap - n)))

        tl, tc = _pow2pad(limbs, counts)
        pl, pc = _pow2pad(flimbs, fcounts)
        mlimbs, mcounts, keep = merge_count_tables(
            _jnp.asarray(tl), _jnp.asarray(tc),
            _jnp.asarray(pl), _jnp.asarray(pc))
        keep_np = _np.asarray(keep)
        limbs = _np.asarray(mlimbs)[keep_np]
        counts = _np.asarray(mcounts)[keep_np]
    band = (counts >= params.min_kmer_coverage) & (
        counts <= params.max_kmer_coverage)
    limbs, counts = limbs[band], counts[band]
    out_dir = os.path.join(params.output_path, f"Count_{params.k}")
    path = write_count_table(out_dir, limbs, counts, params.k,
                             gzip_output=True)
    log.info("wrote %d k-mers to %s", len(counts), path)


def _auto_mesh():
    """One mesh over every local device when more than one is present
    (sharded counting/extension), else None (single-chip drivers)."""
    import jax

    devices = jax.devices()
    if len(devices) < 2:
        return None
    from .parallel import make_mesh

    return make_mesh(devices)


def cmd_run(params: Params, seed: int) -> None:
    """Single-k assembly (Main -> ReflexivDSMain.assembly)."""
    from .assembler import assemble_from_counts, assemble_reads
    from .io import (ingest_budget_bytes, write_contigs_fasta,
                     write_success_marker)
    from .kmer_io import read_count_table

    if params.input_kmer:
        limbs, counts = read_count_table(params.input_kmer, params.k)
        # coverage band applies to pre-counted input too
        keep = (counts >= params.min_kmer_coverage) & (
            counts <= params.max_kmer_coverage)
        contigs = assemble_from_counts(
            limbs[keep], counts[keep], params, seed=seed)
    elif ingest_budget_bytes():
        # out-of-core: count straight from disk (bounded chunks), then
        # assemble from the table — the read matrix never materializes
        from .count import count_kmers_from_files

        pattern = params.input_fastq or params.input_fasta
        if not pattern:
            raise SystemExit("error: provide -fastq or -fasta input")
        limbs, counts = count_kmers_from_files(
            pattern, k=params.k,
            min_cov=params.min_kmer_coverage,
            max_cov=params.max_kmer_coverage,
            front_clip=params.front_clip, end_clip=params.end_clip,
            params=params, budget_bytes=ingest_budget_bytes(),
        )
        contigs = assemble_from_counts(limbs, counts, params, seed=seed)
    else:
        mat, lens = _load_read_matrix(params)
        mesh = _auto_mesh()
        if mesh is not None:
            from .parallel import assemble_reads_sharded

            contigs = assemble_reads_sharded(
                mat, lens, params, mesh=mesh, seed=seed)
        else:
            contigs = assemble_reads(mat, lens, params, seed=seed)
    out = params.output_path
    write_contigs_fasta(os.path.join(out, "part-00000"), contigs,
                        gzip_output=params.gzip_output)
    write_success_marker(out)
    from .contigs import assembly_stats, write_assembly_report

    stats = assembly_stats(contigs)
    write_assembly_report(os.path.join(out, "assembly_report.txt"), contigs)
    log.info(
        "wrote %d contigs to %s (canonicalized: n=%d total=%dbp "
        "longest=%d N50=%d)", len(contigs), out, stats["n_contigs"],
        stats["total_bp"], stats["longest"], stats["n50"],
    )


def cmd_meta(params: Params, seed: int) -> None:
    """Dynamic multi-k assembly (MainMeta -> staged dynamic pipe)."""
    from .dynamic import dynamic_assembly

    dynamic_assembly(params, seed=seed)


def cmd_reduce(params: Params, seed: int) -> None:
    """Multi-k counting + sorting + reduction (MainOfReduce)."""
    from .dynamic import dynamic_reduction

    dynamic_reduction(params, seed=seed)


def cmd_reassembler(params: Params, seed: int) -> None:
    from .reassemble import reassemble

    reassemble(params, seed=seed)


def cmd_merger(params: Params, seed: int) -> None:
    from .merger import merge_contigs_cmd

    merge_contigs_cmd(params)


def cmd_mercy(params: Params, seed: int) -> None:
    from .mercy import mercy_assembly

    mercy_assembly(params, seed=seed)


def cmd_preprocess(params: Params, seed: int) -> None:
    from .preprocess import preprocess

    preprocess(params)


def cmd_stitch(params: Params, seed: int) -> None:
    from .stitch import stitch

    stitch(params, seed=seed)


def _enable_compilation_cache() -> None:
    """Persist compiled executables across runs: the extension loop compiles
    one program per (rows, seq-length) capacity pair, which is expensive on
    backends with slow (remote) compilation.

    TPU-only: XLA:CPU AOT artifacts bake in host CPU features, and loading a
    cache entry written on a different machine type can SIGILL/segfault
    (observed crashing inside backend_compile_and_load on this fleet)."""
    try:
        import jax

        if jax.devices()[0].platform != "tpu":
            return
        cache_dir = os.environ.get(
            "REFLEXIV_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "reflexiv_tpu"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="Reflexiv %(asctime)s %(message)s", datefmt="%H:%M:%S",
    )
    # honor JAX_PLATFORMS even where a sitecustomize pins its own platform
    # list after reading the env (observed on this fleet: the env var alone
    # is silently overridden; re-apply it through jax.config)
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        try:
            import jax

            jax.config.update("jax_platforms", plats)
        except Exception:  # noqa: BLE001 — leave the default platform
            pass
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(
        prog="reflexiv-tpu",
        description="TPU-native de novo genome assembler "
                    f"(v{__version__}; Reflexiv method)",
    )
    parser.add_argument(
        "-version", action="version", version=f"reflexiv-tpu {__version__}"
    )
    sub = parser.add_subparsers(dest="command", required=True)
    for cmd in COMMANDS:
        sp = sub.add_parser(cmd)
        _add_common(sp)
    args = parser.parse_args(argv)
    params = params_from_args(args)
    params.validate()

    t0 = time.time()
    from . import metrics

    m = metrics.reset()
    handler = globals()[f"cmd_{args.command}"]
    with m.stage(args.command):
        handler(params, args.seed)
    if params.output_path:
        path = m.write(params.output_path)
        log.info("metrics written to %s", path)
    log.info("%s finished in %.1f s", args.command, time.time() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
