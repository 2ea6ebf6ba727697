"""CLI integration: command round trips on the reference example data."""
import os

import pytest

from reflexiv_tpu.cli import main

EXAMPLE = "/root/reference/example/paired_dat*.fq.gz"
pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/example/paired_dat1.fq.gz"),
    reason="reference example data not mounted",
)


def _read_fasta_lens(path):
    out = []
    cur = 0
    for line in open(path):
        line = line.strip()
        if line.startswith(">"):
            if cur:
                out.append(cur)
            cur = 0
        else:
            cur += len(line)
    if cur:
        out.append(cur)
    return sorted(out)


@pytest.mark.slow
def test_counter_then_run_from_kmerc_matches_golden(tmp_path):
    out1 = str(tmp_path / "cnt")
    main(["counter", "-fastq", EXAMPLE, "-outfile", out1,
          "-kmer", "31", "-cover", "3"])
    table = os.path.join(out1, "Count_31")
    assert os.path.exists(os.path.join(table, "_SUCCESS"))

    out2 = str(tmp_path / "asm")
    main(["run", "-kmerc", table, "-outfile", out2,
          "-kmer", "31", "-cover", "3"])
    lens = _read_fasta_lens(os.path.join(out2, "part-00000"))
    assert lens == [4558, 4558]


@pytest.mark.slow
def test_run_direct_matches_golden(tmp_path):
    out = str(tmp_path / "run")
    main(["run", "-fastq", EXAMPLE, "-outfile", out,
          "-kmer", "31", "-cover", "3"])
    lens = _read_fasta_lens(os.path.join(out, "part-00000"))
    assert lens == [4558, 4558]
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


@pytest.mark.slow
def test_run_writes_assembly_report(tmp_path):
    import random

    import oracle
    from reflexiv_tpu.cli import main as cli_main

    rng = random.Random(3)
    genome = "".join(rng.choice("ACGT") for _ in range(900))
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as fh:
        i = 0
        for _ in range(12):
            for s in range(0, 840, 20):
                r = genome[s:s + 60]
                if rng.random() < 0.5:
                    r = oracle.revcomp(r)
                fh.write(f"@r{i}\n{r}\n+\n{'I'*len(r)}\n")
                i += 1
    out = tmp_path / "out"
    rc = cli_main([
        "run", "-fastq", str(fq), "-outfile", str(out),
        "-kmer", "21", "-cover", "2", "-mincontig", "300",
    ])
    assert rc == 0
    report = (out / "assembly_report.txt").read_text()
    assert "n_contigs\t" in report and "n50\t" in report
    assert "# per-contig" in report


def test_count_kmers_rejects_over_2g_windows():
    import numpy as np
    import pytest
    from reflexiv_tpu.count import count_kmers

    with pytest.raises(ValueError, match="2\\^31"):
        count_kmers(
            np.zeros((2**26, 64), np.uint8),  # 2^26 * 34 windows > 2^31
            np.full(2**26, 64, np.int32), k=31, min_cov=2,
        )


@pytest.mark.slow
def test_minlength_filters_short_reads(tmp_path):
    import random

    import oracle
    from reflexiv_tpu.cli import main as cli_main

    rng = random.Random(5)
    genome = "".join(rng.choice("ACGT") for _ in range(700))
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as fh:
        i = 0
        for _ in range(10):
            for s in range(0, 640, 20):
                r = genome[s:s + 60]
                fh.write(f"@r{i}\n{r}\n+\n{'I'*len(r)}\n")
                i += 1
        # junk short reads that would otherwise contribute noise k-mers
        for _ in range(50):
            r = "".join(rng.choice("ACGT") for _ in range(25))
            fh.write(f"@junk{i}\n{r}\n+\n{'I'*len(r)}\n")
            i += 1
    out = tmp_path / "out"
    rc = cli_main([
        "run", "-fastq", str(fq), "-outfile", str(out),
        "-kmer", "21", "-cover", "2", "-mincontig", "300",
        "-minlength", "40",
    ])
    assert rc == 0
    from reflexiv_tpu.io import iter_fasta

    seqs = [s.decode() for _, s in iter_fasta([str(out / "part-00000")])]
    assert any(len(s) >= 600 for s in seqs)


def test_reads_limit_and_parity_flags_parse(tmp_path):
    """-reads truncates the input; the reference-parity flags (-overlap,
    -stitch, -infmt, -mode, -cache, -sbin, -partitionredu, -contig) are
    accepted (Parameter.java:68-104 option surface)."""
    import random

    from reflexiv_tpu.cli import main as cli_main, params_from_args
    import argparse

    rng = random.Random(11)
    genome = "".join(rng.choice("ACGT") for _ in range(500))
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as fh:
        i = 0
        for _ in range(8):
            for s in range(0, 440, 20):
                r = genome[s:s + 60]
                fh.write(f"@r{i}\n{r}\n+\n{'I'*len(r)}\n")
                i += 1
    out = tmp_path / "cnt"
    rc = cli_main([
        "counter", "-fastq", str(fq), "-outfile", str(out),
        "-kmer", "21", "-cover", "1", "-reads", "4",
        "-overlap", "20", "-stitch", "-infmt", "gzip", "-mode", "fast",
        "-cache", "-sbin", "/usr/bin", "-partitionredu", "8",
    ])
    assert rc == 0
    # only the first 4 reads contribute: <= 4*(60-21+1) distinct k-mers
    n_lines = 0
    import gzip, glob, os as _os
    for p in glob.glob(str(out / "Count_21" / "part-*")):
        op = gzip.open if p.endswith(".gz") else open
        with op(p, "rt") as fh:
            n_lines += sum(1 for _ in fh)
    assert 0 < n_lines <= 4 * 40

    # params plumbing for the parity flags
    from reflexiv_tpu.params import Params
    ns = argparse.Namespace(
        fastq=str(fq), fasta=None, paired=None, single=None, inter=None,
        kmerc=None, frag=None, contig="c.fa", outfile=str(out),
        infmt="gzip", reads=4, kmer=21, klist="21,31", overlap=20,
        cover=1, maxcov=100, error=None, mincontig=300, maxiter=10,
        miniter=2, bubble=True, stitch=True, clipf=0, clipe=0,
        minlength=0, trustqual=25, gzip=False, accurate=False, partition=2,
        partitionredu=8, cache=True, mode="fast", sbin=None, seed=0,
        patch=False, scaffold=True,
    )
    p = params_from_args(ns)
    assert p.read_limit == 4 and p.kmer_overlap == 20
    assert p.trust_quality == 25
    assert p.stitch_kmer is False and p.cache is True
    assert p.input_contig == "c.fa" and p.shuffle_partitions == 8
    assert p.input_format == "gzip" and p.mode == "fast"
    assert p.patch is True and p.scaffold is True  # -scaffold implies -patch


@pytest.mark.slow
def test_meta_consumes_prior_reduce_artifacts(tmp_path, caplog):
    """`reduce` then `meta` in the same output dir: meta must start from the
    Count_*_reduced tables (Pipelines.java:857) and still reach the golden
    contig."""
    import logging

    out = str(tmp_path / "out")
    args = ["-fastq", EXAMPLE, "-klist", "23,31,41", "-cover", "3",
            "-outfile", out]
    main(["reduce"] + args)
    assert os.path.exists(os.path.join(out, "Count_41_reduced", "_SUCCESS"))
    # stitch k-mer pass (Pipelines.java:1665-1733): cov-1 31-mers sorted
    stitch_tab = os.path.join(
        out, "Stitch_kmer", "Count_31_sorted", "part-00000.csv")
    assert os.path.exists(stitch_tab)
    with open(stitch_tab) as fh:
        first = fh.readline().strip()
    assert first and "|" in first.split(",")[1]
    with caplog.at_level(logging.INFO, logger="reflexiv_tpu"):
        main(["meta"] + args)
    assert any("consuming Count_*_reduced" in r.message for r in caplog.records)
    lens = _read_fasta_lens(os.path.join(out, "Assembly", "part-00000"))
    assert lens and lens[-1] >= 4500
