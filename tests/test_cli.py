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


def test_run_direct_matches_golden(tmp_path):
    out = str(tmp_path / "run")
    main(["run", "-fastq", EXAMPLE, "-outfile", out,
          "-kmer", "31", "-cover", "3"])
    lens = _read_fasta_lens(os.path.join(out, "part-00000"))
    assert lens == [4558, 4558]
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
