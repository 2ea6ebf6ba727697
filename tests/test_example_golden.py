"""Golden test on the reference's bundled example dataset.

The reference docs (``/root/reference/docs/example.html``, "Test run") show
that ``reflexiv run -fastq './example/paired_dat*.fq.gz' -kmer 31 -cover 3``
assembles the 2x1150x100bp simulated reads into a single contig
``>Contig-4558-0`` (4,558 bp) recovering a 4,576 bp E. coli fragment (ground
truth encoded in the read IDs ``@NODE_1_length_4576_cov_14.939248-...``).
Parity is defined as canonicalized contig-set equality (reference output
orientation is scan-order dependent, SURVEY.md section 5).
"""
import os

import pytest

from reflexiv_tpu.assembler import assemble_reads
from reflexiv_tpu.contigs import canonical_set, revcomp_str
from reflexiv_tpu.io import load_reads
from reflexiv_tpu.params import Params

EXAMPLE = "/root/reference/example/paired_dat*.fq.gz"


@pytest.mark.skipif(
    not os.path.exists("/root/reference/example/paired_dat1.fq.gz"),
    reason="reference example data not mounted",
)
@pytest.mark.slow
def test_example_assembles_to_golden_contig():
    mat, lens = load_reads(EXAMPLE)
    assert mat.shape[0] == 2300
    params = Params(k=31, min_kmer_coverage=3, min_contig=500)
    contigs = assemble_reads(mat, lens, params, seed=0)

    # reference emits one contig per strand; canonicalized -> exactly one
    assert len(contigs) == 2
    canon = canonical_set(contigs)
    assert len(canon) == 1
    (contig,) = canon
    assert len(contig) == 4558  # golden length from docs/example.html

    # the two emitted records must be exact reverse complements
    seqs = [seq for _, seq in contigs]
    assert seqs[0] == revcomp_str(seqs[1])

    # internal consistency: every read 31-mer band of the contig is covered
    # by the solid k-mer set (spot check: contig contains no N and is ACGT)
    assert set(contig) <= set("ACGT")


@pytest.mark.skipif(
    not os.path.exists("/root/reference/example/paired_dat1.fq.gz"),
    reason="reference example data not mounted",
)
@pytest.mark.slow
def test_example_meta_assembles_to_golden_contig():
    """meta (the production dynamic-k pipeline, Pipelines.java:840-1291) on
    the reference example: one canonical contig covering the 4,576 bp source
    at least as completely as the single-k run's 4,558 bp."""
    from reflexiv_tpu.dynamic import assemble_dynamic

    mat, lens = load_reads(EXAMPLE)
    params = Params(
        klist=(23, 31, 41, 53, 67, 81), min_kmer_coverage=3, min_contig=500)
    contigs = assemble_dynamic(mat, lens, params, seed=0)
    canon = canonical_set(contigs)
    assert len(canon) == 1
    (contig,) = canon
    # run recovers 4,558 bp; meta's end-extension recovers more of the
    # 4,576 bp source, never beyond it
    assert 4558 <= len(contig) <= 4576
    # contig ID format parity: >Contig-<len>-(<left>,<right>)-<idx>
    header = contigs[0][0]
    assert header.startswith(">Contig-") and "(" in header and ")" in header
