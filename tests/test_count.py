import numpy as np
import pytest
import jax.numpy as jnp

from reflexiv_tpu import bitpack, count
from reflexiv_tpu.io import reads_to_matrix
from oracle import count_kmers as oracle_count


def _random_reads(rng, genome_len=300, n_reads=60, read_len=50):
    genome = "".join(rng.choice(list("ACGT")) for _ in range(genome_len))
    reads = []
    for _ in range(n_reads):
        start = rng.randrange(genome_len - read_len)
        r = genome[start:start + read_len]
        if rng.random() < 0.5:
            r = r[::-1].translate(str.maketrans("ACGT", "TGCA"))
        reads.append(r)
    return reads


def _table_to_dict(limbs, counts, k):
    out = {}
    for row, c in zip(limbs, counts):
        out[bitpack.decode_to_str(
            np.asarray(bitpack.unpack_bases(jnp.asarray(row), k)))] = int(c)
    return out


def test_count_matches_oracle():
    import random
    rng = random.Random(7)
    reads = _random_reads(rng)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    for k, min_cov in ((15, 1), (21, 2), (31, 1)):
        limbs, counts = count.count_kmers(
            mat, lens, k=k, min_cov=min_cov)
        got = _table_to_dict(limbs, counts, k)
        want = oracle_count(reads, k, min_cov=min_cov)
        assert got == want


def test_count_respects_clipping_and_short_reads():
    reads = ["ACGTACGTACGTACGTA", "ACGTACGTACGTACG"]  # 17bp and 15bp
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    k = 13
    # 15bp read: 15 - 13 - 0 <= 1 -> whole read skipped (ReflexivDSMain.java:3968)
    limbs, counts = count.count_kmers(mat, lens, k=k, min_cov=1)
    want = oracle_count(reads, k, min_cov=1)
    assert _table_to_dict(limbs, counts, k) == want

    limbs, counts = count.count_kmers(
        mat, lens, k=k, min_cov=1, front_clip=2, end_clip=1)
    want = oracle_count(reads, k, min_cov=1, front_clip=2, end_clip=1)
    assert _table_to_dict(limbs, counts, k) == want


def test_max_coverage_band():
    reads = ["AAAAAAAAAAAAAAAAAAAA"] * 5 + ["ACGTACGTACGTACGTACGT"]
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    k = 15
    limbs, counts = count.count_kmers(mat, lens, k=k, min_cov=1, max_cov=4)
    got = _table_to_dict(limbs, counts, k)
    want = oracle_count(reads, k, min_cov=1, max_cov=4)
    assert got == want
    assert all(c <= 4 for c in got.values())


def test_partition_flag_forces_streaming_same_result():
    """-partition N chunks the counting pass; the merged table must equal
    the single-pass table."""
    import random

    import numpy as np

    from reflexiv_tpu.dynamic import count_kmers_auto
    from reflexiv_tpu.io import reads_to_matrix

    rng = random.Random(4)
    genome = "".join(rng.choice("ACGT") for _ in range(400))
    reads = [genome[i:i + 70] for i in range(0, 330, 3)]
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    one = count_kmers_auto(mat, lens, k=21, min_cov=2, max_cov=10**7)
    four = count_kmers_auto(
        mat, lens, k=21, min_cov=2, max_cov=10**7, partitions=4)

    def table(t):
        return sorted(map(tuple, np.c_[t[0], t[1]].tolist()))

    assert table(one) == table(four)


def test_contig_segment_matrix_preserves_kmer_multiset():
    """Splitting contigs into (k-1)-overlap segments must count exactly the
    same canonical k-mer multiset as the whole contigs."""
    import random
    from collections import Counter

    import oracle
    from reflexiv_tpu.count import count_kmers
    from reflexiv_tpu.io import contigs_to_segment_matrix

    rng = random.Random(11)
    k = 21
    contigs = [
        "".join(rng.choice("ACGT") for _ in range(n))
        for n in (5000, 301, 77, k + 2, k + 1, 10)  # incl. filtered shorts
    ]
    mat, lens = contigs_to_segment_matrix(contigs, k=k, seg=256)
    limbs, counts = count_kmers(mat, lens, k=k, min_cov=1)
    want = Counter()
    for c in contigs:
        if len(c) < k + 2:
            continue
        for i in range(len(c) - k + 1):
            want[oracle.canonical(c[i:i + k])] += 1
    import numpy as np

    from reflexiv_tpu import bitpack

    got = Counter()
    for row, n in zip(limbs, counts):
        s = bitpack.decode_to_str(
            np.asarray(bitpack.unpack_bases(row, k)))
        got[s] += int(n)
    assert got == want


@pytest.mark.slow
def test_counter_cli_with_fragments(tmp_path):
    """`counter -frag` counts read AND fragment k-mers
    (ReflexivDataFrameReAssembleCounter)."""
    import gzip
    import random
    import subprocess
    import sys

    rng = random.Random(5)
    genome = "".join(rng.choice("ACGT") for _ in range(400))
    reads = [genome[i:i + 60] for i in range(0, 200, 5)]
    with open(tmp_path / "reads.fq", "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    with open(tmp_path / "frags.fa", "w") as fh:
        fh.write(f">f0\n{genome[270:390]}\n")
    env = dict(JAX_PLATFORMS="cpu", PATH="/usr/bin:/bin",
               HOME="/root")
    out = subprocess.run(
        [sys.executable, "-m", "reflexiv_tpu.cli", "counter",
         "-fastq", str(tmp_path / "reads.fq"),
         "-frag", str(tmp_path / "frags.fa"),
         "-kmer", "21", "-cover", "1", "-clipf", "5",
         "-outfile", str(tmp_path / "out")],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import glob

    files = glob.glob(str(tmp_path / "out" / "Count_21" / "part*"))
    assert files
    opener = gzip.open if files[0].endswith(".gz") else open
    with opener(files[0], "rt") as fh:
        table = dict(
            line.strip().split(",") for line in fh if line.strip())
    # a k-mer present only in the fragment (not covered by reads) counted;
    # it sits in the fragment's first clipf windows, so it also proves read
    # clipping does not clip fragment segments
    import oracle
    frag_only = oracle.canonical(genome[270:291])
    assert frag_only in table
