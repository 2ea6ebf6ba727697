import random
import numpy as np
import pytest

from reflexiv_tpu import native
from reflexiv_tpu.io import iter_fastq, reads_to_matrix, expand_paths


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_fastq_matches_python():
    paths = expand_paths("/root/reference/example/paired_dat*.fq.gz")
    codes_n, lens_n = native.load_reads_native(paths, fmt=0)
    seqs = list(iter_fastq(paths))
    codes_p, lens_p = reads_to_matrix(seqs)
    assert codes_n.shape == codes_p.shape
    np.testing.assert_array_equal(lens_n, lens_p)
    np.testing.assert_array_equal(codes_n, codes_p)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_fasta(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">a\nACGT\nACGT\n>b desc\nTTTT\n")
    codes, lens = native.load_reads_native([str(p)], fmt=1)
    assert lens.tolist() == [8, 4]
    assert codes[0, :8].tolist() == [0, 1, 2, 3, 0, 1, 2, 3]
    assert codes[1, :4].tolist() == [3, 3, 3, 3]


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_merge_pairs_matches_python():
    import random
    import oracle
    from reflexiv_tpu.preprocess import merge_pairs

    rng = random.Random(2)
    pairs = []
    for _ in range(30):
        insert = "".join(rng.choice("ACGT") for _ in range(140))
        r1 = insert[:90]
        r2 = oracle.revcomp(insert[60:140])
        pairs.append((r1, r2))
    # one non-overlapping pair
    pairs.append((
        "".join(rng.choice("ACGT") for _ in range(90)),
        "".join(rng.choice("ACGT") for _ in range(90)),
    ))
    m1, l1 = reads_to_matrix([a.encode() for a, _ in pairs])
    m2, l2 = reads_to_matrix([b.encode() for _, b in pairs])
    best = native.merge_pairs_native(
        m1, l1, m2, l2, min_overlap=10, max_mismatch=0.25)
    # python merge path (which itself prefers native; compare to expected)
    merged, mask = merge_pairs(m1, l1, m2, l2)
    assert mask[:-1].all()
    assert (best[:30] >= 10).all()


def test_native_dedup_matches_python():
    import random

    import oracle
    from reflexiv_tpu import native
    from reflexiv_tpu.contigs import revcomp_str

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = random.Random(4)
    base = ["".join(rng.choice("ACGT") for _ in range(n))
            for n in (700, 650, 600, 120, 80)]
    contigs = list(base)
    contigs.append(base[0][100:400])                 # contained
    contigs.append(revcomp_str(base[1][50:500]))     # RC-contained
    contigs.append(base[2])                          # exact duplicate
    contigs.append(revcomp_str(base[3]))             # RC duplicate (short)
    contigs.append("".join(rng.choice("ACGT") for _ in range(500)))
    got = native.dedup_contigs_native(contigs)

    # Python oracle: the fallback body of dedup_contigs
    def py_dedup(cs):
        out = []
        for s in sorted(set(cs), key=len, reverse=True):
            rc = revcomp_str(s)
            if not any(s in t or rc in t for t in out):
                out.append(s)
        return out

    assert sorted(got) == sorted(py_dedup(contigs))


def test_native_dedup_large_random():
    import random

    from reflexiv_tpu import native
    from reflexiv_tpu.contigs import revcomp_str

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = random.Random(9)
    contigs = []
    for _ in range(60):
        s = "".join(rng.choice("ACGT") for _ in range(rng.randrange(60, 900)))
        contigs.append(s)
        if rng.random() < 0.5 and len(s) > 120:
            a = rng.randrange(0, len(s) - 100)
            frag = s[a:a + rng.randrange(60, len(s) - a)]
            contigs.append(frag if rng.random() < 0.5 else revcomp_str(frag))

    def py_dedup(cs):
        out = []
        for s in sorted(set(cs), key=len, reverse=True):
            rc = revcomp_str(s)
            if not any(s in t or rc in t for t in out):
                out.append(s)
        return out

    got = native.dedup_contigs_native(contigs)
    assert sorted(got) == sorted(py_dedup(contigs))


def test_splittable_fastq_ingest_matches_python(tmp_path, monkeypatch):
    """Byte-range-split multithreaded plain-FASTQ ingest must decode exactly
    what the Python reader does (records in file order), including quality
    lines that start with '@'."""
    import numpy as np

    from reflexiv_tpu import native
    from reflexiv_tpu.io import iter_fastq, reads_to_matrix

    if not native.available():
        pytest.skip("native library unavailable")
    rng = random.Random(6)
    path = tmp_path / "big.fq"
    with open(path, "w") as fh:
        for i in range(5000):
            n = rng.randrange(40, 130)
            seq = "".join(rng.choice("ACGT") for _ in range(n))
            # quality line deliberately starts with '@' sometimes
            q0 = "@" if i % 3 == 0 else "I"
            fh.write(f"@r{i} x\n{seq}\n+\n{q0}{'I' * (n - 1)}\n")
    monkeypatch.setattr(native, "SPLIT_MIN_BYTES", 1)
    got = native.load_reads_native([str(path)], fmt=0, threads=5)
    assert got is not None
    mat, lens = reads_to_matrix(list(iter_fastq([str(path)])))
    assert np.array_equal(got[1], lens)
    assert got[0].shape == mat.shape
    assert np.array_equal(got[0], mat)


def test_multifile_parallel_ingest(tmp_path):
    import numpy as np

    from reflexiv_tpu import native
    from reflexiv_tpu.io import iter_fastq, reads_to_matrix

    if not native.available():
        pytest.skip("native library unavailable")
    rng = random.Random(7)
    paths = []
    for j in range(4):
        p = tmp_path / f"f{j}.fq"
        with open(p, "w") as fh:
            for i in range(200):
                n = rng.randrange(30, 90)
                seq = "".join(rng.choice("ACGT") for _ in range(n))
                fh.write(f"@r{j}_{i}\n{seq}\n+\n{'I' * n}\n")
        paths.append(str(p))
    got = native.load_reads_native(paths, fmt=0, threads=4)
    mat, lens = reads_to_matrix(list(iter_fastq(paths)))
    assert np.array_equal(got[1], lens)
    assert np.array_equal(got[0], mat)


def test_splittable_ingest_handles_overlong_lines(tmp_path, monkeypatch):
    """Sequence lines longer than the 1MB parser buffer must decode intact
    (phase tracking survives multi-chunk lines in both scan and load)."""
    import numpy as np

    from reflexiv_tpu import native
    from reflexiv_tpu.io import iter_fastq, reads_to_matrix

    if not native.available():
        pytest.skip("native library unavailable")
    rng = random.Random(12)
    long_seq = "".join(rng.choice("ACGT") for _ in range((1 << 20) + 5000))
    path = tmp_path / "ont.fq"
    with open(path, "w") as fh:
        fh.write(f"@short1\nACGTACGTAA\n+\nIIIIIIIIII\n")
        fh.write(f"@long\n{long_seq}\n+\n{'I' * len(long_seq)}\n")
        fh.write(f"@short2\nTTTTGGGGCC\n+\n@IIIIIIIII\n")
    monkeypatch.setattr(native, "SPLIT_MIN_BYTES", 1)
    got = native.load_reads_native([str(path)], fmt=0, threads=3)
    assert got is not None
    mat, lens = reads_to_matrix(list(iter_fastq([str(path)])))
    assert np.array_equal(got[1], lens)
    assert np.array_equal(got[0], mat)


def test_4mc_input_refused_loudly(tmp_path):
    """hadoop-4mc container input must fail with an error naming the format
    (the reference reads .4mc via a JNI codec; we don't — VERDICT r2 #6)."""
    p = tmp_path / "reads.4mc"
    p.write_bytes(b"\x00\x04mc-not-really")
    with pytest.raises(ValueError, match="hadoop-4mc"):
        expand_paths(str(p))


def test_native_correction_matches_scalar_oracle():
    """rfx_correct must reproduce correct_reads_scalar exactly (same
    in-order semantics), including two errors within one k-window and the
    -trustqual gate."""
    import random

    from reflexiv_tpu.io import reads_to_matrix
    from reflexiv_tpu.preprocess import (
        _solid_table, correct_reads_scalar)

    if not native.available():
        pytest.skip("native lib not built")
    rng = random.Random(61)
    genome = "".join(rng.choice("ACGT") for _ in range(1200))
    reads = []
    for _ in range(400):
        s = rng.randrange(len(genome) - 90)
        reads.append(genome[s:s + 90])
    for i in range(0, len(reads), 6):
        bad = list(reads[i])
        p = rng.randrange(10, 80)
        bad[p] = next(c for c in "ACGT" if c != bad[p])
        if i % 12 == 0 and p + 8 < 80:  # two errors within one window
            bad[p + 8] = next(c for c in "ACGT" if c != bad[p + 8])
        reads[i] = "".join(bad)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    k = 21
    want, n_want = correct_reads_scalar(mat, lens, k=k, min_cov=3)
    solid_sorted, _l, _c = _solid_table(mat, lens, k, 3)
    got, n_got = native.correct_reads_native(
        mat.copy(), lens, solid_sorted, k=k)
    assert n_got == n_want
    assert np.array_equal(got, want)
    assert n_got >= 10

    # trust gate: phred 40 at one planted error suppresses that fix
    quals = np.full(mat.shape, 5, np.uint8)
    quals[0, :] = 40
    got_q, n_q = native.correct_reads_native(
        mat.copy(), lens, solid_sorted, k=k, quals=quals, trust_qual=30)
    assert n_q <= n_got
    assert np.array_equal(got_q[0], mat[0])   # row 0 untouched
