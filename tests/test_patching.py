import random

import oracle
from reflexiv_tpu.patching import patch_contigs


def _pairs_from(genome, rng, n=80, insert=220, rl=60):
    pairs = []
    for _ in range(n):
        s = rng.randrange(len(genome) - insert)
        r1 = genome[s:s + rl]
        r2 = oracle.revcomp(genome[s + insert - rl:s + insert])
        pairs.append((r1, r2))
    return pairs


def test_patching_joins_overlapping_linked_contigs():
    rng = random.Random(5)
    genome = "".join(rng.choice("ACGT") for _ in range(1200))
    # two contigs overlapping by 40bp around position 600
    a = genome[:640]
    b = genome[600:]
    pairs = _pairs_from(genome, rng)
    joined, links = patch_contigs([a, b], pairs)
    assert len(links) >= 1
    assert len(joined) == 1
    assert joined[0] == genome


def test_patching_reports_unjoinable_links():
    rng = random.Random(6)
    genome = "".join(rng.choice("ACGT") for _ in range(1200))
    # two contigs with a true sequence GAP (no overlap): link reported,
    # no join executed
    a = genome[:580]
    b = genome[620:]
    pairs = _pairs_from(genome, rng)
    joined, links = patch_contigs([a, b], pairs)
    assert len(links) >= 1
    assert sorted(joined, key=len) == sorted([a, b], key=len)


def test_patching_ignores_ambiguous_and_sparse_links():
    rng = random.Random(7)
    g1 = "".join(rng.choice("ACGT") for _ in range(600))
    g2 = "".join(rng.choice("ACGT") for _ in range(600))
    # no pairs at all -> nothing changes
    joined, links = patch_contigs([g1, g2], [])
    assert joined == [g1, g2] and links == []


def test_patching_joins_reverse_oriented_contig():
    rng = random.Random(8)
    genome = "".join(rng.choice("ACGT") for _ in range(1200))
    a = genome[:640]
    b = oracle.revcomp(genome[600:])  # second contig on the other strand
    pairs = _pairs_from(genome, rng)
    joined, links = patch_contigs([a, b], pairs)
    assert len(links) >= 1
    assert len(joined) == 1
    assert joined[0] in (genome, oracle.revcomp(genome))


def test_patching_scaffolds_unjoinable_links_with_n_gap():
    rng = random.Random(6)
    genome = "".join(rng.choice("ACGT") for _ in range(1200))
    a = genome[:580]
    b = genome[620:]  # true 40 bp gap, no overlap
    pairs = _pairs_from(genome, rng)
    joined, links = patch_contigs([a, b], pairs, scaffold=True)
    assert len(links) >= 1
    assert len(joined) == 1
    scaf = joined[0]
    assert "N" in scaf
    # the scaffold carries both contigs (some orientation) around one N run
    left, _, right = scaf.partition("N" * 10)
    right = right.lstrip("N")
    assert {left, right} == {a, b} or \
        {oracle.revcomp(left), oracle.revcomp(right)} == {a, b}


def test_patching_gap_estimate_is_plausible():
    rng = random.Random(9)
    genome = "".join(rng.choice("ACGT") for _ in range(1200))
    a = genome[:580]
    b = genome[620:]  # true gap: 40 bp
    pairs = _pairs_from(genome, rng, n=200)
    joined, links = patch_contigs([a, b], pairs)
    assert len(links) == 1
    gap = links[0][5]
    assert -40 <= gap <= 140, gap  # estimate brackets the 40 bp truth


def test_read_pairs_from_params(tmp_path):
    from reflexiv_tpu.params import Params
    from reflexiv_tpu.patching import read_pairs_from_params

    def write_fq(path, reads):
        with open(path, "w") as fh:
            for i, r in enumerate(reads):
                fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")

    # two-file mate pairing: file1[i] with file2[i]
    write_fq(tmp_path / "m1.fq", ["ACGTACGT", "GGGGCCCC"])
    write_fq(tmp_path / "m2.fq", ["TTTTAAAA", "CACACACA"])
    p = Params(input_fastq=f"{tmp_path}/m1.fq,{tmp_path}/m2.fq")
    assert read_pairs_from_params(p) == [
        ("ACGTACGT", "TTTTAAAA"), ("GGGGCCCC", "CACACACA")]

    # interleaved: consecutive records are mates
    write_fq(tmp_path / "il.fq",
             ["ACGTACGT", "TTTTAAAA", "GGGGCCCC", "CACACACA"])
    p = Params(input_fastq=str(tmp_path / "il.fq"), interleaved=True)
    assert read_pairs_from_params(p) == [
        ("ACGTACGT", "TTTTAAAA"), ("GGGGCCCC", "CACACACA")]

    # single file, not interleaved -> unpaired
    p = Params(input_fastq=str(tmp_path / "il.fq"))
    assert read_pairs_from_params(p) == []


def test_apply_patching_scaffolds_meta_contigs(tmp_path):
    from reflexiv_tpu.params import Params
    from reflexiv_tpu.patching import apply_patching

    rng = random.Random(6)
    genome = "".join(rng.choice("ACGT") for _ in range(1200))
    a, b = genome[:580], genome[620:]
    pairs = _pairs_from(genome, rng)
    m1 = tmp_path / "m1.fq"
    m2 = tmp_path / "m2.fq"
    with open(m1, "w") as f1, open(m2, "w") as f2:
        for i, (r1, r2) in enumerate(pairs):
            f1.write(f"@p{i}/1\n{r1}\n+\n{'I' * len(r1)}\n")
            f2.write(f"@p{i}/2\n{r2}\n+\n{'I' * len(r2)}\n")
    params = Params(
        input_fastq=f"{m1},{m2}", patch=True, scaffold=True)
    contigs = [(">Contig-580-(0,0)-0", a), (">Contig-580-(0,0)-1", b)]
    out, links = apply_patching(contigs, params)
    assert len(links) >= 1
    assert len(out) == 1
    header, seq = out[0]
    assert header.startswith(">Contig-") and "N" in seq


def test_patching_batched_matches_scalar():
    """The array front-end (numeric end index + batched seed mapping +
    vectorized voting) must reproduce the string/dict reference path
    exactly: same joins, same link table, on a messy multi-contig case."""
    from reflexiv_tpu.patching import patch_contigs_scalar

    rng = random.Random(13)
    genome = "".join(rng.choice("ACGT") for _ in range(5000))
    cuts = [0, 900, 1700, 2600, 3400, 4200, 5000]
    contigs = []
    for i in range(len(cuts) - 1):
        c = genome[max(0, cuts[i] - 20): cuts[i + 1]]  # 20 bp overlaps
        if i % 2:
            c = oracle.revcomp(c)
        contigs.append(c)
    pairs = _pairs_from(genome, rng, n=600, insert=260, rl=70)
    # some junk pairs that map nowhere / half-map
    for _ in range(60):
        pairs.append((
            "".join(rng.choice("ACGT") for _ in range(70)),
            "".join(rng.choice("ACGT") for _ in range(70)),
        ))
    # junk N reads and an N-scaffolded contig: N windows must never seed
    # (in both paths), so results stay equal and uncorrupted
    pairs.append(("N" * 70, "N" * 70))
    pairs.append(("T" * 70, "T" * 35 + "N" + "T" * 34))
    contigs.append(contigs[0][:200] + "N" * 20 + contigs[1][:200])
    for scaffold in (False, True):
        got = patch_contigs(contigs, pairs, scaffold=scaffold)
        want = patch_contigs_scalar(contigs, pairs, scaffold=scaffold)
        assert got == want
    joined, links = patch_contigs(contigs, pairs)
    assert len(links) >= 2  # the case actually exercises joins


def test_device_mapping_matches_numpy(monkeypatch):
    """The jitted strided-seed mapping (two-limb search on device) must
    reproduce the numpy _map_reads_arrays exactly, end to end through
    patch_contigs."""
    rng = random.Random(29)
    genome = "".join(rng.choice("ACGT") for _ in range(8000))
    cuts = [0, 1500, 3200, 4700, 6300, 8000]
    contigs = []
    for i in range(len(cuts) - 1):
        c = genome[max(0, cuts[i] - 15): cuts[i + 1]]
        if i % 2:
            c = oracle.revcomp(c)
        contigs.append(c)
    pairs = _pairs_from(genome, rng, n=1500, insert=280, rl=80)
    for _ in range(50):  # junk pairs
        pairs.append((
            "".join(rng.choice("ACGT") for _ in range(80)),
            "".join(rng.choice("ACGT") for _ in range(80)),
        ))
    from reflexiv_tpu.patching import patch_contigs

    got = patch_contigs(contigs, pairs)          # device (default)
    monkeypatch.setenv("REFLEXIV_DEVICE_STAGES", "0")
    want = patch_contigs(contigs, pairs)         # numpy oracle
    assert got == want
    assert len(got[1]) >= 2


def test_native_mapping_matches_numpy(monkeypatch):
    """The threaded C++ rfx_map_seeds backend must reproduce the numpy
    _map_reads_arrays exactly, end to end through patch_contigs (same
    case shape as the device-parity test, plus N-bearing reads so the
    acgt window mask is exercised through the native path)."""
    from reflexiv_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = random.Random(31)
    genome = "".join(rng.choice("ACGT") for _ in range(8000))
    cuts = [0, 1500, 3200, 4700, 6300, 8000]
    contigs = []
    for i in range(len(cuts) - 1):
        c = genome[max(0, cuts[i] - 15): cuts[i + 1]]
        if i % 2:
            c = oracle.revcomp(c)
        contigs.append(c)
    pairs = _pairs_from(genome, rng, n=1500, insert=280, rl=80)
    for _ in range(50):  # junk pairs
        pairs.append((
            "".join(rng.choice("ACGT") for _ in range(80)),
            "".join(rng.choice("ACGT") for _ in range(80)),
        ))
    pairs.append(("N" * 80, "N" * 80))
    pairs.append(("T" * 80, "T" * 40 + "N" + "T" * 39))
    monkeypatch.delenv("REFLEXIV_DEVICE_STAGES", raising=False)
    monkeypatch.setenv("REFLEXIV_NATIVE_PATCH", "1")
    got = patch_contigs(contigs, pairs)          # native C++ backend
    monkeypatch.setenv("REFLEXIV_DEVICE_STAGES", "0")
    want = patch_contigs(contigs, pairs)         # pure numpy oracle
    assert got == want
    assert len(got[1]) >= 2


def test_native_end_index_matches_numpy(monkeypatch):
    """rfx_end_index must produce the exact numpy _end_index_arrays
    contents (keys, payloads, dedup rule) on contigs with shared ends,
    N runs, short contigs, and lowercase bases."""
    from reflexiv_tpu import native
    from reflexiv_tpu.patching import _end_index_arrays

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = random.Random(37)
    genome = "".join(rng.choice("ACGT") for _ in range(6000))
    contigs = [
        genome[:700],
        genome[650:1500],
        genome[1400:2500].lower(),            # lowercase path
        genome[:40],                          # shorter than k=31 window set
        genome[:20],                          # shorter than k
        genome[2400:3000] + "N" * 15 + genome[3100:3600],   # N windows
        genome[:700],                         # exact duplicate -> ambiguous
        oracle.revcomp(genome[3500:4400]),
    ]
    monkeypatch.delenv("REFLEXIV_DEVICE_STAGES", raising=False)
    monkeypatch.setenv("REFLEXIV_NATIVE_PATCH", "1")
    got = _end_index_arrays(contigs)
    monkeypatch.setenv("REFLEXIV_NATIVE_PATCH", "0")
    want = _end_index_arrays(contigs)
    assert (got is None) == (want is None)
    if got is not None:
        import numpy as np

        np.testing.assert_array_equal(got.keys, want.keys)
        np.testing.assert_array_equal(got.ci, want.ci)
        np.testing.assert_array_equal(got.end, want.end)
        np.testing.assert_array_equal(got.pos, want.pos)
        np.testing.assert_array_equal(got.strand, want.strand)
        assert len(got.keys) > 100


def test_hashed_front_end_matches_sorted_native(monkeypatch):
    """rfx_map_pairs_hashed (hash index, no sort) must produce the same
    ten mapping arrays as end_index_native + map_pairs_native on a messy
    case with duplicate end windows (disagreement drops), N runs, and
    short contigs."""
    from reflexiv_tpu import native
    from reflexiv_tpu.patching import END_WINDOW, SEED_K

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = random.Random(53)
    genome = "".join(rng.choice("ACGT") for _ in range(9000))
    contigs = [
        genome[:800], genome[750:1600], genome[:800],      # dup -> ambiguous
        oracle.revcomp(genome[1500:2400]),
        genome[2300:2800] + "N" * 12 + genome[2900:3400],
        genome[:25],
    ]
    pairs = _pairs_from(genome, rng, n=1200, insert=260, rl=76)
    pairs.append(("N" * 76, "T" * 76))
    want = None
    idx_out = native.end_index_native(
        contigs, k=SEED_K, end_window=END_WINDOW)
    assert idx_out is not None
    keys, ci, end, pos, strand = idx_out
    want = native.map_pairs_native(
        pairs, keys, ci, end, pos, strand, k=SEED_K, stride=7)
    got = native.map_pairs_hashed_native(
        contigs, pairs, k=SEED_K, end_window=END_WINDOW, stride=7)
    assert got is not None and want is not None
    import numpy as np

    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    assert got[4].sum() > 100    # the case actually maps reads
