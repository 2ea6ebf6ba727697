import random

import numpy as np

from reflexiv_tpu import bitpack, count
from reflexiv_tpu.io import reads_to_matrix
from oracle import count_kmers as oracle_count
import jax.numpy as jnp
import oracle


def test_streaming_matches_single_shot():
    rng = random.Random(19)
    genome = "".join(rng.choice("ACGT") for _ in range(600))
    reads = []
    for _ in range(240):
        s = rng.randrange(len(genome) - 50)
        r = genome[s:s + 50]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    k, min_cov = 21, 2

    def chunks():
        for i in range(0, len(reads), 37):  # ragged chunk sizes
            yield reads_to_matrix([r.encode() for r in reads[i:i + 37]])

    s_limbs, s_counts = count.count_kmers_streaming(
        chunks(), k=k, min_cov=min_cov)
    got = {}
    for row, c in zip(s_limbs, s_counts):
        got[bitpack.decode_to_str(np.asarray(
            bitpack.unpack_bases(jnp.asarray(row), k)))] = int(c)
    want = oracle_count(reads, k, min_cov=min_cov)
    assert got == want


def test_count_kmers_auto_matches_single_pass(monkeypatch):
    import numpy as np
    from reflexiv_tpu import dynamic as dyn
    from reflexiv_tpu.count import count_kmers

    rng = np.random.default_rng(3)
    R, L, k = 300, 80, 21
    mat = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    lens = rng.integers(k + 3, L + 1, size=R).astype(np.int32)
    col = np.arange(L)[None, :]
    mat[col >= lens[:, None]] = 0
    want_l, want_c = count_kmers(mat, lens, k=k, min_cov=2)
    monkeypatch.setattr(dyn, "STREAM_WINDOW_LIMIT", 1024)  # force streaming
    got_l, got_c = dyn.count_kmers_auto(mat, lens, k=k, min_cov=2,
                                        max_cov=10_000_000)
    want = {tuple(r): c for r, c in zip(want_l.tolist(), want_c.tolist())}
    got = {tuple(r): c for r, c in zip(got_l.tolist(), got_c.tolist())}
    assert want == got


def test_iter_read_chunks_reproduces_load_reads():
    """Chunked disk ingest yields the same reads (order preserved, modulo
    quantization padding rows) as whole-matrix loading."""
    import numpy as np

    from reflexiv_tpu.io import iter_read_chunks, load_reads

    pattern = "/root/reference/example/paired_dat*.fq.gz"
    mat, lens = load_reads(pattern)
    rows = []
    n_chunks = 0
    for cm, cl in iter_read_chunks(pattern, budget_bytes=64 << 10):
        n_chunks += 1
        assert cm.shape[0] & (cm.shape[0] - 1) == 0   # pow2 rows
        assert cm.shape[1] % 32 == 0                   # width multiple of 32
        for i in range(cm.shape[0]):
            if cl[i] > 0:
                rows.append(bytes(cm[i, :cl[i]]))
    assert n_chunks > 1   # the budget actually chunked the input
    want = [bytes(mat[i, :lens[i]]) for i in range(mat.shape[0])]
    assert rows == want


def test_count_from_files_matches_in_memory(tmp_path):
    """Out-of-core counting (bounded chunks from disk) produces the exact
    unique-kmer table of the in-memory pass."""
    import random

    import numpy as np

    from reflexiv_tpu.count import count_kmers, count_kmers_from_files
    from reflexiv_tpu.io import load_reads

    rng = random.Random(7)
    genome = "".join(rng.choice("ACGT") for _ in range(3000))
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as fh:
        for i in range(4000):
            s = rng.randrange(len(genome) - 70)
            fh.write(f"@r{i}\n{genome[s:s+70]}\n+\n{'I'*70}\n")
    limbs_s, counts_s = count_kmers_from_files(
        str(fq), k=31, min_cov=2, budget_bytes=32 << 10)
    mat, lens = load_reads(str(fq))
    limbs_m, counts_m = count_kmers(mat, lens, k=31, min_cov=2)

    def table(L, c):
        return {tuple(r): int(n) for r, n in zip(L, c)}

    assert table(limbs_s, counts_s) == table(limbs_m, counts_m)
    assert len(counts_s) > 100


def test_spill_to_host_table_mode_matches_in_memory(tmp_path, monkeypatch):
    """With the device-table row limit forced tiny, the running table spills
    sorted segments to the host every few chunks and the final host merge
    must reproduce the in-memory table exactly (the >30 Mbp single-chip
    escape hatch: bounded HBM, bounded host RAM)."""
    import random

    from reflexiv_tpu.count import (count_kmers, count_kmers_from_files,
                                    count_kmers_from_files_multi)
    from reflexiv_tpu.io import load_reads

    rng = random.Random(23)
    genome = "".join(rng.choice("ACGT") for _ in range(3000))
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as fh:
        for i in range(3000):
            s = rng.randrange(len(genome) - 70)
            fh.write(f"@r{i}\n{genome[s:s+70]}\n+\n{'I'*70}\n")
    monkeypatch.setenv("REFLEXIV_DEVICE_TABLE_ROWS", "1500")
    limbs_s, counts_s = count_kmers_from_files(
        str(fq), k=31, min_cov=2, budget_bytes=32 << 10)
    multi = count_kmers_from_files_multi(
        str(fq), (21, 31), min_cov=2, budget_bytes=32 << 10)
    monkeypatch.delenv("REFLEXIV_DEVICE_TABLE_ROWS")
    mat, lens = load_reads(str(fq))

    def table(L, c):
        return {tuple(r): int(n) for r, n in zip(L, c)}

    limbs_m, counts_m = count_kmers(mat, lens, k=31, min_cov=2)
    assert table(limbs_s, counts_s) == table(limbs_m, counts_m)
    assert table(*multi[31]) == table(limbs_m, counts_m)
    limbs_21, counts_21 = count_kmers(mat, lens, k=21, min_cov=2)
    assert table(*multi[21]) == table(limbs_21, counts_21)
    # the sorted output order must also match (downstream consumers rely
    # on ascending key order)
    np.testing.assert_array_equal(limbs_s, limbs_m)


def test_multi_k_streaming_matches_per_k(tmp_path):
    """count_kmers_from_files_multi (one pass, all k) must equal the
    per-k streaming tables."""
    import random

    from reflexiv_tpu.count import (count_kmers_from_files,
                                    count_kmers_from_files_multi)

    rng = random.Random(17)
    genome = "".join(rng.choice("ACGT") for _ in range(2000))
    fq = tmp_path / "r.fq"
    with open(fq, "w") as fh:
        for i in range(2000):
            s = rng.randrange(len(genome) - 70)
            fh.write(f"@r{i}\n{genome[s:s+70]}\n+\n{'I'*70}\n")
    klist = (21, 31, 41)
    multi = count_kmers_from_files_multi(
        str(fq), klist, min_cov=2, budget_bytes=32 << 10)

    def table(L, c):
        return {tuple(r): int(n) for r, n in zip(L, c)}

    for k in klist:
        want = count_kmers_from_files(
            str(fq), k=k, min_cov=2, budget_bytes=32 << 10)
        assert table(*multi[k]) == table(*want), k
        assert len(multi[k][1]) > 50


def test_prefetch_parity_and_exception_propagation(tmp_path, monkeypatch):
    """The ingest prefetch thread (overlaps gzip/pack with device dispatch)
    must change nothing but the wall clock: identical tables vs the serial
    loop, ingest/stall sub-timers recorded, and a producer exception
    re-raised in the consumer, not swallowed."""
    import random

    import pytest

    from reflexiv_tpu import metrics
    from reflexiv_tpu.count import (_PrefetchedChunks,
                                    count_kmers_from_files)

    rng = random.Random(5)
    genome = "".join(rng.choice("ACGT") for _ in range(1500))
    fq = tmp_path / "r.fq"
    with open(fq, "w") as fh:
        for i in range(1500):
            s = rng.randrange(len(genome) - 70)
            fh.write(f"@r{i}\n{genome[s:s+70]}\n+\n{'I'*70}\n")

    monkeypatch.setenv("REFLEXIV_PREFETCH", "0")
    serial = count_kmers_from_files(
        str(fq), k=31, min_cov=2, budget_bytes=16 << 10)
    monkeypatch.delenv("REFLEXIV_PREFETCH")
    met = metrics.current()
    met.timers.pop("count.ingest_s", None)
    overlapped = count_kmers_from_files(
        str(fq), k=31, min_cov=2, budget_bytes=16 << 10)
    np.testing.assert_array_equal(serial[0], overlapped[0])
    np.testing.assert_array_equal(serial[1], overlapped[1])
    assert met.timers.get("count.ingest_s", 0) > 0
    assert "count.input_stall_s" in met.timers
    assert "count.device_loop_s" in met.timers

    def boom():
        yield (np.zeros((4, 40), np.uint8), np.full(4, 40, np.int32))
        raise RuntimeError("ingest exploded")

    it = _PrefetchedChunks(boom())
    with pytest.raises(RuntimeError, match="ingest exploded"):
        list(it)
