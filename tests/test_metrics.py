"""Metrics registry: stage timers, counters, JSON dump, CLI wiring."""
import json

from reflexiv_tpu import metrics


def test_registry_roundtrip(tmp_path):
    m = metrics.reset()
    with m.stage("alpha"):
        pass
    m.lap_start()
    m.lap("beta")
    m.add("kmers", 5)
    m.add("kmers", 2)
    m.set("contigs", 3)
    snap = m.snapshot()
    assert set(snap) == {"wall_s", "stages_s", "counters"}
    assert "alpha" in snap["stages_s"] and "beta" in snap["stages_s"]
    assert snap["counters"] == {"kmers": 7, "contigs": 3}
    path = m.write(str(tmp_path))
    with open(path) as fh:
        assert json.load(fh)["counters"]["contigs"] == 3
    assert metrics.current() is m


def test_run_api_records_metrics():
    import random

    from reflexiv_tpu import Params
    from reflexiv_tpu.assembler import assemble_reads
    from reflexiv_tpu.io import reads_to_matrix

    rng = random.Random(2)
    genome = "".join(rng.choice("ACGT") for _ in range(700))
    reads = [genome[i:i + 80] for i in range(0, 620, 4)]
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    m = metrics.reset()
    out = assemble_reads(mat, lens, Params(k=31, min_kmer_coverage=2),
                         seed=0)
    snap = m.snapshot()
    assert snap["counters"]["run/contigs"] == len(out)
    assert snap["counters"]["run/solid_kmers"] > 0
    assert "run/counting" in snap["stages_s"]
    assert "run/assembly" in snap["stages_s"]
