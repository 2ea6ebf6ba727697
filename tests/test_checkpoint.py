import random

import pytest

import oracle
from reflexiv_tpu import checkpoint as ckpt
from reflexiv_tpu.contigs import canonical_contig
from reflexiv_tpu.dynamic import assemble_dynamic
from reflexiv_tpu.io import reads_to_matrix
from reflexiv_tpu.params import Params


def _reads(rng, genome, n=260, rl=60):
    reads = []
    for _ in range(n):
        s = rng.randrange(len(genome) - rl)
        r = genome[s:s + rl]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    return reads


@pytest.mark.slow
def test_meta_checkpoints_and_resume(tmp_path):
    rng = random.Random(67)
    genome = "".join(rng.choice("ACGT") for _ in range(400))
    mat, lens = reads_to_matrix([r.encode() for r in _reads(rng, genome)])
    params = Params(klist=(15, 21), min_kmer_coverage=2, min_contig=200)
    wd = str(tmp_path / "steps")

    first = assemble_dynamic(mat, lens, params, seed=1, workdir=wd)
    assert ckpt.latest_stage(wd) == "04contigs"

    # resume from the final stage: no recompute, identical result
    second = assemble_dynamic(mat, lens, params, seed=1, workdir=wd)
    assert [s for _, s in first] == [s for _, s in second]

    # drop the last two stages and resume mid-pipeline
    ckpt.clear_from(wd, "03fixed")
    assert ckpt.latest_stage(wd) == "02extended"
    third = assemble_dynamic(mat, lens, params, seed=1, workdir=wd)
    canon3 = {canonical_contig(s) for _, s in third}
    canon1 = {canonical_contig(s) for _, s in first}
    assert canon3 == canon1
    assert ckpt.latest_stage(wd) == "04contigs"


def test_records_roundtrip(tmp_path):
    import numpy as np
    import jax.numpy as jnp
    from reflexiv_tpu.dynamic import DynRecords

    recs = DynRecords(
        jnp.asarray(np.arange(12, dtype=np.uint8).reshape(3, 4)),
        jnp.asarray([4, 3, 2]), jnp.asarray([3, 2, 1]),
        jnp.asarray([-1, 2, 3]), jnp.asarray([5, -2, 0]),
        jnp.asarray([True, False, True]),
    )
    ckpt.save_records(str(tmp_path), "00sorted", recs)
    back = ckpt.load_records(str(tmp_path), "00sorted")
    for a, b in zip(recs, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_resume_discards_stale_stages_on_klist_change(tmp_path):
    rng = random.Random(68)
    genome = "".join(rng.choice("ACGT") for _ in range(300))
    mat, lens = reads_to_matrix([r.encode() for r in _reads(rng, genome, n=200)])
    wd = str(tmp_path / "steps")
    p1 = Params(klist=(15, 21), min_kmer_coverage=2, min_contig=150)
    assemble_dynamic(mat, lens, p1, seed=1, workdir=wd)
    assert ckpt.latest_stage(wd) == "04contigs"

    # different klist: stale checkpoints must be discarded, not resumed
    p2 = Params(klist=(17, 21), min_kmer_coverage=2, min_contig=150)
    out = assemble_dynamic(mat, lens, p2, seed=1, workdir=wd)
    assert ckpt.latest_stage(wd) == "04contigs"
    canon = {canonical_contig(s) for _, s in out}
    best = max(canon, key=len)
    import oracle
    assert best in genome or oracle.revcomp(best) in genome


@pytest.mark.slow
def test_meta_survives_midrun_kill(tmp_path):
    """Fault tolerance end-to-end: SIGKILL a meta run mid-pipeline, rerun
    the same command, and it resumes from the newest checkpoint to the
    golden contig (the reference's _SUCCESS restart,
    Pipelines.java:613-830, exercised by an actual process death)."""
    import signal
    import subprocess
    import sys
    import time

    out = str(tmp_path / "out")
    cmd = [sys.executable, "-m", "reflexiv_tpu.cli", "meta",
           "-fastq", "/root/reference/example/paired_dat*.fq.gz",
           "-klist", "23,31,41", "-cover", "3", "-outfile", out]
    env = dict(JAX_PLATFORMS="cpu", PATH="/usr/bin:/bin", HOME="/root",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    proc = subprocess.Popen(
        cmd, env=env, cwd="/root/repo",
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    # let it get through at least one checkpointed stage, then kill it
    deadline = time.time() + 120
    steps = tmp_path / "out" / "steps"
    while time.time() < deadline and proc.poll() is None:
        # a COMPLETED stage (marker present) must exist, else the rerun
        # legitimately starts from scratch and never logs a resume
        if steps.exists() and any(steps.glob("0*/_SUCCESS")):
            break
        time.sleep(0.02)
    if proc.poll() is not None:
        # host scheduling raced the whole pipeline past our poll (seen
        # under full-suite CPU contention): the kill cannot be exercised
        import pytest

        pytest.skip("meta finished before the kill could land")
    proc.send_signal(signal.SIGKILL)   # exact child PID, never a pattern
    proc.wait()

    r2 = subprocess.run(cmd, env=env, cwd="/root/repo",
                        capture_output=True, text=True, timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resuming meta pipeline" in (r2.stdout + r2.stderr)
    part = tmp_path / "out" / "Assembly" / "part-00000"
    seqs, cur = [], []
    with open(part) as fh:
        for line in fh:
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                cur = []
            else:
                cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    assert max(len(s) for s in seqs) >= 4500
