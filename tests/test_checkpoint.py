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
    """packed_v2 snapshots: 2-bit base codes survive, bytes beyond each
    row's length are normalized to zero, dead rows are dropped (only live
    rows carry pipeline state)."""
    import numpy as np
    import jax.numpy as jnp
    from reflexiv_tpu.dynamic import DynRecords

    seq = np.array([[1, 2, 3, 0], [0, 3, 2, 1], [2, 2, 1, 3]], np.uint8)
    recs = DynRecords(
        jnp.asarray(seq),
        jnp.asarray([4, 3, 2]), jnp.asarray([3, 2, 1]),
        jnp.asarray([-1, 2, 3]), jnp.asarray([5, -2, 0]),
        jnp.asarray([True, False, True]),
    )
    ckpt.save_records(str(tmp_path), "00sorted", recs)
    back = ckpt.load_records(str(tmp_path), "00sorted")
    keep = np.array([0, 2])
    col = np.arange(4)
    expect_seq = np.where(col[None, :] < np.array([4, 2])[:, None],
                          seq[keep], 0)
    np.testing.assert_array_equal(np.asarray(back.seq)[:, :4], expect_seq)
    np.testing.assert_array_equal(np.asarray(back.length), [4, 2])
    np.testing.assert_array_equal(np.asarray(back.subk), [3, 1])
    np.testing.assert_array_equal(np.asarray(back.left), [-1, 3])
    np.testing.assert_array_equal(np.asarray(back.right), [5, 0])
    assert np.asarray(back.live).all()


def test_records_roundtrip_packed_pool(tmp_path):
    """A PackedDynRecords pool checkpoints limb-for-limb (no unpack on
    device) and loads back in either representation."""
    import numpy as np
    import jax.numpy as jnp
    from reflexiv_tpu import packed_dyn as pd
    from reflexiv_tpu.dynamic import DynRecords

    rng = __import__("random").Random(3)
    seq = np.array(
        [[rng.randrange(4) for _ in range(20)] for _ in range(5)], np.uint8)
    length = np.array([20, 17, 5, 12, 20], np.int32)
    col = np.arange(20)
    seq = np.where(col[None, :] < length[:, None], seq, 0)
    d = DynRecords(
        jnp.asarray(seq), jnp.asarray(length),
        jnp.asarray([3, 3, 2, 3, 3]), jnp.asarray([-1, -1, 2, -1, 0]),
        jnp.asarray([0, 1, -2, -1, -1]),
        jnp.asarray([True, True, False, True, True]),
    )
    p = pd.from_dyn(d)
    ckpt.save_records(str(tmp_path), "02extended", p)
    back = ckpt.load_records(str(tmp_path), "02extended")
    live = np.array([0, 1, 3, 4])
    np.testing.assert_array_equal(np.asarray(back.seq)[:, :20], seq[live])
    np.testing.assert_array_equal(back.length, length[live])
    backp = ckpt.load_records_packed(str(tmp_path), "02extended")
    np.testing.assert_array_equal(
        backp.seq, np.asarray(p.seq)[live][:, : backp.seq.shape[1]])


def test_kset_roundtrip(tmp_path):
    import numpy as np

    rng = np.random.default_rng(5)
    bases = rng.integers(0, 4, (100, 21)).astype(np.uint8)
    left = rng.integers(-3, 5, 100).astype(np.int32)
    right = rng.integers(-3, 5, 100).astype(np.int32)
    ckpt.save_kset(str(tmp_path), "00partial/k21", (bases, left, right), 21)
    assert ckpt.has_kset(str(tmp_path), "00partial/k21")
    b2, l2, r2 = ckpt.load_kset(str(tmp_path), "00partial/k21")
    np.testing.assert_array_equal(b2, bases)
    np.testing.assert_array_equal(l2, left)
    np.testing.assert_array_equal(r2, right)
    assert not ckpt.has_kset(str(tmp_path), "00partial/k31")


def test_extension_loop_midpoint_resume(tmp_path, monkeypatch):
    """Killing the extension ladder mid-loop and re-entering with the same
    ckpt_dir must converge to the same pool as one uninterrupted run."""
    import numpy as np
    from reflexiv_tpu import packed_dyn as pd
    from reflexiv_tpu.bitpack import decode_to_str
    from reflexiv_tpu.dynamic import (DynRecords, records_from_sorted,
                                      run_dyn_extension)
    from reflexiv_tpu.graph import build_initial_records
    from reflexiv_tpu.count import count_kmers
    from reflexiv_tpu.io import reads_to_matrix

    rng = random.Random(9)
    genome = "".join(rng.choice("ACGT") for _ in range(300))
    mat, lens = reads_to_matrix(
        [r.encode() for r in _reads(rng, genome, n=240, rl=50)])
    k = 15
    params = Params(k=k, klist=(k,), min_kmer_coverage=2)
    limbs, counts = count_kmers(mat, lens, k=k, min_cov=2, max_cov=10**9)
    from reflexiv_tpu.dynamic import sort_k_records

    sset = sort_k_records(limbs, counts, k, params)
    pool = records_from_sorted([(sset[0], sset[1], sset[2], k)])

    def final_seqs(out):
        seq, length, _sk, _l, _r, live = (np.asarray(a) for a in out)
        return sorted(
            decode_to_str(seq[i, :length[i]]) for i in np.nonzero(live)[0])

    golden = run_dyn_extension(pool, params, kmin=k, kmax=k, seed=4)
    gold = final_seqs(golden)

    monkeypatch.setenv("REFLEXIV_CKPT_EVERY_S", "0")  # checkpoint each round
    cdir = str(tmp_path / "02partial")
    part = run_dyn_extension(
        pool, params, kmin=k, kmax=k, seed=4, max_rounds=3, ckpt_dir=cdir)
    assert ckpt.load_loop_state(cdir) is not None
    resumed = run_dyn_extension(
        pool, params, kmin=k, kmax=k, seed=4, ckpt_dir=cdir,
        return_packed=True)
    assert final_seqs(pd.to_dyn_host(resumed)) == gold


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
