"""Stage checkpoint/resume for the staged dynamic pipeline.

The reference's fault tolerance *is* its staging: every stage writes its
output dir + ``_SUCCESS`` and ``checkStepsForDynamicAssemblyPipe``
(``Pipelines.java:613-830``) resumes from the newest completed stage,
deleting stale successors. ``latest_stage`` scans the ordered stage list
backwards, and ``clear_from`` drops a stage and everything after it (the
reference's delete-stale-predecessors, ``Pipelines.java:503-555``).

Pool snapshots are **blockwise 2-bit packed** (format ``packed_v2``): the
pool is fetched from the device in bounded row blocks, packed (if it was a
byte matrix) on the host, and written one ``block_*.npz`` per block — the
full unpacked byte matrix never exists in HBM or in one host allocation.
The round-3 scale campaign measured the old whole-pool ``np.asarray`` +
``savez_compressed`` path OOMing a 16 GB chip at the 10 Mbp post-reduction
checkpoint; this writer is that fix. Legacy single-``records.npz`` stages
still load.

Beyond the coarse stage ladder, :func:`save_loop_state` /
:func:`load_loop_state` checkpoint the *inside* of the long extension loop
(pool + parked blocks + iteration counters) so a session death mid-ladder
loses minutes, not the stage.
"""
from __future__ import annotations

import glob
import json
import logging
import os
import shutil
from typing import List, Optional, Tuple

import numpy as np

from .io import has_success_marker, write_success_marker

log = logging.getLogger("reflexiv_tpu")

# ordered stage names of the meta pipeline (cf. the 00firstFour ..
# 09ExtendAgain ladder, Pipelines.java:856-1290)
META_STAGES: Tuple[str, ...] = (
    "00sorted", "01reduced", "02extended", "03fixed", "04contigs",
)

# rows fetched/packed/written per block; bounds both the device->host
# transfer and the transient host allocation of one checkpoint step
BLOCK_ROWS = 1 << 20


def stage_dir(workdir: str, stage: str) -> str:
    return os.path.join(workdir, stage)


# ---------------------------------------------------------------------------
# blockwise packed pool snapshots
# ---------------------------------------------------------------------------


def _is_packed_pool(pool) -> bool:
    return np.dtype(pool.seq.dtype) == np.uint32


def _write_pool_blocks(d: str, pool, live_only: bool = True) -> int:
    """Write ``pool`` (DynRecords byte or PackedDynRecords limb form, jnp or
    numpy arrays) as packed block files under ``d``. Returns rows written."""
    from .packed import limbs_for, pack_seq_matrix_np

    os.makedirs(d, exist_ok=True)
    packed_in = _is_packed_pool(pool)
    N = pool.seq.shape[0]
    if packed_in:
        base_cap = pool.seq.shape[1] * 16
    else:
        base_cap = pool.seq.shape[1]
    written = 0
    bi = 0
    for lo in range(0, max(N, 1), BLOCK_ROWS):
        hi = min(lo + BLOCK_ROWS, N)
        if hi <= lo:
            break
        live = np.asarray(pool.live[lo:hi])
        if live_only:
            idx = np.nonzero(live)[0]
            if not len(idx):
                continue
        else:
            idx = np.arange(hi - lo)
        seq = np.asarray(pool.seq[lo:hi])[idx]
        length = np.asarray(pool.length[lo:hi])[idx]
        if not packed_in:
            col = np.arange(seq.shape[1])
            seq = pack_seq_matrix_np(
                np.where(col[None, :] < length[:, None], seq, 0))
        np.savez(
            os.path.join(d, f"block_{bi:05d}.npz"),
            seq=seq, length=length,
            subk=np.asarray(pool.subk[lo:hi])[idx],
            left=np.asarray(pool.left[lo:hi])[idx],
            right=np.asarray(pool.right[lo:hi])[idx],
            live=live[idx],
        )
        written += len(idx)
        bi += 1
    with open(os.path.join(d, "meta.json"), "w") as fh:
        json.dump({"format": "packed_v2", "rows": written,
                   "base_capacity": int(base_cap),
                   "limbs": int(limbs_for(base_cap))}, fh)
    return written


def _read_pool_blocks(d: str):
    """Read packed block files back: (packed (N, LW) uint32 numpy, length,
    subk, left, right, live, base_capacity)."""
    with open(os.path.join(d, "meta.json")) as fh:
        meta = json.load(fh)
    rows, lw = meta["rows"], meta["limbs"]
    seq = np.zeros((rows, lw), np.uint32)
    length = np.zeros(rows, np.int32)
    subk = np.ones(rows, np.int32)
    left = np.zeros(rows, np.int32)
    right = np.zeros(rows, np.int32)
    live = np.zeros(rows, bool)
    at = 0
    for path in sorted(glob.glob(os.path.join(d, "block_*.npz"))):
        z = np.load(path)
        n = len(z["length"])
        seq[at:at + n, :z["seq"].shape[1]] = z["seq"]
        length[at:at + n] = z["length"]
        subk[at:at + n] = z["subk"]
        left[at:at + n] = z["left"]
        right[at:at + n] = z["right"]
        live[at:at + n] = z["live"]
        at += n
    assert at == rows, f"checkpoint {d}: {at} rows read, meta says {rows}"
    return seq, length, subk, left, right, live, meta["base_capacity"]


def save_records(workdir: str, stage: str, recs) -> None:
    """Checkpoint a pool (byte DynRecords, PackedDynRecords, or a ragged
    width-class group list) blockwise."""
    d = stage_dir(workdir, stage)
    if isinstance(recs, list):
        # ragged stage snapshot: one npz per width class — memory stays
        # ~total bases instead of rows x widest row (megabase contigs)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        n = 0
        for i, (seq, length, subk, left, right) in enumerate(recs):
            np.savez(os.path.join(d, f"g_{i:05d}.npz"),
                     seq=seq, length=length, subk=subk, left=left,
                     right=right)
            n += len(length)
        with open(os.path.join(d, "meta.json"), "w") as fh:
            json.dump({"format": "groups_v1", "groups": len(recs),
                       "rows": n}, fh)
        write_success_marker(d)
        log.info("checkpoint: wrote stage %s (%d live rows, %d groups)",
                 stage, n, len(recs))
        return
    n = _write_pool_blocks(d, recs)
    write_success_marker(d)
    log.info("checkpoint: wrote stage %s (%d live rows)", stage, n)


def load_records(workdir: str, stage: str):
    """Load a stage snapshot as a **host (numpy) byte DynRecords** — every
    stage consumer either works on host arrays or packs for the device
    itself (``run_dyn_extension``)."""
    from .dynamic import DynRecords
    from .packed import unpack_seq_matrix_np

    d = stage_dir(workdir, stage)
    gmeta = os.path.join(d, "meta.json")
    if os.path.exists(gmeta):
        with open(gmeta) as fh:
            if json.load(fh).get("format") == "groups_v1":
                groups = []
                for path in sorted(glob.glob(os.path.join(d, "g_*.npz"))):
                    z = np.load(path)
                    groups.append((z["seq"], z["length"], z["subk"],
                                   z["left"], z["right"]))
                return groups
    legacy = os.path.join(d, "records.npz")
    if os.path.exists(legacy):
        z = np.load(legacy)
        return DynRecords(
            z["seq"], z["length"], z["subk"], z["left"], z["right"],
            z["live"],
        )
    packed, length, subk, left, right, live, base_cap = _read_pool_blocks(d)
    N = len(length)
    seq = np.empty((N, base_cap), np.uint8)
    for lo in range(0, N, BLOCK_ROWS):
        hi = min(lo + BLOCK_ROWS, N)
        seq[lo:hi] = unpack_seq_matrix_np(packed[lo:hi], base_cap)
    return DynRecords(seq, length, subk, left, right, live)


def load_records_packed(workdir: str, stage: str):
    """Load a stage snapshot as a host-array PackedDynRecords (numpy limbs;
    callers upload with ``jnp.asarray`` when they want it on device)."""
    from .packed_dyn import PackedDynRecords

    d = stage_dir(workdir, stage)
    legacy = os.path.join(d, "records.npz")
    if os.path.exists(legacy):
        from .packed import pack_seq_matrix_np

        z = np.load(legacy)
        col = np.arange(z["seq"].shape[1])
        packed = pack_seq_matrix_np(
            np.where(col[None, :] < z["length"][:, None], z["seq"], 0))
        return PackedDynRecords(
            packed, z["length"], z["subk"], z["left"], z["right"], z["live"])
    packed, length, subk, left, right, live, _ = _read_pool_blocks(d)
    return PackedDynRecords(packed, length, subk, left, right, live)


# ---------------------------------------------------------------------------
# per-k sorted-set partials (inside stage 00/01)
# ---------------------------------------------------------------------------


def save_kset(workdir: str, name: str, triple, k: int) -> None:
    """Checkpoint one per-k (bases (n, k) uint8, left, right) sorted set,
    bases host-packed to 2-bit limbs."""
    from .packed import pack_seq_matrix_np

    bases, left, right = triple
    d = stage_dir(workdir, name)
    os.makedirs(d, exist_ok=True)
    bases = np.asarray(bases, np.uint8)
    np.savez(os.path.join(d, "set.npz"),
             seq=pack_seq_matrix_np(bases), k=np.int32(k),
             left=np.asarray(left, np.int32),
             right=np.asarray(right, np.int32))
    write_success_marker(d)


def load_kset(workdir: str, name: str):
    """Read a per-k sorted set back as (bases (n, k) uint8, left, right)."""
    from .packed import unpack_seq_matrix_np

    z = np.load(os.path.join(stage_dir(workdir, name), "set.npz"))
    k = int(z["k"])
    return unpack_seq_matrix_np(z["seq"], k), z["left"], z["right"]


def has_kset(workdir: str, name: str) -> bool:
    return has_success_marker(stage_dir(workdir, name))


# ---------------------------------------------------------------------------
# in-loop extension state (pool + parked + counters)
# ---------------------------------------------------------------------------


def save_loop_state(ckpt_dir: str, pool, parked: list, state: dict) -> None:
    """Checkpoint the extension loop mid-flight: the (packed) pool, the
    parked row blocks, and the iteration counters. Written to a fresh
    ``it_<n>`` dir whose ``_SUCCESS`` lands last; older round dirs are
    removed only after the new one is complete, so a death mid-write always
    leaves one valid resume point."""
    it = state["it"]
    d = os.path.join(ckpt_dir, f"it_{it:05d}")
    if os.path.exists(d):
        shutil.rmtree(d)
    if isinstance(pool, list):
        # ragged indexed-loop pool: width-class group tuples (same layout
        # as parked blocks) — never materialized rows x widest-row dense
        ldir = os.path.join(d, "live")
        os.makedirs(ldir, exist_ok=True)
        for i, (seq, length, subk, left, right) in enumerate(pool):
            np.savez(os.path.join(ldir, f"g_{i:05d}.npz"),
                     seq=seq, length=length, subk=subk, left=left,
                     right=right)
    else:
        _write_pool_blocks(os.path.join(d, "pool"), pool)
    pdir = os.path.join(d, "parked")
    os.makedirs(pdir, exist_ok=True)
    for i, (seq, length, subk, left, right) in enumerate(parked):
        np.savez(os.path.join(pdir, f"p_{i:05d}.npz"),
                 seq=seq, length=length, subk=subk, left=left, right=right)
    with open(os.path.join(d, "state.json"), "w") as fh:
        json.dump(state, fh)
    write_success_marker(d)
    for other in glob.glob(os.path.join(ckpt_dir, "it_*")):
        if os.path.basename(other) != f"it_{it:05d}":
            shutil.rmtree(other, ignore_errors=True)
    log.info("checkpoint: extension loop state at round %d -> %s", it, d)


def load_loop_state(ckpt_dir: str):
    """Newest complete in-loop checkpoint, or None. Returns
    (packed_pool_host, parked_list, state_dict)."""
    from .packed_dyn import PackedDynRecords

    if not os.path.isdir(ckpt_dir):
        return None
    cands = sorted(glob.glob(os.path.join(ckpt_dir, "it_*")), reverse=True)
    for d in cands:
        if not has_success_marker(d):
            continue
        ldir = os.path.join(d, "live")
        if os.path.isdir(ldir):
            # ragged group-format pool (see save_loop_state)
            pool = []
            for path in sorted(glob.glob(os.path.join(ldir, "g_*.npz"))):
                z = np.load(path)
                pool.append((z["seq"], z["length"], z["subk"], z["left"],
                             z["right"]))
        else:
            packed, length, subk, left, right, live, _ = _read_pool_blocks(
                os.path.join(d, "pool"))
            pool = PackedDynRecords(packed, length, subk, left, right, live)
        parked = []
        for path in sorted(glob.glob(os.path.join(d, "parked", "p_*.npz"))):
            z = np.load(path)
            parked.append((z["seq"], z["length"], z["subk"], z["left"],
                           z["right"]))
        with open(os.path.join(d, "state.json")) as fh:
            state = json.load(fh)
        return pool, parked, state
    return None


def clear_partial(workdir: str, name: str) -> None:
    """Remove a partial-checkpoint namespace (``<name>`` and any
    ``<name>_*`` suffixed dirs, e.g. the fixing passes)."""
    for d in glob.glob(os.path.join(workdir, name + "*")):
        shutil.rmtree(d, ignore_errors=True)


def clear_dir(path: str) -> None:
    if os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# contig snapshots + stage ladder bookkeeping
# ---------------------------------------------------------------------------


def save_contigs(workdir: str, stage: str, contigs: List[str]) -> None:
    d = stage_dir(workdir, stage)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "contigs.txt"), "w") as fh:
        for s in contigs:
            fh.write(s + "\n")
    write_success_marker(d)
    log.info("checkpoint: wrote stage %s", stage)


def load_contigs(workdir: str, stage: str) -> List[str]:
    with open(os.path.join(stage_dir(workdir, stage), "contigs.txt")) as fh:
        return [line.strip() for line in fh if line.strip()]


def save_contigs_attrs(workdir: str, stage: str, contigs) -> None:
    """Contigs with (left, right) attrs: ``left<TAB>right<TAB>seq`` lines."""
    d = stage_dir(workdir, stage)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "contigs.txt"), "w") as fh:
        for s, l, r in contigs:
            fh.write(f"{l}\t{r}\t{s}\n")
    write_success_marker(d)
    log.info("checkpoint: wrote stage %s", stage)


def load_contigs_attrs(workdir: str, stage: str):
    """Read contigs back as (seq, left, right); attr-less rows (the round-1
    checkpoint format) default to (0, 0)."""
    out = []
    with open(os.path.join(stage_dir(workdir, stage), "contigs.txt")) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if "\t" in line:
                l, r, s = line.split("\t", 2)
                out.append((s, int(l), int(r)))
            else:
                out.append((line, 0, 0))
    return out


def latest_stage(workdir: str, stages: Tuple[str, ...] = META_STAGES) -> Optional[str]:
    """Newest stage with a ``_SUCCESS`` marker, scanning backwards
    (``checkStepsForDynamicAssemblyPipe``)."""
    for stage in reversed(stages):
        if has_success_marker(stage_dir(workdir, stage)):
            return stage
    return None


def clear_from(workdir: str, stage: str,
               stages: Tuple[str, ...] = META_STAGES) -> None:
    """Delete ``stage`` and all later stages (stale successors), plus any
    in-flight partial dirs (they belong to the stage being cleared)."""
    drop = False
    for s in stages:
        if s == stage:
            drop = True
        if drop:
            d = stage_dir(workdir, s)
            if os.path.exists(d):
                shutil.rmtree(d)
    for part in glob.glob(os.path.join(workdir, "*partial*")):
        shutil.rmtree(part, ignore_errors=True)
