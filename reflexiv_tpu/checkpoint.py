"""Stage checkpoint/resume for the staged dynamic pipeline.

The reference's fault tolerance *is* its staging: every stage writes its
output dir + ``_SUCCESS`` and ``checkStepsForDynamicAssemblyPipe``
(``Pipelines.java:613-830``) resumes from the newest completed stage,
deleting stale successors. Here each stage snapshot is a compressed ``.npz``
of the record arrays plus the ``_SUCCESS`` marker; ``latest_stage`` scans the
ordered stage list backwards, and ``clear_from`` drops a stage and everything
after it (the reference's delete-stale-predecessors,
``Pipelines.java:503-555``).
"""
from __future__ import annotations

import logging
import os
import shutil
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .dynamic import DynRecords
from .io import has_success_marker, write_success_marker

log = logging.getLogger("reflexiv_tpu")

# ordered stage names of the meta pipeline (cf. the 00firstFour ..
# 09ExtendAgain ladder, Pipelines.java:856-1290)
META_STAGES: Tuple[str, ...] = (
    "00sorted", "01reduced", "02extended", "03fixed", "04contigs",
)


def stage_dir(workdir: str, stage: str) -> str:
    return os.path.join(workdir, stage)


def save_records(workdir: str, stage: str, recs: DynRecords) -> None:
    d = stage_dir(workdir, stage)
    os.makedirs(d, exist_ok=True)
    np.savez_compressed(
        os.path.join(d, "records.npz"),
        seq=np.asarray(recs.seq), length=np.asarray(recs.length),
        subk=np.asarray(recs.subk), left=np.asarray(recs.left),
        right=np.asarray(recs.right), live=np.asarray(recs.live),
    )
    write_success_marker(d)
    log.info("checkpoint: wrote stage %s", stage)


def load_records(workdir: str, stage: str) -> DynRecords:
    d = stage_dir(workdir, stage)
    z = np.load(os.path.join(d, "records.npz"))
    return DynRecords(
        jnp.asarray(z["seq"]), jnp.asarray(z["length"]),
        jnp.asarray(z["subk"]), jnp.asarray(z["left"]),
        jnp.asarray(z["right"]), jnp.asarray(z["live"]),
    )


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
    """Delete ``stage`` and all later stages (stale successors)."""
    drop = False
    for s in stages:
        if s == stage:
            drop = True
        if drop:
            d = stage_dir(workdir, s)
            if os.path.exists(d):
                shutil.rmtree(d)
