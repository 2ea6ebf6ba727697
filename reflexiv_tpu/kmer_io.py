"""On-disk k-mer table format: reference-compatible CSV.

The reference counter writes ``KMERSTRING,count`` CSV rows into ``Count_<k>/``
with a ``_SUCCESS`` marker (``ReflexivDataFrameCounter.java:216-233``), and the
sorted/reduced stages parse the same shape back
(``ReflexivDSDynamicKmerRuduction.java:3206-3218``). We keep that contract so
artifacts interchange; the optional third column carries the packed
marker|left|right attribute the sorting stage emits.
"""
from __future__ import annotations

import gzip
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .bitpack import decode_to_str, encode_ascii, pack_bases, unpack_bases
from .io import expand_paths, write_success_marker


def write_count_table(
    directory: str,
    limbs: np.ndarray,
    counts: np.ndarray,
    k: int,
    *,
    gzip_output: bool = True,
) -> str:
    """Write ``Count_<k>``-style CSV (one part file) + _SUCCESS."""
    os.makedirs(directory, exist_ok=True)
    name = "part-00000.csv" + (".gz" if gzip_output else "")
    path = os.path.join(directory, name)
    opener = gzip.open if gzip_output else open
    bases = np.asarray(unpack_bases(jnp.asarray(limbs), k))
    with opener(path, "wt") as fh:
        for row, c in zip(bases, counts):
            fh.write(f"{decode_to_str(row)},{int(c)}\n")
    write_success_marker(directory)
    return path


def read_count_table(pattern: str, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Read ``KMERSTRING,count`` CSV files (plain or .gz) into packed limbs.

    Accepts the reference's parenthesised Spark tuple dumps too
    (``KmerBinarizer``, ``ReflexivDSMain.java:3883-3907``).
    """
    kmers = []
    counts = []
    for path in expand_paths(pattern):
        if os.path.isdir(path):
            parts = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.startswith("part-")
            )
        else:
            parts = [path]
        for part in parts:
            opener = gzip.open if part.endswith(".gz") else open
            with opener(part, "rt") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    km, _, cnt = line.partition(",")
                    if km.startswith("("):
                        km = km[1:]
                    cnt = cnt.rstrip(")")
                    if len(km) != k:
                        raise ValueError(
                            f"k-mer length {len(km)} != k={k} in {part}"
                        )
                    kmers.append(km)
                    counts.append(min(int(cnt), 1_000_000_000))
    if not kmers:
        return (
            np.zeros((0, (k + 15) // 16), dtype=np.uint32),
            np.zeros(0, dtype=np.int32),
        )
    codes = np.stack(
        [encode_ascii(np.frombuffer(s.encode(), np.uint8)) for s in kmers]
    )
    limbs = np.asarray(pack_bases(jnp.asarray(codes), k))
    return limbs, np.asarray(counts, dtype=np.int32)
