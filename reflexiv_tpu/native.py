"""ctypes bindings for the native C++ IO/preprocessing library.

Builds ``native/libreflexiv_native.so`` on demand (g++ + zlib) and exposes:

  * :func:`load_reads_native` — gzip FASTQ/FASTA decode straight into 2-bit
    code matrices (replaces the Python line loop in :mod:`reflexiv_tpu.io`);
  * :func:`merge_pairs_native` — flash-equivalent pair overlap scoring.

Every entry point has a pure-Python fallback; callers never hard-require the
native library.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger("reflexiv_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libreflexiv_native.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    src = os.path.join(_NATIVE_DIR, "reflexiv_native.cpp")
    stale = (
        os.path.exists(_SO_PATH) and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
    )
    if not os.path.exists(_SO_PATH) or stale:
        if not os.path.exists(src):
            _build_failed = True
            return None
        try:
            if stale:
                os.remove(_SO_PATH)
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception as e:  # noqa: BLE001 — any build failure -> fallback
            log.warning("native build failed (%s); using Python IO", e)
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        log.warning("native load failed (%s); using Python IO", e)
        _build_failed = True
        return None
    lib.rfx_scan.restype = ctypes.c_int
    lib.rfx_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rfx_load.restype = ctypes.c_int64
    lib.rfx_load.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.rfx_dedup.restype = ctypes.c_int64
    lib.rfx_dedup.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.rfx_fastq_splits.restype = ctypes.c_int
    lib.rfx_fastq_splits.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rfx_fastq_scan_mt.restype = ctypes.c_int
    lib.rfx_fastq_scan_mt.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rfx_fastq_load_mt.restype = ctypes.c_int64
    lib.rfx_fastq_load_mt.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.rfx_correct.restype = ctypes.c_int64
    lib.rfx_correct.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
    ]
    lib.rfx_end_index.restype = ctypes.c_int64
    lib.rfx_end_index.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int64, ctypes.c_int32,
    ]
    lib.rfx_map_pairs_hashed.restype = ctypes.c_int32
    lib.rfx_map_pairs_hashed.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
    ]
    lib.rfx_map_pairs.restype = None
    lib.rfx_map_pairs.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
    ]
    lib.rfx_best_overlap.restype = ctypes.c_int32
    lib.rfx_best_overlap.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
    ]
    lib.rfx_map_seeds.restype = None
    lib.rfx_map_seeds.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
    ]
    lib.rfx_merge_pairs.restype = None
    lib.rfx_merge_pairs.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _get_lib() is not None


def _scan(lib, path: str, fmt: int) -> Tuple[int, int]:
    n = ctypes.c_int64(0)
    mx = ctypes.c_int64(0)
    rc = lib.rfx_scan(path.encode(), fmt, ctypes.byref(n), ctypes.byref(mx))
    if rc != 0:
        raise OSError(f"native scan failed for {path}")
    return int(n.value), int(mx.value)


SPLIT_MIN_BYTES = 32 << 20   # split single plain FASTQ files above this
_N_THREADS = max(2, min(16, os.cpu_count() or 2))


def _is_plain_fastq(path: str) -> bool:
    if path.endswith(".gz"):
        return False
    try:
        with open(path, "rb") as fh:
            return fh.read(1) == b"@"
    except OSError:
        return False


def _splits_of(lib, path: str, nsplits: int) -> np.ndarray:
    aligned = np.zeros(nsplits + 1, np.int64)
    rc = lib.rfx_fastq_splits(
        path.encode(), nsplits,
        aligned.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise OSError(f"native split scan failed for {path}")
    return aligned


def load_reads_native(
    paths: List[str], fmt: int = 0, threads: int = 0
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode FASTQ (fmt=0) / FASTA (fmt=1) files into (codes, lens).

    Parallel ingest (the hadoop-4mc splittable-read analog,
    ``ReflexivDataFrameCounter.java:160-176``): files decode concurrently on
    a thread pool (the C calls release the GIL), and a large *plain* FASTQ
    file is additionally byte-range split at record boundaries and parsed by
    multiple threads (``rfx_fastq_splits`` / ``rfx_fastq_load_mt``). Gzip
    streams are not splittable — multi-file input is their parallel axis,
    exactly as 4mc pre-splitting was the reference's.

    Returns None when the native library is unavailable.
    """
    from concurrent.futures import ThreadPoolExecutor

    lib = _get_lib()
    if lib is None:
        return None
    threads = threads or _N_THREADS

    split_paths = {}
    if fmt == 0:
        for p in paths:
            if _is_plain_fastq(p) and os.path.getsize(p) >= SPLIT_MIN_BYTES:
                split_paths[p] = _splits_of(lib, p, threads)

    def scan_one(path):
        if path in split_paths:
            a = split_paths[path]
            ns = len(a) - 1
            counts = np.zeros(ns, np.int64)
            maxlens = np.zeros(ns, np.int64)
            lib.rfx_fastq_scan_mt(
                path.encode(),
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), ns,
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                maxlens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return int(counts.sum()), int(maxlens.max(initial=0)), counts
        n, mx = _scan(lib, path, fmt)
        return n, mx, None

    with ThreadPoolExecutor(max_workers=threads) as pool:
        scans = list(pool.map(scan_one, paths))

    total = sum(n for n, _m, _c in scans)
    stride = max((m for _n, m, _c in scans), default=0)
    codes = np.zeros((total, stride), dtype=np.uint8)
    lens = np.zeros(total, dtype=np.int32)
    starts = np.cumsum([0] + [n for n, _m, _c in scans])

    def load_one(i):
        path = paths[i]
        n, _mx, counts = scans[i]
        at = int(starts[i])
        if counts is not None:
            a = split_paths[path]
            row_off = at + np.concatenate(
                [[0], np.cumsum(counts[:-1])]).astype(np.int64)
            got = lib.rfx_fastq_load_mt(
                path.encode(),
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                row_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(a) - 1,
                codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                stride,
            )
        else:
            got = lib.rfx_load(
                path.encode(), fmt,
                codes[at:].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                lens[at:].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n, stride,
            )
        if got < 0:
            raise OSError(f"native load failed for {path}")
        return int(got)

    with ThreadPoolExecutor(max_workers=threads) as pool:
        gots = list(pool.map(load_one, range(len(paths))))
    at = sum(gots)
    if at != total:
        # scan and load parse identically, so a mismatch means the input
        # changed mid-read (or a parser bug): rows would be misplaced in the
        # preallocated matrix — abort to the Python reader rather than
        # return a silently corrupt matrix
        raise OSError(f"native load row mismatch for {paths}")
    return codes, lens


def dedup_contigs_native(
    contigs: List[str], *, seed_k: int = 31, stride: int = 16,
) -> Optional[List[str]]:
    """Containment dedup over both strands (seed-indexed, C++).

    Same semantics as the Python implementation in
    :func:`reflexiv_tpu.dynamic.dedup_contigs`; returns None when the native
    library is unavailable.
    """
    lib = _get_lib()
    if lib is None or not hasattr(lib, "rfx_dedup"):
        return None
    from .bitpack import encode_ascii

    ordered = sorted(set(contigs), key=len, reverse=True)
    if not ordered:
        return []
    offsets = np.zeros(len(ordered) + 1, dtype=np.int64)
    for i, s in enumerate(ordered):
        offsets[i + 1] = offsets[i] + len(s)
    codes = np.empty(int(offsets[-1]), dtype=np.uint8)
    for i, s in enumerate(ordered):
        codes[offsets[i]: offsets[i + 1]] = encode_ascii(
            np.frombuffer(s.encode(), np.uint8))
    keep = np.zeros(len(ordered), dtype=np.uint8)
    got = lib.rfx_dedup(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(ordered), seed_k, stride,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if got < 0:
        return None
    return [s for s, k in zip(ordered, keep) if k]


def merge_pairs_native(
    m1: np.ndarray, l1: np.ndarray, m2: np.ndarray, l2: np.ndarray,
    *, min_overlap: int, max_mismatch: float,
) -> Optional[np.ndarray]:
    """Best-overlap lengths per pair (0 = unmerged); None if unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    m1 = np.ascontiguousarray(m1, dtype=np.uint8)
    m2 = np.ascontiguousarray(m2, dtype=np.uint8)
    l1 = np.ascontiguousarray(l1, dtype=np.int32)
    l2 = np.ascontiguousarray(l2, dtype=np.int32)
    best = np.zeros(m1.shape[0], dtype=np.int32)
    lib.rfx_merge_pairs(
        m1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        l1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), m1.shape[1],
        m2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        l2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), m2.shape[1],
        m1.shape[0], min_overlap, max_mismatch,
        best.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return best


def iter_split_chunks(path: str, budget_bytes: int):
    """Yield (codes, lens) matrices for byte-range splits of one plain
    FASTQ file, each split parsed only when yielded — the out-of-core
    ingest path (VERDICT r2 #2/#3: the reference streams partitions from
    disk, ``ReflexivDataFrameCounter.java:160-176``; peak resident set is
    one split's matrix, not the file's).

    Returns None (falls back to the Python reader) when the native library
    is unavailable or the file is not splittable plain FASTQ.
    """
    lib = _get_lib()
    if lib is None or not _is_plain_fastq(path):
        return None
    size = os.path.getsize(path)
    nsplits = max(1, -(-size // max(budget_bytes, 1 << 20)))
    aligned = _splits_of(lib, path, nsplits)

    def gen():
        for i in range(len(aligned) - 1):
            sub = np.ascontiguousarray(aligned[i: i + 2])
            counts = np.zeros(1, np.int64)
            maxlens = np.zeros(1, np.int64)
            lib.rfx_fastq_scan_mt(
                path.encode(),
                sub.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 1,
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                maxlens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            n, mx = int(counts[0]), int(maxlens[0])
            if n == 0:
                continue
            codes = np.zeros((n, mx), np.uint8)
            lens = np.zeros(n, np.int32)
            row_off = np.zeros(1, np.int64)
            got = lib.rfx_fastq_load_mt(
                path.encode(),
                sub.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                row_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 1,
                codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), mx)
            if got != n:
                raise OSError(f"native split load mismatch for {path}")
            yield codes, lens

    return gen()


def end_index_native(
    contigs: List[str], *, k: int, end_window: int, threads: int = 0,
):
    """End-window seed index (patching) built in threaded C++.

    Same contents as :func:`reflexiv_tpu.patching._end_index_arrays`
    (sorted unique keys + aligned ci/end/pos/strand payloads, first
    placement wins, (contig, end)-ambiguous keys dropped). Returns the
    five arrays, or None when the native library is unavailable or k > 31.
    """
    lib = _get_lib()
    if lib is None or k > 31 or not hasattr(lib, "rfx_end_index"):
        return None
    n = len(contigs)
    offsets = np.zeros(n + 1, np.int64)
    for i, s in enumerate(contigs):
        offsets[i + 1] = offsets[i] + len(s)
    ascii_cat = np.frombuffer(
        "".join(contigs).encode("latin-1"), np.uint8)
    cap = 0
    for s in contigs:
        w = min(end_window, len(s))
        if w >= k:
            cap += 4 * (w - k + 1)   # 2 regions x 2 strands
    cap = max(cap, 1)
    keys = np.empty(cap, np.uint64)
    ci = np.empty(cap, np.int64)
    end = np.empty(cap, np.int8)
    pos = np.empty(cap, np.int64)
    strand = np.empty(cap, np.int8)
    got = lib.rfx_end_index(
        ascii_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, k, end_window,
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        end.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        strand.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        cap, threads or _N_THREADS,
    )
    if got < 0:
        return None
    # views, not copies: the cap overshoot is small (dedup only) and the
    # copy of ~got*26 bytes costs seconds at the 100M-entry scale
    return keys[:got], ci[:got], end[:got], pos[:got], strand[:got]


def _ragged_ascii(strs):
    n = len(strs)
    off = np.zeros(n + 1, np.int64)
    for i, s in enumerate(strs):
        off[i + 1] = off[i] + len(s)
    cat = np.frombuffer("".join(strs).encode("latin-1"), np.uint8)
    return cat, off


def map_pairs_hashed_native(
    contigs: List[str], pairs, *, k: int, end_window: int, stride: int,
    threads: int = 0,
):
    """Whole patching mapping front-end in one C++ call: hashed end-window
    index (no 100M-entry sort) + both mates of every pair mapped against
    it. Output-identical to end_index_native + map_pairs_native (the dedup
    rule is order-independent; see rfx_map_pairs_hashed). Returns the ten
    mapping arrays, or None when the native library is unavailable or
    k > 31."""
    lib = _get_lib()
    if lib is None or k > 31 or not hasattr(lib, "rfx_map_pairs_hashed"):
        return None
    cascii, coff = _ragged_ascii(contigs)
    a1, off1 = _ragged_ascii([r1 for r1, _ in pairs])
    a2, off2 = _ragged_ascii([r2 for _, r2 in pairs])
    n = len(pairs)
    outs = [np.zeros(n, dt) for dt in
            (np.int64, np.int8, np.int64, np.int8, np.uint8,
             np.int64, np.int8, np.int64, np.int8, np.uint8)]
    P = ctypes.POINTER

    def ptr(a, ct):
        return a.ctypes.data_as(P(ct))

    rc = lib.rfx_map_pairs_hashed(
        ptr(cascii, ctypes.c_uint8), ptr(coff, ctypes.c_int64),
        len(contigs), k, end_window,
        ptr(a1, ctypes.c_uint8), ptr(off1, ctypes.c_int64),
        ptr(a2, ctypes.c_uint8), ptr(off2, ctypes.c_int64), n, stride,
        ptr(outs[0], ctypes.c_int64), ptr(outs[1], ctypes.c_int8),
        ptr(outs[2], ctypes.c_int64), ptr(outs[3], ctypes.c_int8),
        ptr(outs[4], ctypes.c_uint8),
        ptr(outs[5], ctypes.c_int64), ptr(outs[6], ctypes.c_int8),
        ptr(outs[7], ctypes.c_int64), ptr(outs[8], ctypes.c_int8),
        ptr(outs[9], ctypes.c_uint8),
        threads or _N_THREADS,
    )
    if rc != 0:
        return None
    outs[4] = outs[4].astype(bool)
    outs[9] = outs[9].astype(bool)
    return tuple(outs)


def map_pairs_native(
    pairs, keys: np.ndarray, ci: np.ndarray, end: np.ndarray,
    pos: np.ndarray, strand: np.ndarray, *, k: int, stride: int,
    threads: int = 0,
):
    """Map both mates of every pair against the end-window index (C++),
    straight from the pair strings — no padded matrices, no host
    reverse-complement materialization. Mate 1 forward, mate 2 reverse
    complement; identical outputs to patch_contigs' numpy mapping
    front-end. Returns (c1, e1, p1, s1, ok1, c2, e2, p2, s2, ok2),
    or None when the native library is unavailable or k > 31.
    """
    lib = _get_lib()
    if lib is None or k > 31 or not hasattr(lib, "rfx_map_pairs"):
        return None
    n = len(pairs)
    off1 = np.zeros(n + 1, np.int64)
    off2 = np.zeros(n + 1, np.int64)
    for i, (r1, r2) in enumerate(pairs):
        off1[i + 1] = off1[i] + len(r1)
        off2[i + 1] = off2[i] + len(r2)
    a1 = np.frombuffer(
        "".join(r1 for r1, _ in pairs).encode("latin-1"), np.uint8)
    a2 = np.frombuffer(
        "".join(r2 for _, r2 in pairs).encode("latin-1"), np.uint8)
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    ci64 = np.ascontiguousarray(ci, dtype=np.int64)
    end8 = np.ascontiguousarray(end, dtype=np.int8)
    pos64 = np.ascontiguousarray(pos, dtype=np.int64)
    strand8 = np.ascontiguousarray(strand, dtype=np.int8)
    outs = [np.zeros(n, dt) for dt in
            (np.int64, np.int8, np.int64, np.int8, np.uint8,
             np.int64, np.int8, np.int64, np.int8, np.uint8)]
    P = ctypes.POINTER

    def ptr(a, ct):
        return a.ctypes.data_as(P(ct))

    lib.rfx_map_pairs(
        ptr(a1, ctypes.c_uint8), ptr(off1, ctypes.c_int64),
        ptr(a2, ctypes.c_uint8), ptr(off2, ctypes.c_int64), n,
        ptr(keys, ctypes.c_uint64), len(keys),
        ptr(ci64, ctypes.c_int64), ptr(end8, ctypes.c_int8),
        ptr(pos64, ctypes.c_int64), ptr(strand8, ctypes.c_int8),
        k, stride,
        ptr(outs[0], ctypes.c_int64), ptr(outs[1], ctypes.c_int8),
        ptr(outs[2], ctypes.c_int64), ptr(outs[3], ctypes.c_int8),
        ptr(outs[4], ctypes.c_uint8),
        ptr(outs[5], ctypes.c_int64), ptr(outs[6], ctypes.c_int8),
        ptr(outs[7], ctypes.c_int64), ptr(outs[8], ctypes.c_int8),
        ptr(outs[9], ctypes.c_uint8),
        threads or _N_THREADS,
    )
    outs[4] = outs[4].astype(bool)
    outs[9] = outs[9].astype(bool)
    return tuple(outs)


def best_overlap_native(a: bytes, b: bytes, min_overlap: int):
    """Longest exact tail(a)/head(b) overlap (0 = none); None when the
    native library is unavailable."""
    lib = _get_lib()
    if lib is None or not hasattr(lib, "rfx_best_overlap"):
        return None
    aa = np.frombuffer(a, np.uint8)
    bb = np.frombuffer(b, np.uint8)
    return int(lib.rfx_best_overlap(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(bb),
        min_overlap))


def map_seeds_native(
    mat: np.ndarray, lens: np.ndarray, keys: np.ndarray,
    ci: np.ndarray, end: np.ndarray, pos: np.ndarray, strand: np.ndarray,
    *, k: int, stride: int, acgt_ok: np.ndarray = None, threads: int = 0,
):
    """Strided-seed read mapping (patching hot loop) in threaded C++.

    Same outputs as the numpy body of
    :func:`reflexiv_tpu.patching._map_reads_arrays` (first valid seed hit
    per read against the sorted end-window key index). Returns
    ``(ci, end, pos5, strand, mapped)`` arrays, or None when the native
    library is unavailable or k > 31.
    """
    lib = _get_lib()
    if lib is None or k > 31 or not hasattr(lib, "rfx_map_seeds"):
        return None
    mat = np.ascontiguousarray(mat, dtype=np.uint8)
    lens32 = np.ascontiguousarray(lens, dtype=np.int32)
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    ci64 = np.ascontiguousarray(ci, dtype=np.int64)
    end8 = np.ascontiguousarray(end, dtype=np.int8)
    pos64 = np.ascontiguousarray(pos, dtype=np.int64)
    strand8 = np.ascontiguousarray(strand, dtype=np.int8)
    R, L = mat.shape
    ap = None
    if acgt_ok is not None:
        W = L - k + 1
        acgt_ok = np.ascontiguousarray(acgt_ok, dtype=np.uint8)
        assert acgt_ok.shape == (R, W), (acgt_ok.shape, (R, W))
        ap = acgt_ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    out_ci = np.zeros(R, np.int64)
    out_end = np.zeros(R, np.int8)
    out_pos = np.zeros(R, np.int64)
    out_strand = np.zeros(R, np.int8)
    mapped = np.zeros(R, np.uint8)
    lib.rfx_map_seeds(
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        R, L,
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(keys),
        ci64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        end8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        pos64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        strand8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        k, stride, ap,
        out_ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_end.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        out_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_strand.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        mapped.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads or _N_THREADS,
    )
    return out_ci, out_end, out_pos, out_strand, mapped.astype(bool)


def correct_reads_native(
    mat: np.ndarray, lens: np.ndarray, solid_sorted: np.ndarray,
    *, k: int, quals: np.ndarray = None, trust_qual: int = 0,
    threads: int = 0,
):
    """In-place multithreaded k-mer-spectrum correction (the scalar oracle
    semantics of reflexiv_tpu.preprocess.correct_reads_scalar, parallel
    over reads). Returns (matrix, n_fixed), or None when the native
    library is unavailable."""
    lib = _get_lib()
    if lib is None or k > 31:
        return None
    mat = np.ascontiguousarray(mat, dtype=np.uint8)
    lens32 = np.ascontiguousarray(lens, dtype=np.int32)
    solid = np.ascontiguousarray(solid_sorted, dtype=np.uint64)
    qp = None
    if quals is not None and trust_qual > 0:
        quals = np.ascontiguousarray(quals, dtype=np.uint8)
        assert quals.shape == mat.shape
        qp = quals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n_fixed = lib.rfx_correct(
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mat.shape[0], mat.shape[1],
        solid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(solid), k, qp, int(trust_qual), threads or _N_THREADS,
    )
    return mat, int(n_fixed)
