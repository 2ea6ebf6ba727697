"""2-bit nucleotide packing primitives (JAX, TPU-native 32-bit limbs).

The reference packs k-mers into Java ``long``s, 2 bits per base, first base in
the most-significant bits (``ReflexivDSMain.java:3950-4023``,
``ReflexivDataFrameCounter64.java:390-651``). TPUs have no native 64-bit
integer lanes, so we use **uint32 limbs, 16 bases per limb, big-endian limb
order**: a k-mer is ``W = ceil(k/16)`` limbs where ``limbs[..., 0]`` holds the
most-significant bits of the integer ``sum(base[j] * 4**(k-1-j))``. Unsigned
lexicographic comparison over limbs equals integer comparison, which matches
the reference's canonical-k-mer rule (min of forward/reverse-complement,
``ReflexivDSMain.java:3998-4004``).

Base codes: A=0, C=1, G=2, T=3; any other letter (incl. N) maps to T=3,
matching ``nucleotideValue`` (``ReflexivDSMain.java:4010-4022``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# --- host-side ASCII <-> code tables -------------------------------------------------

_ASCII_TO_CODE = np.full(256, 3, dtype=np.uint8)  # default T, as in the reference
for _ch, _v in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
    _ASCII_TO_CODE[ord(_ch)] = _v
    _ASCII_TO_CODE[ord(_ch.lower())] = _v

CODE_TO_BASE = np.frombuffer(b"ACGT", dtype=np.uint8)


def encode_ascii(seq_bytes: np.ndarray) -> np.ndarray:
    """ASCII uint8 array -> 2-bit codes (host-side, numpy)."""
    return _ASCII_TO_CODE[seq_bytes]


def decode_to_str(codes: np.ndarray) -> str:
    """2-bit code array -> nucleotide string (host-side, numpy)."""
    return CODE_TO_BASE[np.asarray(codes, dtype=np.uint8)].tobytes().decode()


def revcomp_matrix(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-row reverse complement of a padded (R, L) uint8 code matrix
    (host-side, numpy): one gather mapping column j -> lens-1-j, pad 0."""
    R, L = mat.shape
    col = lens[:, None].astype(np.int64) - 1 - np.arange(L)[None, :]
    ok = col >= 0
    return np.where(
        ok, 3 - mat[np.arange(R)[:, None], np.clip(col, 0, L - 1)], 0
    ).astype(np.uint8)


def rolling_window_values(mat: np.ndarray, k: int, *, want_rc: bool = True):
    """(R, L) uint8 code matrix -> (R, L-k+1) uint64 window values
    (host-side, numpy), optionally with the reverse-complement values.

    Forward value of window ``mat[i, j:j+k]`` is MSB-first
    (``sum(base[t] << 2*(k-1-t))``); the rc value is the forward value of the
    window's reverse complement. Rolling update along the window axis:
    O(R*L) work with (R,)-sized carry state — no (R, W, k) gather and no
    per-window shift-OR rescan.
    """
    R, L = mat.shape
    W = L - k + 1
    if W <= 0:
        z = np.zeros((R, 0), np.uint64)
        return (z, z.copy()) if want_rc else (z, None)
    mask = np.uint64((1 << (2 * k)) - 1)
    top = np.uint64(2 * (k - 1))
    two, three = np.uint64(2), np.uint64(3)
    fwd = np.empty((R, W), np.uint64)
    rc = np.empty((R, W), np.uint64) if want_rc else None
    cur = np.zeros(R, np.uint64)
    curr = np.zeros(R, np.uint64) if want_rc else None
    for t in range(k - 1):
        c = mat[:, t].astype(np.uint64)
        cur = ((cur << two) | c) & mask
        if want_rc:
            curr = (curr >> two) | ((three ^ c) << top)
    for j in range(W):
        c = mat[:, j + k - 1].astype(np.uint64)
        cur = ((cur << two) | c) & mask
        fwd[:, j] = cur
        if want_rc:
            curr = (curr >> two) | ((three ^ c) << top)
            rc[:, j] = curr
    return fwd, rc


# --- limb geometry -------------------------------------------------------------------

def num_limbs(k: int) -> int:
    """Number of uint32 limbs holding a k-base 2-bit-packed word."""
    return (k + 15) // 16


def pack_bases(bases: jnp.ndarray, k: int) -> jnp.ndarray:
    """Pack ``(..., k)`` uint8 base codes into ``(..., W)`` uint32 limbs.

    Bit layout: base ``j`` sits at bit position ``2*(k-1-j)`` of the 2k-bit
    big integer; limbs store that integer big-endian in 32-bit chunks.
    """
    W = num_limbs(k)
    out = [jnp.zeros(bases.shape[:-1], dtype=jnp.uint32) for _ in range(W)]
    b32 = bases.astype(jnp.uint32)
    for j in range(k):
        bitpos = 2 * (k - 1 - j)
        limb = W - 1 - bitpos // 32
        shift = bitpos % 32
        out[limb] = out[limb] | (b32[..., j] << shift)
    return jnp.stack(out, axis=-1)


def pack_bases_np(bases: np.ndarray, k: int) -> np.ndarray:
    """NumPy twin of :func:`pack_bases` (same bit/limb layout, host-side).

    Used where a large byte pool lives on the host and only its packed keys
    should ever reach the device (e.g. the k-pair reduction: uploading the
    (N, k2) byte matrix costs a x128 minor-dim layout pad in HBM)."""
    W = num_limbs(k)
    out = np.zeros(bases.shape[:-1] + (W,), np.uint32)
    b32 = bases.astype(np.uint32)
    for j in range(k):
        bitpos = 2 * (k - 1 - j)
        out[..., W - 1 - bitpos // 32] |= b32[..., j] << np.uint32(bitpos % 32)
    return out


def unpack_bases(limbs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse of :func:`pack_bases`: ``(..., W)`` uint32 -> ``(..., k)`` uint8."""
    W = num_limbs(k)
    cols = []
    for j in range(k):
        bitpos = 2 * (k - 1 - j)
        limb = W - 1 - bitpos // 32
        shift = bitpos % 32
        cols.append(((limbs[..., limb] >> shift) & 3).astype(jnp.uint8))
    return jnp.stack(cols, axis=-1)


def revcomp_bases(bases: jnp.ndarray) -> jnp.ndarray:
    """Reverse complement on 2-bit codes: reverse order, XOR 3 (A<->T, C<->G)."""
    return (3 - bases[..., ::-1]).astype(bases.dtype)


def revcomp_packed(limbs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reverse complement of packed k-mers (via unpack/pack; fine off hot path)."""
    return pack_bases(revcomp_bases(unpack_bases(limbs, k)), k)


def limbs_less(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unsigned lexicographic ``a < b`` over the trailing limb axis."""
    W = a.shape[-1]
    lt = jnp.zeros(a.shape[:-1], dtype=bool)
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for i in range(W):
        ai, bi = a[..., i], b[..., i]
        lt = lt | (eq & (ai < bi))
        eq = eq & (ai == bi)
    return lt


def limbs_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def canonical_packed(fwd: jnp.ndarray, rc: jnp.ndarray) -> jnp.ndarray:
    """Canonical k-mer = min(forward, reverse-complement).

    Matches the reference's compare-and-pick in
    ``ReverseComplementKmerBinaryExtractionFromDataset``
    (``ReflexivDSMain.java:3998-4004``).
    """
    take_fwd = limbs_less(fwd, rc) | limbs_equal(fwd, rc)
    return jnp.where(take_fwd[..., None], fwd, rc)


def mix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer: a cheap, well-mixed uint32 hash (for shard routing
    and the deterministic orientation draw that replaces the reference's
    stateful ``randomReflexivMarker`` toggle, ``ReflexivDSMain.java:3688-3791``)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x
