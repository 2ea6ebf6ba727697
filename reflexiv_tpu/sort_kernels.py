"""Pallas hierarchical bitonic sort for packed k-mer keys.

TPU-native replacement for the ``jax.lax.sort`` call that dominates the
counting pass (the Spark shuffle-sort of ``groupBy("value").count()``,
``ReflexivDataFrameCounter.java:198-209``). XLA's sort is a bitonic network
that streams every one of its ~log2(n)(log2(n)+1)/2 compare-exchange stages
through HBM; at n = 2^24 that is ~300 full-array passes. Here the network is
split hierarchically:

- **local sort kernel**: each 65,536-element block (laid out as a
  (512, 128) = (sublanes, lanes) tile stack in VMEM) runs bitonic rounds
  1..16 entirely on-chip — one HBM read + one write for 136 of the stages.
- **cross-block stages** (stride >= block size): whole-row compare-exchange
  between blocks, expressed as plain XLA elementwise ops (bandwidth-bound,
  perfectly coalesced — these cannot live in VMEM by definition).
- **merge kernel**: after each round's cross-block stages, the remaining 16
  in-block stages (stride 2^15..1) fuse into ONE VMEM pass per round.

Total HBM traffic: ~(2 + #cross-stages + 2·#rounds) array passes instead of
~300 — the sort moves from HBM-bound to VPU-bound. The remaining bound is
fundamental to comparison networks on this hardware: a radix sort's ~16
passes would need per-element scatter/gather, which Mosaic does not expose
and XLA executes at ~0.5 GB/s (scripts/tpu_gather_probe.py), ~80x off.

Keys are two uint32 limbs (hi, lo) compared lexicographically — the packed
canonical k-mer representation for k <= 31 (``bitpack.py``). Invalid rows
must be pre-encoded as the all-ones sentinel so they sort to the tail
(``count._has_spare_key_bits``).

The partner exchange of every stage is a pair of ``pltpu.roll`` rotations
(one per direction) + a bit-select — the XOR-shuffle ``partner = i ^ s``
never selects a wrapped value, so rotation semantics are safe. Rolls take
dynamic shifts, so each round's stages run in a ``fori_loop`` over the
stride exponent and the Mosaic program stays small (the remote-compile
service rejects huge unrolled kernels).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 512
LOGB = 16
BLOCK = ROWS * LANES  # 65,536 elements per VMEM block


def _flat_iota():
    """Flat element index within a block, shaped (ROWS, LANES) uint32."""
    r = jax.lax.broadcasted_iota(jnp.uint32, (ROWS, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.uint32, (ROWS, LANES), 1)
    return r * LANES + l


def _row_partner(arr, j):
    """XOR-partner values at stride 2^j >= LANES: partner is 2^(j-7) rows
    away. partner(i) = i ^ 2^j never selects a wrapped rotation entry (the
    bit structure keeps it in range), so rotation semantics are safe."""
    m = 1 << (j - 7)
    fwd = pltpu.roll(arr, ROWS - m, axis=0)   # result[i] = arr[i + m rows]
    bwd = pltpu.roll(arr, m, axis=0)          # result[i] = arr[i - m rows]
    return fwd, bwd


def _lane_partner(arr, j):
    """XOR-partner values at stride 2^j < LANES: partner within the lane
    dimension."""
    s = 1 << j
    fwd = pltpu.roll(arr, LANES - s, axis=1)
    bwd = pltpu.roll(arr, s, axis=1)
    return fwd, bwd


def _stage_body(st_hi, st_lo, f, j, asc, partner_fn):
    """One compare-exchange stage at stride 2^j (j may be dynamic) over
    VMEM-resident state. ``asc`` is the per-element ascending mask for the
    current round; ``partner_fn`` is the statically chosen exchange
    direction (row vs lane)."""
    hi = st_hi[:]
    lo = st_lo[:]
    fh, bh = partner_fn(hi, j)
    fl, bl = partner_fn(lo, j)
    bit_s = ((f >> j) & 1) != 0
    ph = jnp.where(bit_s, bh, fh)
    plo = jnp.where(bit_s, bl, fl)
    lt = (hi < ph) | ((hi == ph) & (lo < plo))
    # low side (bit clear) keeps min iff ascending: keep_min = bit_s != asc;
    # keep self iff keep_min == lt. Pure &|^~ forms only — a jnp.where over
    # two i1 vectors lowers through an i8 -> i1 truncation Mosaic rejects
    # ("Unsupported target bitwidth"), and i1 cmpi is the same risk class.
    keep_min = bit_s ^ asc
    keep_self = ~(keep_min ^ lt)
    st_hi[:] = jnp.where(keep_self, hi, ph)
    st_lo[:] = jnp.where(keep_self, lo, plo)


def _run_stages(st_hi, st_lo, f, k_, asc):
    """All stages of one bitonic round: strides 2^k_ .. 1, split statically
    into row-partner stages (stride >= LANES) and lane-partner stages."""
    if k_ >= 7:
        def row_body(t, _):
            _stage_body(st_hi, st_lo, f, k_ - t, asc, _row_partner)
            return 0

        jax.lax.fori_loop(0, k_ - 6, row_body, 0)
        lane_hi = 6
    else:
        lane_hi = k_

    def lane_body(t, _):
        _stage_body(st_hi, st_lo, f, lane_hi - t, asc, _lane_partner)
        return 0

    jax.lax.fori_loop(0, lane_hi + 1, lane_body, 0)


def _run_stages_static(st_hi, st_lo, f, k_, asc):
    """Statically unrolled stages of one bitonic round (fallback for the
    case where Mosaic rejects dynamic-shift rolls): at most 16 small
    stages per kernel, so the program stays well under the remote-compile
    service's size ceiling."""
    for j in range(k_, -1, -1):
        _stage_body(st_hi, st_lo, f, j, asc,
                    _row_partner if j >= 7 else _lane_partner)


def _round_kernel_factory(k_: int):
    """One bitonic round (stages 2^k_..1, static strides) over one block;
    round LOGB-1 takes its direction from block parity (the global index's
    bit LOGB)."""

    def kernel(hi_ref, lo_ref, ohi_ref, olo_ref, st_hi, st_lo):
        f = _flat_iota()
        st_hi[:] = hi_ref[:]
        st_lo[:] = lo_ref[:]
        if k_ + 1 < LOGB:
            asc = ((f >> (k_ + 1)) & 1) == 0
        else:
            blk = pl.program_id(0)
            asc = jnp.full((ROWS, LANES), (blk & 1) == 0, dtype=bool)
        _run_stages_static(st_hi, st_lo, f, k_, asc)
        ohi_ref[:] = st_hi[:]
        olo_ref[:] = st_lo[:]

    return kernel


def _merge_block_kernel_static_factory(k1shift: int):
    def kernel(hi_ref, lo_ref, ohi_ref, olo_ref, st_hi, st_lo):
        f = _flat_iota()
        blk = pl.program_id(0)
        asc_flag = (((blk << LOGB) >> k1shift) & 1) == 0
        asc = jnp.full((ROWS, LANES), asc_flag, dtype=bool)
        st_hi[:] = hi_ref[:]
        st_lo[:] = lo_ref[:]
        _run_stages_static(st_hi, st_lo, f, LOGB - 1, asc)
        ohi_ref[:] = st_hi[:]
        olo_ref[:] = st_lo[:]

    return kernel


def _local_sort_kernel(hi_ref, lo_ref, ohi_ref, olo_ref, st_hi, st_lo):
    """Bitonic rounds 0..15: fully sort one 65,536-element block in VMEM."""
    f = _flat_iota()
    st_hi[:] = hi_ref[:]
    st_lo[:] = lo_ref[:]
    for k_ in range(LOGB):  # rounds unrolled; stages via fori_loop
        if k_ + 1 < LOGB:
            asc = ((f >> (k_ + 1)) & 1) == 0
        else:
            # final local round: the direction bit is the GLOBAL index's bit
            # LOGB — i.e. block parity — so blocks come out alternately
            # ascending/descending, forming the bitonic runs the cross-block
            # rounds expect
            blk = pl.program_id(0)
            asc = jnp.full((ROWS, LANES), (blk & 1) == 0, dtype=bool)
        _run_stages(st_hi, st_lo, f, k_, asc)
    ohi_ref[:] = st_hi[:]
    olo_ref[:] = st_lo[:]


def _merge_block_kernel_factory(k1shift: int):
    """In-block tail of merge round ``k_`` (= k1shift - 1): stages at stride
    2^15..1. Direction is constant per block: every element of a block lies
    in the same 2^(k_+1)-run because k_+1 > LOGB."""

    def kernel(hi_ref, lo_ref, ohi_ref, olo_ref, st_hi, st_lo):
        f = _flat_iota()
        blk = pl.program_id(0)
        asc_flag = (((blk << LOGB) >> k1shift) & 1) == 0
        asc = jnp.full((ROWS, LANES), asc_flag, dtype=bool)
        st_hi[:] = hi_ref[:]
        st_lo[:] = lo_ref[:]
        _run_stages(st_hi, st_lo, f, LOGB - 1, asc)
        ohi_ref[:] = st_hi[:]
        olo_ref[:] = st_lo[:]

    return kernel


def _block_specs():
    spec = pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return dict(
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        scratch_shapes=[
            pltpu.VMEM((ROWS, LANES), jnp.uint32),
            pltpu.VMEM((ROWS, LANES), jnp.uint32),
        ],
    )


def _squeeze_kernel(kernel):
    """Adapt a (ROWS, LANES)-state kernel to (1, ROWS, LANES) refs."""

    def wrapped(hi_ref, lo_ref, ohi_ref, olo_ref, st_hi, st_lo):
        kernel(hi_ref.at[0], lo_ref.at[0], ohi_ref.at[0], olo_ref.at[0],
               st_hi, st_lo)

    return wrapped


def _local_sort(hi, lo, nb, interpret):
    out = pl.pallas_call(
        _squeeze_kernel(_local_sort_kernel),
        grid=(nb,),
        out_shape=[
            jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.uint32),
        ],
        interpret=interpret,
        **_block_specs(),
    )(hi, lo)
    return out[0], out[1]


def _local_sort_static(hi, lo, nb, interpret):
    """Static-stride local sort: one pallas_call per round (LOGB HBM round
    trips instead of one — ~2 GB extra traffic at 2^24, a few ms — but no
    dynamic-shift rolls)."""
    for k_ in range(LOGB):
        out = pl.pallas_call(
            _squeeze_kernel(_round_kernel_factory(k_)),
            grid=(nb,),
            out_shape=[
                jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.uint32),
            ],
            interpret=interpret,
            **_block_specs(),
        )(hi, lo)
        hi, lo = out[0], out[1]
    return hi, lo


def _merge_blocks_static(hi, lo, nb, k1shift, interpret):
    out = pl.pallas_call(
        _squeeze_kernel(_merge_block_kernel_static_factory(k1shift)),
        grid=(nb,),
        out_shape=[
            jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.uint32),
        ],
        interpret=interpret,
        **_block_specs(),
    )(hi, lo)
    return out[0], out[1]


def _merge_blocks(hi, lo, nb, k1shift, interpret):
    out = pl.pallas_call(
        _squeeze_kernel(_merge_block_kernel_factory(k1shift)),
        grid=(nb,),
        out_shape=[
            jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.uint32),
        ],
        interpret=interpret,
        **_block_specs(),
    )(hi, lo)
    return out[0], out[1]


def _cross_stage(hi, lo, m, k1shift):
    """Compare-exchange at block-stride ``m`` (elements 2^LOGB * m apart):
    plain XLA elementwise over (nb, BLOCK)-shaped views — each row is one
    block, partner row = row ^ m, direction constant per row."""
    nb = hi.shape[0]

    def part(a):
        a4 = a.reshape(nb // (2 * m), 2, m, a.shape[1], a.shape[2])
        return jnp.flip(a4, axis=1).reshape(a.shape)

    ph, plo = part(hi), part(lo)
    r = jnp.arange(nb, dtype=jnp.uint32).reshape(nb, 1, 1)
    bit_s = ((r // m) & 1) != 0
    asc = (((r << LOGB) >> k1shift) & 1) == 0
    keep_min = bit_s == (~asc)
    lt = (hi < ph) | ((hi == ph) & (lo < plo))
    keep_self = jnp.where(keep_min, lt, ~lt)
    return jnp.where(keep_self, hi, ph), jnp.where(keep_self, lo, plo)


@functools.partial(jax.jit, static_argnames=("interpret", "static_stages"))
def sort_pairs(hi: jnp.ndarray, lo: jnp.ndarray, *, interpret: bool = False,
               static_stages: bool = False):
    """Sort N = len(hi) two-limb keys ascending (lexicographic (hi, lo)).

    N must be a power of two and a multiple of BLOCK; pad with the all-ones
    sentinel first (sentinels sort to the tail). Returns sorted (hi, lo).
    ``static_stages`` selects the per-round static-stride kernels (more HBM
    round trips, no dynamic-shift rolls).
    """
    N = hi.shape[0]
    if N % BLOCK != 0 or N & (N - 1):
        raise ValueError(f"N={N} must be a power of two multiple of {BLOCK}")
    nb = N // BLOCK
    logn = N.bit_length() - 1
    hi = hi.reshape(nb, ROWS, LANES)
    lo = lo.reshape(nb, ROWS, LANES)
    local = _local_sort_static if static_stages else _local_sort
    merge = _merge_blocks_static if static_stages else _merge_blocks
    hi, lo = local(hi, lo, nb, interpret)
    for k_ in range(LOGB, logn):
        for j in range(k_, LOGB - 1, -1):
            hi, lo = _cross_stage(hi, lo, 1 << (j - LOGB), k_ + 1)
        hi, lo = merge(hi, lo, nb, k_ + 1, interpret)
    return hi.reshape(N), lo.reshape(N)


SENTINEL = jnp.uint32(0xFFFFFFFF)


def default_static_stages() -> bool:
    """Whether callers should use the static-stride kernels by default
    (REFLEXIV_PALLAS_SORT_STATIC=1) — set when the dynamic-roll kernels
    fail to compile on the target's Mosaic version."""
    import os

    return os.environ.get("REFLEXIV_PALLAS_SORT_STATIC", "0") != "0"


def padded_size(n: int) -> int:
    """Smallest power-of-two multiple of BLOCK that holds ``n`` elements."""
    cap = BLOCK
    while cap < n:
        cap <<= 1
    return cap


def sort_pairs_padded(hi: jnp.ndarray, lo: jnp.ndarray, *,
                      interpret: bool = False, static_stages: bool = False):
    """Sentinel-pad to a power-of-two multiple of BLOCK and sort.

    Returns PADDED sorted limbs (length ``padded_size(N)``); the all-ones
    sentinel rows sort to the tail, so callers that already encode invalid
    rows as sentinels just see a longer tail.
    """
    N = hi.shape[0]
    cap = padded_size(N)
    if cap != N:
        pad = cap - N
        hi = jnp.concatenate([hi, jnp.full(pad, SENTINEL, jnp.uint32)])
        lo = jnp.concatenate([lo, jnp.full(pad, SENTINEL, jnp.uint32)])
    return sort_pairs(hi, lo, interpret=interpret,
                      static_stages=static_stages)
