"""Pallas probes for the 8-bit partition ("radix") counting design.

VERDICT r3 #5: the round-3 retraction of the radix-sort roofline rested on
one data point (the hierarchical bitonic measuring 0.61x XLA). The open
question was whether Mosaic's documented dynamic-offset static-size DMA
(``ref.at[pl.ds(off, SIZE)]`` + ``pltpu.make_async_copy``) makes the
partition exchange fast enough to change the verdict. This module holds the
two previously-unmeasured primitives as compact kernels, plus the full
padded partition pass they would compose into:

* :func:`padded_exchange` — the padded run-copy partition exchange: block b
  holds its digit-d elements contiguously (block-grouped input); each (b, d)
  run is DMA'd HBM->HBM into a padded static slot ``(d*nb + b) * maxrun``.
  Destinations never overlap (padded slots), so a ring of in-flight DMAs
  runs at full async depth. This is the exchange the round-3 analysis
  called "expressible but unmeasured" (ROADMAP r3 notes).
* :func:`tile_gather_probe` — random *aligned-tile* dynamic-offset loads.
  Mosaic rejects 1-D HBM slices that are not whole 1024-element tiles
  ("Slice shape along dimension 0 must be aligned to tiling (1024)",
  measured round 5 on v5e), so the one-element DMA the arithmetic "gather
  form" wanted is INEXPRESSIBLE; the cheapest expressible primitive is a
  random 4 KB tile copy, and a radix gather pass would pay one whole tile
  per element. This probe measures that tile rate; the per-element rate
  is tile_rate / 1024 useful elements.

Composition arithmetic (why these two numbers settle the design): a
partition pass = block grouping + exchange; grouping is a per-element
permutation, whose cheapest measured Mosaic form is the VMEM bitonic local
sort (32 ms at 2^24, TPU_ROUND3_evidence sort_components_24) — already 56%
of the 57 ms XLA kill line — and partition-then-count must then group
AGAIN inside each padded bucket (>= 2x the data after padding). So the
pass only becomes interesting if one of THESE primitives is so fast that a
grouping-free formulation exists. The probes give that number either way.

Compile-size discipline (the remote-compile service wedged on a huge
Mosaic program in round 2): both kernels are small scalar loops issuing
DMAs — no unrolled networks, no large VMEM state. Offset tables live in
HBM and are staged into SMEM per block (a scalar-prefetch array of
nb*256 int32 would exceed SMEM).

Reference: the partition replaces the Spark hash shuffle of
``groupBy("value").count()`` (``ReflexivDataFrameCounter.java:198-209``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_DIGITS = 256
_RING = 8     # in-flight DMA depth for the exchange
_TILE = 1024  # Mosaic 1-D i32/u32 HBM tiling: dynamic slices must be
              # whole 1024-element tiles (v5e, measured round 5)


def _slot_size(maxrun: int) -> int:
    """Padded bucket-slot stride: Mosaic can only DMA whole 1024-element
    tiles at provably tile-aligned offsets, so each run's copy starts at
    its source tile boundary (up to ``_TILE - 1`` head slack) and covers
    ``maxrun`` payload elements."""
    return maxrun + _TILE


def _exchange_kernel_factory(nb: int, block: int, maxrun: int):
    """One grid step = one source block: stage the block's 256 run starts
    into SMEM, then loop its digits issuing one (hi, lo) DMA pair per run
    into the padded bucket slots. A semaphore ring of ``_RING`` keeps that
    many runs in flight across the loop AND across grid steps.

    Alignment (measured on v5e, round 5): 1-D HBM slices must be whole
    1024-element tiles at offsets the compiler can PROVE tile-divisible —
    arbitrary run starts are rejected ("Failed to prove that a tile index
    ... is divisible"). Each copy therefore starts at the run's source
    tile boundary (``(src // _TILE) * _TILE``, provable by construction)
    and spans ``slot = maxrun + _TILE`` elements; the run's payload begins
    ``src % _TILE`` into its slot (host compaction accounts for it).

    Ring retirement note: every data DMA copies exactly ``slot`` uint32,
    so a wait may be issued through a reconstructed descriptor with any
    offsets — the byte count (what the DMA semaphore tracks) is identical.
    That lets a block retire DMAs its predecessor started without keeping
    the predecessor's offset table around.
    """
    n_steps = nb * N_DIGITS
    slot_sz = _slot_size(maxrun)
    aligned = slot_sz % _TILE == 0   # true on hardware (maxrun % 1024 == 0)

    def _hint(off):
        return pl.multiple_of(off, _TILE) if aligned else off

    def kernel(starts_hbm, hi_ref, lo_ref, ohi_ref, olo_ref,
               st_smem, st_sem, sems):
        b = pl.program_id(0)
        # stage a whole 1024-element tile (Mosaic's minimum 1-D slice) at
        # a tile-aligned offset: the wrapper lays the table out at a
        # _TILE stride per block (leading N_DIGITS entries used)
        stage = pltpu.make_async_copy(
            starts_hbm.at[pl.ds(_hint(b * _TILE), _TILE)], st_smem, st_sem)
        stage.start()
        stage.wait()

        def dmas_at(src, dst, slot):
            dma_hi = pltpu.make_async_copy(
                hi_ref.at[pl.ds(src, slot_sz)],
                ohi_ref.at[pl.ds(dst, slot_sz)],
                sems.at[slot, 0],
            )
            dma_lo = pltpu.make_async_copy(
                lo_ref.at[pl.ds(src, slot_sz)],
                olo_ref.at[pl.ds(dst, slot_sz)],
                sems.at[slot, 1],
            )
            return dma_hi, dma_lo

        def wait_slot(slot):
            # byte-count-equivalent descriptor (see docstring)
            h, l = dmas_at(0, 0, slot)
            h.wait()
            l.wait()

        def body(d, _):
            step = b * N_DIGITS + d
            slot = step % _RING

            @pl.when(step >= _RING)
            def _():
                wait_slot(slot)

            src = b * block + st_smem[d]
            src_t = (src // _TILE) * _TILE
            dst = (d * nb + b) * slot_sz
            h, l = dmas_at(_hint(src_t), _hint(dst), slot)
            h.start()
            l.start()

            # drain: the final step waits out the whole ring
            @pl.when(step == n_steps - 1)
            def _():
                def drain(k, _):
                    wait_slot(k)
                    return 0

                jax.lax.fori_loop(0, min(_RING, n_steps), drain, 0)

            return 0

        jax.lax.fori_loop(0, N_DIGITS, body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block", "maxrun", "interpret"))
def padded_exchange(
    hi_g: jnp.ndarray, lo_g: jnp.ndarray, starts: jnp.ndarray,
    *, block: int, maxrun: int, interpret: bool = False,
):
    """Padded run-copy partition exchange.

    ``hi_g``/``lo_g``: (nb*block + maxrun,) uint32, block-grouped (each
    ``block``-sized chunk holds its elements grouped — e.g. sorted — by the
    8-bit digit), with ``maxrun`` slack elements appended so the final
    run's static-size over-read stays in bounds (the wrapper appends the
    extra ``_TILE`` of align-down slack itself). ``starts``: (nb*256,)
    int32, each (b, d) run's start offset within its block (monotone per
    block; run length = next start - start, assumed <= maxrun by the
    caller's maxrun choice).

    Returns (out_hi, out_lo) of shape (256*nb*slot,) with
    ``slot = maxrun + _TILE``: run (b, d)'s payload lands at
    ``(d*nb + b)*slot + (b*block + starts[b,d]) % _TILE`` (tile-aligned
    copies carry up to ``_TILE - 1`` head elements; callers compact via
    the run-length table — see :func:`compact_buckets_np`).
    """
    total = hi_g.shape[0] - maxrun
    nb = total // block
    slot_sz = _slot_size(maxrun)
    out_shape = N_DIGITS * nb * slot_sz
    # starts laid out one _TILE-stride row per block so the staging DMA's
    # offset (b*_TILE) is provably tile-aligned
    st_tiled = jnp.zeros((nb, _TILE), jnp.int32)
    st_tiled = st_tiled.at[:, :N_DIGITS].set(
        starts.astype(jnp.int32).reshape(nb, N_DIGITS))
    return pl.pallas_call(
        _exchange_kernel_factory(nb, block, maxrun),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_shape,), jnp.uint32),
            jax.ShapeDtypeStruct((out_shape,), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.SMEM((_TILE,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((_RING, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        st_tiled.reshape(-1),
        # align-down slack: a copy may start up to _TILE-1 before its run
        jnp.concatenate([hi_g, jnp.zeros(_TILE, jnp.uint32)]),
        jnp.concatenate([lo_g, jnp.zeros(_TILE, jnp.uint32)]))


def group_blocks_xla(hi, lo, *, block: int, shift: int):
    """Reference block-grouping + run-start table (XLA, for the probe and
    the interpret tests): sorts each ``block``-sized chunk by (digit, key)
    and returns (hi_g, lo_g, starts (nb*256,) int32)."""
    N = hi.shape[0]
    nb = N // block
    h2 = hi.reshape(nb, block)
    l2 = lo.reshape(nb, block)
    sh, sl = jax.vmap(
        lambda a, b: jax.lax.sort((a, b), num_keys=2))(h2, l2)
    digits = ((sh >> shift) & 0xFF).astype(jnp.uint32)
    bins = (jnp.arange(N_DIGITS, dtype=jnp.uint32))[None, :]
    starts = jax.vmap(
        lambda dg: jnp.searchsorted(dg, bins[0], side="left"))(digits)
    return sh.reshape(-1), sl.reshape(-1), starts.reshape(-1).astype(jnp.int32)


def compact_buckets_np(out_hi, out_lo, starts, *, nb, block, maxrun):
    """Host-side validation helper: drop the pad tails of every (d, b) slot
    and concatenate buckets in digit order."""
    import numpy as np

    starts = np.asarray(starts).reshape(nb, N_DIGITS)
    ends = np.concatenate(
        [starts[:, 1:], np.full((nb, 1), block, np.int32)], axis=1)
    lens = ends - starts
    hi_parts, lo_parts = [], []
    oh = np.asarray(out_hi)
    ol = np.asarray(out_lo)
    slot_sz = _slot_size(maxrun)
    for d in range(N_DIGITS):
        for b in range(nb):
            src = b * block + int(starts[b, d])
            at = (d * nb + b) * slot_sz + src % _TILE
            n = int(lens[b, d])
            hi_parts.append(oh[at: at + n])
            lo_parts.append(ol[at: at + n])
    return np.concatenate(hi_parts), np.concatenate(lo_parts)


_GCHUNK = 1024   # tile starts staged per grid step (one SMEM tile)


def _tile_gather_kernel_factory(n_tiles: int):
    """Random aligned-tile loads: out[t*1024:(t+1)*1024] =
    src[starts[t] : starts[t]+1024], one HBM->HBM DMA per tile with a
    ``_RING``-deep in-flight window (reconstructed-descriptor retirement —
    every DMA moves exactly ``_TILE`` uint32, see the exchange kernel's
    ring note). This is the cheapest dynamic-offset load Mosaic admits on
    1-D data; a gather-form radix pass would pay one such tile per
    *element* it gathers."""

    def kernel(idx_hbm, src_ref, out_ref, ibuf, sem_i, sems):
        c = pl.program_id(0)
        stage = pltpu.make_async_copy(
            idx_hbm.at[pl.ds(c * _GCHUNK, _GCHUNK)], ibuf, sem_i)
        stage.start()
        stage.wait()

        def body(i, _):
            t = c * _GCHUNK + i
            slot = t % _RING

            @pl.when(jnp.logical_and(t >= _RING, t < n_tiles))
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(0, _TILE)],
                    out_ref.at[pl.ds(0, _TILE)],
                    sems.at[slot]).wait()

            @pl.when(t < n_tiles)
            def _():
                # offsets must be PROVABLY tile-divisible; the wrapper's
                # contract is 1024-aligned starts, assert it to Mosaic
                dma = pltpu.make_async_copy(
                    src_ref.at[pl.ds(pl.multiple_of(ibuf[i], _TILE), _TILE)],
                    out_ref.at[pl.ds(pl.multiple_of(t * _TILE, _TILE),
                                     _TILE)],
                    sems.at[slot])
                dma.start()

            @pl.when(t == n_tiles - 1)
            def _():
                def drain(kk, _):
                    pltpu.make_async_copy(
                        src_ref.at[pl.ds(0, _TILE)],
                        out_ref.at[pl.ds(0, _TILE)],
                        sems.at[kk]).wait()
                    return 0

                jax.lax.fori_loop(0, min(_RING, n_tiles), drain, 0)

            return 0

        jax.lax.fori_loop(0, _GCHUNK, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def tile_gather_probe(src, tile_starts, *, interpret: bool = False):
    """out[t] tile = src[tile_starts[t] : +1024] for each of n_tiles random
    (1024-aligned) starts; measures the random dynamic-offset tile-load
    rate that bounds any gather-form radix pass (one tile per gathered
    element — Mosaic has no sub-tile 1-D slice)."""
    n_tiles = tile_starts.shape[0]
    assert n_tiles % _GCHUNK == 0
    return pl.pallas_call(
        _tile_gather_kernel_factory(n_tiles),
        grid=(n_tiles // _GCHUNK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_tiles * _TILE,), jnp.uint32),
        scratch_shapes=[
            pltpu.SMEM((_GCHUNK,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((_RING,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_starts.astype(jnp.int32), src)
