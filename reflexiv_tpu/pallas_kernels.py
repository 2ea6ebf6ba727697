"""Pallas TPU kernels for the hot counting path.

The canonical k-mer extraction kernel processes reads in a transposed layout:
the read index lives on the 128-wide lane dimension and the kernel rolls a
2-bit-packed (forward, reverse-complement) state down the base columns —
one fused pass over the read block in VMEM, instead of XLA's 4*k shifted
slice-OR intermediates. Matches the reference's rolling pack
(``ReverseComplementKmerBinaryExtractionFromDataset``,
``ReflexivDSMain.java:3950-4023``) with the canonical min-select done in
registers.

Supports k <= 31 (two uint32 limbs); callers fall back to the XLA path in
:mod:`reflexiv_tpu.count` for larger k.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BR = SUBLANES * LANES    # reads per kernel instance: one full (8, 128) tile


def _extract_kernel(k: int, L: int):
    """Kernel body factory: bases block (L, 1, 8, 128) uint32 ->
    hi/lo (Wn, 1, 8, 128).

    The read index lives on the trailing (sublane, lane) = (8, 128) tile and
    the base/window index on a *leading* dimension, so the rolling state and
    every load/store is one full native tile — Mosaic rejects the previous
    (1, BR) single-sublane layout with an "Invalid relayout … (1,128) ->
    (8,128)" internal error. A ``fori_loop`` (not a python unroll) keeps the
    Mosaic program small enough for this environment's remote-compile
    service.
    """
    Wn = L - k + 1
    hi_bits = 2 * k - 32  # bits of the packed value living in the hi limb
    hi_mask_val = (1 << hi_bits) - 1 if hi_bits < 32 else 0xFFFFFFFF

    def kernel(bases_ref, hi_ref, lo_ref, st_ref):
        # the rolling (fhi, flo, rhi, rlo) state lives in a VMEM scratch
        # buffer rather than a fori_loop carry: Mosaic assigns the carry a
        # *replicated* layout from its constant-zeros init (even a memory-
        # derived `t ^ t` folds back to a splat) and then rejects the
        # concrete->replicated backedge relayout ("Invalid relayout ...
        # replicated in destination but not in source"); loads/stores
        # through the scratch ref sidestep layout inference entirely
        hi_mask = jnp.uint32(hi_mask_val)
        st_ref[0] = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        st_ref[1] = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        st_ref[2] = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        st_ref[3] = jnp.zeros((SUBLANES, LANES), jnp.uint32)

        def body(j, _):
            fhi, flo = st_ref[0], st_ref[1]
            rhi, rlo = st_ref[2], st_ref[3]
            b = bases_ref[j, 0]                       # (8, 128) tile
            # forward: shift left 2, append b
            fhi = ((fhi << 2) | (flo >> 30)) & hi_mask
            flo = (flo << 2) | b
            # reverse complement: shift right 2, complement enters at the top
            comp = b ^ 3
            rlo = (rlo >> 2) | (rhi << 30)
            rhi = (rhi >> 2) | (comp << (hi_bits - 2))
            st_ref[0], st_ref[1] = fhi, flo
            st_ref[2], st_ref[3] = rhi, rlo

            @pl.when(j >= k - 1)
            def _():
                lt = (fhi < rhi) | ((fhi == rhi) & (flo <= rlo))
                w = j - (k - 1)
                hi_ref[w, 0] = jnp.where(lt, fhi, rhi)
                lo_ref[w, 0] = jnp.where(lt, flo, rlo)

            return 0

        jax.lax.fori_loop(0, L, body, 0)

    return kernel, Wn


def supports(k: int) -> bool:
    return 17 <= k <= 31


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def extract_canonical_kmers_pallas(
    bases: jnp.ndarray,    # (R, L) uint8
    lengths: jnp.ndarray,  # (R,) int32
    *,
    k: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas canonical k-mer extraction for 17 <= k <= 31.

    Returns ``(limbs, valid)`` shaped ``(R_pad * Wn, 2)`` / ``(R_pad * Wn,)``
    — same contract as :func:`reflexiv_tpu.count.extract_canonical_kmers`
    modulo row order (counting is order-independent).
    """
    if not supports(k):
        raise ValueError("pallas extraction kernel supports 17 <= k <= 31")
    R, L = bases.shape
    Wn = L - k + 1
    R_pad = ((R + BR - 1) // BR) * BR
    G = R_pad // BR
    # transpose: reads on the trailing (group, sublane, lane) axes
    bt = jnp.zeros((L, R_pad), dtype=jnp.uint32)
    bt = bt.at[:, :R].set(bases.astype(jnp.uint32).T)
    bt = bt.reshape(L, G, SUBLANES, LANES)

    kernel, _ = _extract_kernel(k, L)
    hi, lo = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((L, 1, SUBLANES, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Wn, 1, SUBLANES, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wn, 1, SUBLANES, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Wn, G, SUBLANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((Wn, G, SUBLANES, LANES), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((4, SUBLANES, LANES), jnp.uint32)],
        interpret=interpret,
    )(bt)
    hi = hi.reshape(Wn, R_pad)
    lo = lo.reshape(Wn, R_pad)

    # validity in the same (Wn, R_pad) layout
    lens_pad = jnp.zeros((R_pad,), jnp.int32).at[:R].set(lengths)
    w_idx = jnp.arange(Wn, dtype=jnp.int32)[:, None]
    read_ok = (lens_pad - k > 1)[None, :] & (
        jnp.arange(R_pad, dtype=jnp.int32)[None, :] < R
    )
    win_ok = w_idx + k <= lens_pad[None, :]
    valid = (read_ok & win_ok).reshape(Wn * R_pad)
    limbs = jnp.stack([hi.reshape(-1), lo.reshape(-1)], axis=-1)
    return limbs, valid
