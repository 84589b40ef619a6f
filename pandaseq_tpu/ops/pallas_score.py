"""Pallas TPU kernel for the all-overlap counting scan.

The hot op of the merger: for every pair and every overlap o in 1..O,
count matches / unknowns over the overlap window and probe the k-mer
candidate diagonal. The XLA fallback materializes a [B, O, O] gathered
frame; here each grid program holds BT=8 pairs resident in VMEM and
*rotates* the right-aligned forward frame one lane per loop step —
overlap o's window is exactly roll(F, o)[:, :o] (assembler.c:48-250
semantics, vectorized over pairs on the sublane axis).

Outputs are packed m | unk<<10 | cand<<20 per (pair, overlap); mismatch
counts are recovered on the caller from the deterministic valid(o).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT = 32  # pairs per grid program (4 sublane tiles per op)


def _kernel(fnt_ref, rnt_ref, fkm_ref, rkm_ref, flen_ref, rlen_ref,
            out_ref, *, L: int, O: int):
    F_nt0 = fnt_ref[:]          # [BT, L] int32, right-aligned
    R_nt = rnt_ref[:]           # [BT, O] int32, flipped
    F_km0 = fkm_ref[:]          # [BT, L] int32, stored k-mers (-1 none)
    R_km = rkm_ref[:]           # [BT, O] int32, emitted k-mers (-2 none)
    flen = flen_ref[:]          # [BT, 1] int32
    rlen = rlen_ref[:]          # [BT, 1] int32

    i_lane = jax.lax.broadcasted_iota(jnp.int32, (BT, O), dimension=1)
    r_is_n = R_nt == 0x0F

    def body(o, carry):
        W_nt, W_km, acc = carry
        # rotate right by one: W[i] = F[(i - o) mod L]; for i < o this is
        # F[L - o + i] — the overlap window of o, for all BT pairs at once
        W_nt = pltpu.roll(W_nt, 1, 1)
        W_km = pltpu.roll(W_km, 1, 1)
        Wo = W_nt[:, :O]
        valid = ((i_lane < o) & (i_lane >= o - flen)
                 & (i_lane < rlen))
        n_mask = (Wo == 0x0F) | r_is_n
        match = (Wo & R_nt) != 0
        m_o = jnp.sum((valid & ~n_mask & match).astype(jnp.int32), axis=1)
        unk_o = jnp.sum((valid & n_mask).astype(jnp.int32), axis=1)
        cand_o = jnp.any((W_km[:, :O] == R_km) & (i_lane < o), axis=1)
        packed = m_o | (unk_o << 10) | (cand_o.astype(jnp.int32) << 20)
        # lane-select accumulate (single-lane dynamic stores are not
        # vector-alignable on TPU)
        acc = jnp.where(i_lane == o - 1, packed[:, None], acc)
        return W_nt, W_km, acc

    acc0 = jnp.zeros((BT, O), jnp.int32)
    _, _, acc = jax.lax.fori_loop(1, O + 1, body, (F_nt0, F_km0, acc0))
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("L", "O"))
def count_all_overlaps(F_nt, R_nt, F_km, R_km, flen, rlen, *, L: int,
                       O: int):
    """packed[b, o-1] = m | unk<<10 | cand<<20 for o in 1..O.

    F_nt/F_km: [B, L] int32 right-aligned frames; R_nt/R_km: [B, O]
    int32 flipped frames; flen/rlen: [B] int32. B is padded to a
    multiple of BT internally.
    """
    B = F_nt.shape[0]
    Bp = ((B + BT - 1) // BT) * BT
    pad = Bp - B
    if pad:
        F_nt = jnp.pad(F_nt, ((0, pad), (0, 0)))
        R_nt = jnp.pad(R_nt, ((0, pad), (0, 0)))
        F_km = jnp.pad(F_km, ((0, pad), (0, 0)), constant_values=-1)
        R_km = jnp.pad(R_km, ((0, pad), (0, 0)), constant_values=-2)
        flen = jnp.pad(flen, (0, pad))
        rlen = jnp.pad(rlen, (0, pad))

    out = pl.pallas_call(
        functools.partial(_kernel, L=L, O=O),
        grid=(Bp // BT,),
        in_specs=[
            pl.BlockSpec((BT, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, O), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, O), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=Bp * O * O * 10, bytes_accessed=Bp * (2 * L + 3 * O) * 4,
            transcendentals=0),
    )(F_nt.astype(jnp.int32), R_nt.astype(jnp.int32),
      F_km.astype(jnp.int32), R_km.astype(jnp.int32),
      flen.astype(jnp.int32)[:, None], rlen.astype(jnp.int32)[:, None])
    return out[:B]
