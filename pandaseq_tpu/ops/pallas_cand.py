"""Pallas TPU kernel for the k-mer candidate plane (anti-diagonal sums).

The production XLA kernel (`fused2.plane_cand`) computes

    candc[b, t] = #{ (j, i) : j + i == t, Fkm[b, j] == Rkm[b, i] }

as one dense int8 dot_general of the [B, O, O] equality plane against
the [O, O, O] diagonal indicator T3 — 2*B*O^3 MXU MACs, of which a
provable fraction is zero work: only anti-diagonals t <= O-1 are
consumed (overlap o = t+1 ranges 1..O, assembler.c:84-118), so every
(j, i) tile with j + i >= O contributes nothing.

This kernel blocks the plane into bs x bs cells and runs ONLY the
cells with any live diagonal (j0 + i0 < O): NB*(NB+1)/2 of NB^2 cells,
i.e. 75% of the MACs at O=256/bs=128 and 62.5% at bs=64. Per cell the
kq equality block is built in VMEM (never touching HBM — the XLA
version materializes nothing either, but it cannot skip blocks) and
contracted on the MXU with a cell-LOCAL diagonal indicator
T3loc[jl, il, u] = (jl + il == u), which is independent of the cell
position: the global diagonal is t = (jb + ib)*bs + u, so cells sharing
s = jb + ib accumulate into the same 2*bs-wide output window.

Output windows for consecutive s overlap by bs columns, which Pallas
output blocks cannot express, so cells write one of two parity-split
accumulators (even s / odd s), each a disjoint tiling by [TB, 2*bs]
blocks; the caller adds the odd accumulator shifted by bs. Cells are
ordered by s so each output block's visits are consecutive (the Pallas
revisit rule), with first-visit zeroing flags prefetched per cell.

Exactly equal to plane_cand by construction (integer counts, same
pairs enumerated); tested against it in interpret mode on CPU and
compiled on TPU (tests/test_pallas_cand.py). Opt-in via
PANDASEQ_TPU_PALLAS=1 (="interpret" to force interpret mode, used by
the CPU test suite) on the packed4 sparse path.

STATUS — experimental, off by default: measured by back-to-back
K-slope on v5e at B=8192, L=O=256 this kernel runs ~4.8 ms vs 1.8 ms
for the dense XLA dot and 0.49 ms for the triangular-blocked XLA
split (fused2._plane_cand_tri, the production path). The per-cell
[TB, bs, bs] -> [TB, bs*bs] reshape and the VPU equality broadcast
dominate; Mosaic also rejects bs < 128 input blocks and 2-dim
contractions (hence the flattened [bs*bs, 2*bs] T3). Kept as the
scaffold for a future hand-scheduled variant and as executable
documentation of the blocked-triangular decomposition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cell_tables(NB: int):
    """Static per-cell tables, cells ordered by s = jb+ib then jb:
    (jb, ib, pe, po, first_e, first_o) int32 arrays + accumulator
    block counts (n_pe, n_po)."""
    cells = [(jb, s - jb) for s in range(NB) for jb in range(s + 1)
             if s - jb < NB]
    jb = np.array([c[0] for c in cells], np.int32)
    ib = np.array([c[1] for c in cells], np.int32)
    s = jb + ib
    # even accumulator: block index advances at each odd->even or
    # even->odd s step so that revisits stay consecutive; an even cell
    # with s adds into block s//2 at column offset s*bs - (s//2)*2*bs
    # = 0, an odd cell leaves block (s+1)//2 untouched (opened+zeroed
    # only).
    pe = np.where(s % 2 == 0, s // 2, (s + 1) // 2).astype(np.int32)
    po = (s // 2).astype(np.int32)
    first = lambda p: np.concatenate(
        [[1], (p[1:] != p[:-1]).astype(np.int32)]).astype(np.int32)
    return (jb, ib, pe, po, first(pe), first(po),
            int(pe.max()) + 1, int(po.max()) + 1)


def _kernel(jb_r, ib_r, pe_r, po_r, fe_r, fo_r, f_ref, r_ref, t3_ref,
            oe_ref, oo_ref):
    g = pl.program_id(1)
    # zero an accumulator block on its first visit (it may be opened
    # by a cell of the other parity and flushed without any add)
    @pl.when(fe_r[g] == 1)
    def _():
        oe_ref[...] = jnp.zeros_like(oe_ref)

    @pl.when(fo_r[g] == 1)
    def _():
        oo_ref[...] = jnp.zeros_like(oo_ref)

    kq = (f_ref[...][:, :, None] == r_ref[...][:, None, :]).astype(
        jnp.int8)  # [TB, bs, bs]
    TB, bs, _ = kq.shape
    # Mosaic's matmul needs a single 2D contraction: collapse (j, i)
    # into one axis against the pre-flattened [bs*bs, 2*bs] diagonal
    # indicator.
    part = jax.lax.dot_general(
        kq.reshape(TB, bs * bs), t3_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # [TB, 2*bs]

    even = (jb_r[g] + ib_r[g]) % 2 == 0

    @pl.when(even)
    def _():
        oe_ref[...] += part

    @pl.when(jnp.logical_not(even))
    def _():
        oo_ref[...] += part


@functools.partial(jax.jit,
                   static_argnames=("O", "bs", "TB", "interpret"))
def plane_cand_pallas(Fkm, Rkm, O: int, *, bs: int = 128,
                      TB: int = 128, interpret: bool = False):
    """Blocked-triangular Pallas twin of fused2.plane_cand (j0=0,
    Oj=O). [B, L] int32 k-mer frames -> [B, O] int32 candidate
    counts."""
    B, L = Fkm.shape
    # Mosaic requires input block minor dims to be multiples of 128
    assert O % bs == 0 and O <= L and bs % 128 == 0
    if B % TB:
        TB = int(np.gcd(B, TB))
    NB = O // bs
    jb, ib, pe, po, fe, fo, n_pe, n_po = _cell_tables(NB)
    ncells = len(jb)
    t3 = np.arange(bs)[:, None, None] + np.arange(bs)[None, :, None]
    t3 = (t3 == np.arange(2 * bs)[None, None, :]).astype(np.int8)
    t3 = t3.reshape(bs * bs, 2 * bs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(B // TB, ncells),
        in_specs=[
            pl.BlockSpec((TB, bs),
                         lambda b, g, jb, ib, *_: (b, jb[g]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, bs),
                         lambda b, g, jb, ib, *_: (b, ib[g]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs * bs, 2 * bs),
                         lambda b, g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, 2 * bs),
                         lambda b, g, jb, ib, pe, *_: (b, pe[g]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 2 * bs),
                         lambda b, g, jb, ib, pe, po, *_: (b, po[g]),
                         memory_space=pltpu.VMEM),
        ],
    )
    oe, oo = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pe * 2 * bs), jnp.int32),
            jax.ShapeDtypeStruct((B, n_po * 2 * bs), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * bs * bs * 2 * bs * ncells,
            bytes_accessed=(2 * B * bs * 4 * ncells
                            + B * (n_pe + n_po) * 2 * bs * 4),
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(jb), jnp.asarray(ib), jnp.asarray(pe),
      jnp.asarray(po), jnp.asarray(fe), jnp.asarray(fo),
      Fkm[:, :O], Rkm[:, :O], jnp.asarray(t3))
    # odd-s windows start bs columns later: candc[t] = oe[t] + oo[t-bs]
    oo_sh = jnp.pad(oo, ((0, 0), (bs, 0)))[:, :O]
    return oe[:, :O] + oo_sh
