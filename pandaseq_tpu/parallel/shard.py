"""Multi-chip execution: device meshes, sharded assembly steps, collective
STAT counters.

The reference's only parallelism is single-node pthread data-parallelism
over read pairs (pool.c:110, mux.c:132) — read pairs are independent, so
the TPU-native design is a 1-D (or 2-D) SPMD program:

  * ``dp`` axis: the batch of read pairs is sharded across chips, the
    direct analogue of PandaMux handing each worker thread its own pairs.
  * ``op`` axis (optional): the overlap-offset axis of the dense scorer is
    sharded too — the reference has no analogue (its candidate loop is
    sequential per pair); this is the "sequence parallel" dimension of
    this workload (SURVEY.md §5, long-context note).

STAT counters (pool.c:83-104) become device arrays reduced with
``jax.lax.psum`` over the mesh instead of per-thread tallies printed
separately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import align as dev_align


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              op: int = 1) -> Mesh:
    """Build a (dp, op) mesh over the first ``n_devices`` devices.

    dp shards the read-pair batch; op shards the overlap-offset axis of
    the dense scorer. Default: all devices on the dp axis.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if dp is None:
        dp = n_devices // op
    assert dp * op == n_devices, (dp, op, n_devices)
    return Mesh(np.asarray(devs[:n_devices]).reshape(dp, op), ("dp", "op"))


def _local_step(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, *, L, minoverlap):
    """Per-shard body: dense scoring over this shard's offset slice,
    cross-``op`` winner selection, then reconstruction (replicated over
    op — it is O(L), negligible next to the O(L^2) scoring)."""
    flen = flen.astype(jnp.int32)
    rlen = rlen.astype(jnp.int32)
    op_idx = jax.lax.axis_index("op")
    n_op = jax.lax.axis_size("op")
    O_local = L // n_op

    _, _, F_nt, F_q, R_nt, R_q = dev_align._aligned_frames(
        fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, L)

    # this shard scores overlaps o in [op_idx*O_local+1 .. +O_local]
    o_base = op_idx * O_local
    o_vals = o_base + jnp.arange(1, O_local + 1, dtype=jnp.int32)
    i_vals = jnp.arange(L, dtype=jnp.int32)
    idx = i_vals[None, :] + (L - o_vals[:, None])
    ivalid = i_vals[None, None, :] < o_vals[None, :, None]
    FS_nt = jnp.take(F_nt, jnp.clip(idx, 0, L - 1), axis=1)
    valid = (ivalid
             & (i_vals[None, None, :]
                >= o_vals[None, :, None] - flen[:, None, None])
             & (i_vals[None, None, :] < rlen[:, None, None]))
    Rb_nt = R_nt[:, None, :]
    n_mask = (FS_nt == 0x0F) | (Rb_nt == 0x0F)
    raw_match = (FS_nt & Rb_nt) != 0
    unk = jnp.sum(valid & n_mask, axis=2, dtype=jnp.int32)
    m = jnp.sum(valid & ~n_mask & raw_match, axis=2, dtype=jnp.int32)
    mm = jnp.sum(valid & ~n_mask & ~raw_match, axis=2, dtype=jnp.int32)

    from .. import tables
    import math
    nn = float(tables.QUAL_NN_SIMPLE_BAYESIAN)
    q = 0.36
    pmatch = math.log(0.25 * (1.0 - q) ** 2)
    pmismatch = math.log((3.0 * q - 2.0 * q * q) / 18.0)
    o2 = o_vals[None, :]
    tail = (o2 < flen[:, None]) | (o2 < rlen[:, None])
    nn_count = jnp.where(tail, flen[:, None] + rlen[:, None] - 2 * o2 + unk,
                         unk)
    scores = (jnp.float32(nn) * nn_count.astype(jnp.float32)
              + m.astype(jnp.float32) * jnp.float32(pmatch)
              + mm.astype(jnp.float32) * jnp.float32(pmismatch))

    minov = minoverlap
    maxo = jnp.minimum(flen + rlen - minov - 1, jnp.minimum(flen, rlen))
    in_range = (o2 >= minov) & (o2 <= maxo[:, None])
    scores = jnp.where(in_range, scores, -jnp.inf)

    # cross-op winner: psum-max on score, then first-offset tie-break via
    # min offset among shards achieving the max (the reference's strict >
    # keeps the first/smallest winning overlap, assembler.c:131-134)
    local_best = jnp.max(scores, axis=1)
    local_arg = o_base + 1 + jnp.argmax(scores, axis=1).astype(jnp.int32)
    gbest = jax.lax.pmax(local_best, "op")
    cand_o = jnp.where(local_best >= gbest, local_arg, jnp.int32(L + 1))
    besto = jax.lax.pmin(cand_o, "op")

    floor = jnp.float32(nn) * (flen + rlen).astype(jnp.float32)
    badread = (flen < 2) | (rlen < 2) | (jnp.minimum(flen, rlen) < minov)
    aligned = (gbest > floor) & ~badread

    zeros = jnp.zeros_like(flen)
    rec = dev_align._reconstruct_core(
        fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, zeros, zeros, besto, L)
    case = rec["case"].astype(jnp.int32)
    fq = jnp.clip(rec["fq"].astype(jnp.int32), 0, 46)
    rq = jnp.clip(rec["rq"].astype(jnp.int32), 0, 46)
    qs = jnp.asarray(tables.QUAL_SCORE, dtype=jnp.float32)
    mt = jnp.asarray(tables.QUAL_MATCH_SIMPLE_BAYESIAN,
                     dtype=jnp.float32).reshape(-1)
    mmt = jnp.asarray(tables.QUAL_MISMATCH_SIMPLE_BAYESIAN,
                      dtype=jnp.float32).reshape(-1)
    mp = jnp.where(case == 3, jnp.take(mt, fq * 47 + rq),
                   jnp.take(mmt, fq * 47 + rq))
    p = jnp.zeros_like(mp)
    p = jnp.where((case == 1) | (case == 7), jnp.take(qs, fq), p)
    p = jnp.where((case == 2) | (case == 6), jnp.take(qs, rq), p)
    p = jnp.where((case == 3) | (case == 4), mp, p)
    p = jnp.where(case == 5, jnp.float32(nn), p)
    seq_len = rec["seq_len"]
    quality = jnp.sum(jnp.where(case != 0, p, 0.0), axis=1) \
        / (seq_len + 1).astype(jnp.float32)
    threshold = jnp.float32(math.log(0.6))
    length_ok = (seq_len + 1 > 0) & (seq_len + 1 <= 2 * 450)
    ok = aligned & length_ok & (quality >= threshold)
    lowq = aligned & length_ok & (quality < threshold)

    # global STAT counters: psum over BOTH mesh axes ('op' members hold
    # identical per-pair verdicts, so divide its axis size back out)
    n_op_f = jnp.int32(n_op)
    counters = jnp.stack([
        jnp.int32(flen.shape[0]),
        jnp.sum(ok, dtype=jnp.int32),
        jnp.sum(lowq, dtype=jnp.int32),
        jnp.sum(badread, dtype=jnp.int32),
        jnp.sum((~aligned & ~badread) | (aligned & ~length_ok),
                dtype=jnp.int32),
    ])
    counters = jax.lax.psum(counters, "dp")
    counters = jax.lax.psum(counters, "op") // n_op_f
    return dict(nt=rec["nt"], p=p, seq_len=seq_len, quality=quality,
                overlap=besto, ok=ok, counters=counters)


def make_sharded_step(mesh: Mesh, L: int, minoverlap: int = 2):
    """Jit the full assembly step over ``mesh``: batch sharded over dp,
    overlap-offset scoring sharded over op, counters psum-reduced.

    Returns ``step(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen) -> dict``;
    inputs are [B, L] / [B] arrays with B divisible by mesh dp size.
    """
    body = functools.partial(_local_step, L=L, minoverlap=minoverlap)
    batch_spec = P("dp")
    step = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(batch_spec,) * 6,
            out_specs=dict(nt=batch_spec, p=batch_spec, seq_len=batch_spec,
                           quality=batch_spec, overlap=batch_spec,
                           ok=batch_spec, counters=P()),
            check_vma=False))
    return step


def shard_fused_batch(mesh: Mesh, asm, batch):
    """Run the PRODUCTION fused step with the read-pair batch sharded
    over the mesh's dp axis — XLA partitions the whole graph (every op
    is batch-parallel) and each chip scores its shard; the host
    finalization then proceeds exactly as single-chip.

    `asm` is a BatchAssembler; `batch` an assembler.Batch whose B is
    divisible by the dp size. Returns (st, dev) ready for
    asm._finalize.
    """
    spec = NamedSharding(mesh, P("dp"))
    st = asm._pre(batch)
    b = st["batch"]
    for name in ("fwd_nt", "fwd_q", "rev_nt", "rev_q", "flen", "rlen"):
        setattr(b, name, jax.device_put(getattr(b, name), spec))
    dev = asm._dispatch(st)
    return st, dev


def shard_batch(mesh: Mesh, arrays):
    """Place host numpy arrays on the mesh with batch-dim sharding."""
    out = []
    for a in arrays:
        spec = P("dp") if a.ndim >= 1 else P()
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)
