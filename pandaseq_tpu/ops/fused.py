"""Single-dispatch fused assembly step with packed outputs.

Motivation (measured on the axon TPU tunnel): each device dispatch costs
~25 ms and device->host runs at ~165 MB/s, so the production pipeline
makes ONE jit call per batch and ships three compact arrays back:

  packed_counts [B, L] int32:  m | mm << 10 | cand << 21   (m, mm <= 512;
      unknowns = valid - m - mm with valid computable from flen/rlen)
  pidx [B, 2L] int16:  case * 2209 + fq * 47 + rq  (case 0..7 needs only
      a per-algorithm f64 table lookup on host to recover the exact
      per-base log-probability)
  ascii [B, 2L] uint8: merged bases already ascii-encoded on device

plus [B] scalars (seq_len, degenerates, overlap_mismatches, besto32,
scores32 for pruning).

Selection runs in f32 ON DEVICE; the host recomputes the winner in exact
f64 from the integer counts and falls back to the numpy oracle for the
rare pairs where f32 and f64 disagree — output stays bit-identical to
the C reference while the O(L^2) work stays on the TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from . import align as A

# device-side ascii LUT (pandaseq-nt.h: "NACMGRSVTWYHKDBN")
_NT_ASCII = np.frombuffer(b"NACMGRSVTWYHKDBN", dtype=np.uint8).copy()

# bilinear count tables over 4-bit IUPAC codes: the reference's per-base
# classification (algo_simple_bayes.c:52-58) as 16x16 0/1 matrices, which
# turns counting over every overlap offset into a per-sample correlation
# — an MXU conv — instead of an O(L^2) gather.
_M_MATCH = np.zeros((16, 16), dtype=np.int8)
_M_UNK = np.zeros((16, 16), dtype=np.int8)
for _a in range(1, 16):
    for _b in range(1, 16):
        if _a == 15 or _b == 15:
            _M_UNK[_a, _b] = 1
        elif _a & _b:
            _M_MATCH[_a, _b] = 1


def _skew_diag_reduce(X, O, op="sum"):
    """Reduce X[b, j, i] over the diagonals j+i via the classic
    pad-and-reshape skew: padding rows of an [O, O] plane to width 2O
    makes the flattened row-major layout place (j, i) at column j+i of
    an [O, 2O-1] view, so diagonal reductions become column
    reductions."""
    B = X.shape[0]
    W2 = 2 * O - 1
    Xp = jnp.pad(X, ((0, 0), (0, 0), (0, O)))
    flat = Xp.reshape(B, O * 2 * O)[:, :O * W2]
    S = flat.reshape(B, O, W2)
    if op == "sum":
        return jnp.sum(S, axis=1, dtype=jnp.int32)[:, :O]
    if op == "fsum":
        return jnp.sum(S, axis=1, dtype=jnp.float32)[:, :O]
    return jnp.max(S, axis=1)[:, :O]


def _xbar():
    """Experimental extra-barrier points (comma list in
    PANDASEQ_TPU_XBAR): fusion-pathology probes, not a user knob."""
    import os as _os
    return _os.environ.get("PANDASEQ_TPU_XBAR", "").split(",")


_DIAG_T = {}


def _diag_matrix(O: int) -> np.ndarray:
    """T[(j*O + i), d] = 1 iff j + i == d (d < O): turns diagonal
    reduction of a flattened [O, O] plane into ONE int8 MXU matmul."""
    T = _DIAG_T.get(O)
    if T is None:
        j = np.arange(O)[:, None, None]
        i = np.arange(O)[None, :, None]
        d = np.arange(O)[None, None, :]
        T = ((j + i) == d).astype(np.int8).reshape(O * O, O)
        _DIAG_T[O] = T
    return T


def _counts_mm(F_nt, R_nt, F_km, R_km, flen, rlen, L, O):
    """matches/unknowns/k-mer candidates via int8 matmul diagonal
    reduction — exact integer accumulation on the MXU, no relayout."""
    B = F_nt.shape[0]
    Fr = jnp.flip(F_nt, axis=1)[:, :O]  # o = j' + i + 1
    f = Fr[:, :, None]
    r = R_nt[:, None, :O]
    f_pad = f == 0
    r_pad = r == 0
    n_mask = ((f == 0x0F) | (r == 0x0F)) & ~f_pad & ~r_pad
    match = ((f & r) != 0) & ~n_mask
    kq = jnp.flip(F_km, axis=1)[:, :O, None] == R_km[:, None, :O]
    # batch-axis concat (no minor-dim relayout) + 2-dim contraction
    planes = jnp.concatenate(
        [match.astype(jnp.int8), n_mask.astype(jnp.int8),
         kq.astype(jnp.int8)], axis=0)  # [3B, O, O]
    if "planes" in _xbar():
        planes = jax.lax.optimization_barrier(planes)
    T3 = jnp.asarray(_diag_matrix(O).reshape(O, O, O))
    sums = jax.lax.dot_general(
        planes, T3, (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.int32)  # [3B, O]
    return sums[:B], sums[B:2 * B], sums[2 * B:] != 0


def _counts_skew(F_nt, R_nt, F_km, R_km, flen, rlen, L, O):
    """matches/unknowns/k-mer candidates for every overlap via
    broadcast-compare + diagonal reduction (no gather, no loop).

    With the forward frame right-aligned and the reverse frame flipped,
    overlap o pairs F[j] with R[i] exactly when L - j + i == o; with
    j' = L-1-j that is the constant-(j'+i) diagonal o = j'+i+1, and only
    j' < O can contribute, so the compare plane is [B, O, O]. Pad codes
    (0) belong to neither class, so the overlap-band masks are implied.
    """
    Fr = jnp.flip(F_nt, axis=1)[:, :O]  # row j' = L-1-j; o = j'+i+1
    f = Fr[:, :, None]
    r = R_nt[:, None, :O]
    f_pad = f == 0
    r_pad = r == 0
    n_mask = ((f == 0x0F) | (r == 0x0F)) & ~f_pad & ~r_pad
    match = ((f & r) != 0) & ~n_mask
    kq = (jnp.flip(F_km, axis=1)[:, :O, None] == R_km[:, None, :O])
    # one fused int32 plane: m | unk<<10 | kmer-hit-count<<20 (all
    # diagonal sums <= 450, so the fields cannot carry) — a single
    # pad/reshape/reduce pass instead of three
    contrib = (match.astype(jnp.int32)
               + (n_mask.astype(jnp.int32) << 10)
               + (kq.astype(jnp.int32) << 20))  # [B, O, O]
    sums = _skew_diag_reduce(contrib, O)
    m = sums & 0x3FF
    unk = (sums >> 10) & 0x3FF
    cand = (sums >> 20) != 0
    return m, unk, cand


def _counts_conv(F_nt, R_nt, flen, rlen, L, O):
    """matches/unknowns for every overlap o in 1..O via two per-sample
    int8 convolutions (jax.lax.conv batch_group_count=B).

    matches(o) = sum_i M[F[L-o+i], R[i]] is a correlation at lag L-o;
    with G[j, c] = M[F[j], c] it becomes sum_t G[(L-O)+k'+t, c] *
    onehot(R[t])[c] — one VALID conv of width O over a (2O-1)-window of
    G, k' = O-o. Pad codes (0) hit all-zero table rows/columns, so no
    masking is needed; mismatches = valid - matches - unknowns on host.
    """
    B = F_nt.shape[0]
    onehot_R = (R_nt[:, :O, None]
                == jnp.arange(16, dtype=jnp.int32)[None, None, :]
                ).astype(jnp.int8)  # [B, O, 16]
    out = []
    for table in (_M_MATCH, _M_UNK):
        G = jnp.take(jnp.asarray(table), F_nt, axis=0)  # [B, L, 16] i8
        GP = jnp.pad(G, ((0, 0), (0, O - 1), (0, 0)))[:, L - O:, :]
        lhs = GP.transpose(0, 2, 1)  # [B, 16, 2O-1]
        rhs = onehot_R.transpose(0, 2, 1)  # [B(feat), 16, O]
        conv = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
            batch_group_count=B,
            preferred_element_type=jnp.int32)  # [1, B, O]
        out.append(jnp.flip(conv[0], axis=1))  # index o-1 = flip of k'
    return out[0], out[1]


@functools.partial(
    jax.jit,
    static_argnames=("L", "O", "L2", "minoverlap", "maxoverlap",
                     "num_kmers", "algo_kind", "threshold", "pmatch",
                     "pmismatch", "nn", "nn_term"))
def assemble_fused(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, fo, ro, *,
                   L: int, O: int | None = None, L2: int | None = None,
                   minoverlap: int = 2, maxoverlap: int = 0,
                   num_kmers: int = 2, algo_kind: str = "counts",
                   threshold: float = math.log(0.6),
                   pmatch: float = 0.0, pmismatch: float = 0.0,
                   nn: float = float(tables.QUAL_NN_SIMPLE_BAYESIAN),
                   nn_term: float = 0.0,
                   lut_match=None, lut_mismatch=None):
    """One dispatch: counts + k-mer candidates + f32 selection +
    reconstruction, packed for the tunnel.

    fo/ro are per-pair primer offsets (host-computed; zeros otherwise).
    For algo_kind "counts" the f32 score is nn*nncount + m*pmatch +
    mm*pmismatch (the shared shape of simple_bayesian/uparse; ea_util,
    flash and stitch are selected on host from the exact counts instead,
    and besto32 here is only a warm guess for them). For "pear"/"rdp_mle"
    the f32 LUT sum drives selection and is also returned for host-side
    shortlist pruning.
    """
    B = fwd_nt.shape[0]
    if O is None:
        O = L  # overlap axis: only o <= min(flen, rlen) <= O matter
    if L2 is None:
        L2 = 2 * L  # merged-sequence axis: seq_len+1 <= flen+rlen
    flen = flen.astype(jnp.int32)
    rlen = rlen.astype(jnp.int32)
    fo = fo.astype(jnp.int32)
    ro = ro.astype(jnp.int32)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]

    nt16_f = fwd_nt.astype(jnp.int32) & 0x0F
    nt16_r = rev_nt.astype(jnp.int32) & 0x0F

    # ---- k-mer seeding (exact table semantics; see align.py) ----
    cf = jnp.asarray(A._KCODE)[nt16_f]
    cr = jnp.asarray(A._KCODE)[nt16_r]
    kf = A._kmer_values_fwd(cf)
    kr = A._kmer_values_rev(cr)
    nonn_f = nt16_f != 0x0F
    nonn_r = nt16_r != 0x0F
    emit_f = A._window9_nonn(nonn_f, L) & (pos >= A.KMER_LEN) \
        & (pos < flen[:, None])
    w9r = A._window9_nonn(jnp.flip(nonn_r, axis=1), L)
    emit_r = jnp.flip(w9r, axis=1) & (pos + A.KMER_LEN < rlen[:, None])
    if num_kmers == 0:
        # -k 0: empty kmerseen table -> nothing is ever stored, every
        # probe misses, ALL_BITS_IF_NONE examines every overlap
        stored_f = jnp.zeros_like(emit_f)
    else:
        rank = jax.lax.optimization_barrier(
            A._occurrence_rank_plane(kf, emit_f, L))
        stored_f = emit_f & (rank < num_kmers)

    # ---- aligned frames (row-wise dynamic gathers are the expensive op
    # on TPU, so each frame packs several fields into one int32 plane:
    # fwd = nt | q<<4 | (kmer+1)<<10 [17b]; rev = nt | q<<4 | fpq<<10
    # plus a separate (kmer+2) plane). Sentinels shift to 0 so the pad
    # fill stays 0. ----
    fq32 = fwd_q.astype(jnp.int32)
    fwd_packed = (nt16_f | (fq32 << 4)
                  | ((jnp.where(stored_f, kf, -1) + 1) << 10))
    FP = A._right_align(fwd_packed, flen, L)
    F_nt = FP & 0x0F
    F_q = (FP >> 4) & 0x3F
    F_km = ((FP >> 10) & 0x1FFFF) - 1
    rev_packed = (nt16_r | (rev_q.astype(jnp.int32) << 4) | (fq32 << 10))
    RP = A._flip(rev_packed, rlen, L)
    R_nt = RP & 0x0F
    R_q = (RP >> 4) & 0x3F
    FP_q = (RP >> 10) & 0x3F  # pear quirk: fwd quals at the rev index map
    R_km = A._flip(jnp.where(emit_r, kr, -2) + 2, rlen, L) - 2

    # materialize the frames before the [B, O, O] planes consume them:
    # otherwise XLA fuses the take_along_axis gathers INTO the plane
    # producers and recomputes them O times per element (~6x slowdown)
    (F_nt, F_q, F_km, R_nt, R_q, R_km, FP_q) = \
        jax.lax.optimization_barrier(
            (F_nt, F_q, F_km, R_nt, R_q, R_km, FP_q))

    # ---- all-overlap comparison (both axes bounded by O: overlap-local
    # position i < o <= O) ----
    o_vals = jnp.arange(1, O + 1, dtype=jnp.int32)
    i_vals = jnp.arange(O, dtype=jnp.int32)
    idx = i_vals[None, :] + (L - o_vals[:, None])  # [O, O] into [L]
    gather = lambda x: jnp.take(x, jnp.clip(idx, 0, L - 1), axis=1)
    ivalid = i_vals[None, None, :] < o_vals[None, :, None]

    import os as _os
    o2d = o_vals[None, :]
    nvalid = jnp.maximum(
        0, jnp.minimum(o2d, rlen[:, None])
        - jnp.maximum(0, o2d - flen[:, None]))  # [B, O]
    default_impl = "mm" if jax.default_backend() == "tpu" else "gather"
    counts_impl = _os.environ.get("PANDASEQ_TPU_COUNTS", default_impl)
    cand = None
    lutsum = None
    if algo_kind in ("pear", "rdp_mle") and counts_impl in ("skew", "mm"):
        # LUT sums over every overlap as diagonal reductions of an
        # elementwise contribution plane (same frame as the counts);
        # f32 sums are pruning-only, so reduction order is free
        counts_fn = _counts_mm if counts_impl == "mm" else _counts_skew
        m, unk, cand = counts_fn(F_nt, R_nt, F_km, R_km, flen, rlen,
                                 L, O)
        mm = nvalid - m - unk
        f = jnp.flip(F_nt, axis=1)[:, :O, None]
        r = R_nt[:, None, :O]
        # LUT planes via one-hot matmuls on the MXU (a [B,O,O] gather
        # from the 47x47 tables is pathologically slow on TPU):
        #   mv[b,j,i] = Tm[qf_j, q2_i] = (onehot(qf) @ Tm) @ onehot(q2)^T
        qf = jnp.flip(F_q, axis=1)[:, :O]
        q2v = (FP_q if algo_kind == "pear" else R_q)[:, :O]
        OHf = jax.nn.one_hot(qf, 47, dtype=jnp.float32)  # [B, O, 47]
        OH2 = jax.nn.one_hot(q2v, 47, dtype=jnp.float32)
        Tm = jnp.asarray(lut_match, dtype=jnp.float32)
        Tmm = jnp.asarray(lut_mismatch, dtype=jnp.float32)
        mv = jnp.einsum("bjc,cd,bid->bji", OHf, Tm, OH2,
                        preferred_element_type=jnp.float32)
        mmv = jnp.einsum("bjc,cd,bid->bji", OHf, Tmm, OH2,
                         preferred_element_type=jnp.float32)
        pad = (f == 0) | (r == 0)
        if algo_kind == "pear":
            n_mask = (f == 0x0F) | (r == 0x0F)
            contrib = jnp.where(n_mask, jnp.float32(nn_term),
                                jnp.where((f & r) != 0, mv, mmv))
        else:
            contrib = jnp.where((f & r) != 0, mv, mmv)
        contrib = jnp.where(pad, jnp.float32(0), contrib)
        lutsum = _skew_diag_reduce(contrib, O, op="fsum")
    elif algo_kind in ("pear", "rdp_mle"):
        # LUT scoring needs per-position quality pairing: keep the
        # shifted-gather frame for these two algorithms
        FS_nt = gather(F_nt)
        valid = (ivalid
                 & (i_vals[None, None, :]
                    >= o_vals[None, :, None] - flen[:, None, None])
                 & (i_vals[None, None, :] < rlen[:, None, None]))
        Rb_nt = R_nt[:, None, :O]
        n_mask = (FS_nt == 0x0F) | (Rb_nt == 0x0F)
        raw_match = (FS_nt & Rb_nt) != 0
        unk = jnp.sum(valid & n_mask, axis=2, dtype=jnp.int32)
        m = jnp.sum(valid & ~n_mask & raw_match, axis=2, dtype=jnp.int32)
        mm = jnp.sum(valid & ~n_mask & ~raw_match, axis=2,
                     dtype=jnp.int32)
    elif counts_impl == "mm":
        m, unk, cand = _counts_mm(F_nt, R_nt, F_km, R_km, flen, rlen,
                                  L, O)
        mm = nvalid - m - unk
    elif counts_impl == "skew":
        m, unk, cand = _counts_skew(F_nt, R_nt, F_km, R_km, flen, rlen,
                                    L, O)
        mm = nvalid - m - unk
    elif counts_impl == "pallas":
        from . import pallas_score
        packed_k = pallas_score.count_all_overlaps(
            F_nt, R_nt[:, :O], F_km, R_km[:, :O], flen, rlen, L=L, O=O)
        m = packed_k & 0x3FF
        unk = (packed_k >> 10) & 0x3FF
        cand = (packed_k >> 20) != 0
        mm = nvalid - m - unk
    elif counts_impl == "conv":
        # MXU path via per-sample grouped conv: numerically exact but the
        # grouped lowering is slow on the current toolchain — kept for
        # future toolchains behind PANDASEQ_TPU_COUNTS=conv
        m, unk = _counts_conv(F_nt, R_nt, flen, rlen, L, O)
        mm = nvalid - m - unk
    else:
        FS_nt = gather(F_nt)
        valid = (ivalid
                 & (i_vals[None, None, :]
                    >= o_vals[None, :, None] - flen[:, None, None])
                 & (i_vals[None, None, :] < rlen[:, None, None]))
        Rb_nt = R_nt[:, None, :O]
        n_mask = (FS_nt == 0x0F) | (Rb_nt == 0x0F)
        raw_match = (FS_nt & Rb_nt) != 0
        unk = jnp.sum(valid & n_mask, axis=2, dtype=jnp.int32)
        m = jnp.sum(valid & ~n_mask & raw_match, axis=2, dtype=jnp.int32)
        mm = jnp.sum(valid & ~n_mask & ~raw_match, axis=2,
                     dtype=jnp.int32)

    if cand is None:
        FS_km = gather(F_km)
        cand = jnp.any((FS_km == R_km[:, None, :O]) & ivalid, axis=2)
    if "counts" in _xbar():
        m, mm, unk, cand = jax.lax.optimization_barrier(
            (m, mm, unk, cand))
    packed_counts = (m | (mm << 10) | (cand.astype(jnp.int32) << 21))

    # ---- candidate range + f32 scores ----
    o2 = o_vals[None, :]
    maxo = flen + rlen - minoverlap - fo - ro - 1
    if maxoverlap == 0:
        maxo = jnp.minimum(maxo, jnp.minimum(flen, rlen))
    else:
        maxo = jnp.minimum(maxo, maxoverlap)
    in_range = (o2 >= minoverlap) & (o2 <= maxo[:, None])
    cand_in = cand & in_range
    none_found = ~jnp.any(cand_in, axis=1)
    cand_in = jnp.where(none_found[:, None], in_range, cand_in)

    if algo_kind in ("pear", "rdp_mle"):
        if lutsum is None:  # gather fallback (non-skew impls)
            FS_q = gather(F_q)
            m_flat = jnp.asarray(lut_match, dtype=jnp.float32).reshape(-1)
            mm_flat = jnp.asarray(lut_mismatch,
                                  dtype=jnp.float32).reshape(-1)
            q2 = FP_q[:, None, :O] if algo_kind == "pear" \
                else R_q[:, None, :O]
            lut_idx = FS_q * 47 + q2
            mv = jnp.take(m_flat, lut_idx)
            mmv = jnp.take(mm_flat, lut_idx)
            if algo_kind == "pear":
                contrib = jnp.where(n_mask, jnp.float32(nn_term),
                                    jnp.where(raw_match, mv, mmv))
            else:
                contrib = jnp.where(raw_match, mv, mmv)
            lutsum = jnp.sum(jnp.where(valid, contrib, 0.0), axis=2,
                             dtype=jnp.float32)
        scores = lutsum
    elif algo_kind in ("ea_util", "flash", "stitch"):
        mmf = mm.astype(jnp.float32)
        unkf = unk.astype(jnp.float32)
        nvf = jnp.maximum(nvalid, 1).astype(jnp.float32)
        if algo_kind == "ea_util":
            bad = mmf + unkf  # algo_ea_util.c:49-55
            scores = jnp.log((bad * bad + 1.0) / nvf)
        elif algo_kind == "flash":
            # integer ratio quirk (algo_flash.c:59): log(bad / valid) with
            # C size_t division
            bad = mm + unk
            ratio = bad // jnp.maximum(nvalid, 1)
            scores = jnp.where(
                nvalid == 0, jnp.float32(-2.0),
                jnp.where(ratio > 0, jnp.log(ratio.astype(jnp.float32)),
                          -jnp.inf))
        else:  # stitch: uint64 wrap quirk (algo_stitch.c:40-56)
            diff = m - mm
            pos_s = jnp.log(jnp.maximum(diff.astype(jnp.float32), 1e-30)
                            / (flen + rlen)[:, None].astype(jnp.float32))
            # wrapped (negative) scores all round to log(2^64/len) in f64
            # — equal, so C's strict > keeps the FIRST such offset; a
            # single constant reproduces that tie-break under argmax
            scores = jnp.where(diff > 0, pos_s,
                               jnp.where(diff < 0, jnp.float32(60.0),
                                         -jnp.inf))
        lutsum = None
    else:
        tail = (o2 < flen[:, None]) | (o2 < rlen[:, None])
        nn_count = jnp.where(tail,
                             flen[:, None] + rlen[:, None] - 2 * o2 + unk,
                             unk)
        scores = (jnp.float32(nn) * nn_count.astype(jnp.float32)
                  + m.astype(jnp.float32) * jnp.float32(pmatch)
                  + mm.astype(jnp.float32) * jnp.float32(pmismatch))
        lutsum = None

    scores = jnp.where(cand_in, scores, -jnp.inf)
    besto32 = jnp.argmax(scores, axis=1).astype(jnp.int32) + 1
    besto32, packed_counts = jax.lax.optimization_barrier(
        (besto32, packed_counts))

    # ---- reconstruction at the f32 winner ----
    rec = A._reconstruct_core(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen,
                              fo, ro, besto32, L, L2=L2)
    case = rec["case"].astype(jnp.int32)
    fq = jnp.clip(rec["fq"].astype(jnp.int32), 0, 46)
    rq = jnp.clip(rec["rq"].astype(jnp.int32), 0, 46)
    pidx = case * 2209 + fq * 47 + rq
    ascii_nt = jnp.asarray(_NT_ASCII)[rec["nt"].astype(jnp.int32) & 0x0F]

    # ONE output array: the tunnel charges ~60 ms latency per
    # device->host transfer, so counts, sequence codes, scalars (and the
    # f32 lutsum, bitcast) are concatenated into a single int32 plane
    seq = (pidx | (ascii_nt.astype(jnp.int32) << 16))  # [B, L2] i32
    scalars = jnp.stack([
        rec["seq_len"].astype(jnp.int32),
        rec["degenerates"].astype(jnp.int32),
        rec["overlap_mismatches"].astype(jnp.int32),
        besto32,
    ], axis=1)  # [B, 4]
    parts = [packed_counts, seq, scalars]
    if lutsum is not None:
        # pear/rdp: host shortlisting needs the f32 sums; the count-based
        # algorithms recompute their f32 scores from the integer counts
        parts.append(jax.lax.bitcast_convert_type(
            jnp.where(jnp.isfinite(scores), scores, jnp.float32(-3e38)),
            jnp.int32))
    return jnp.concatenate(parts, axis=1)


def build_ptable(algo) -> np.ndarray:
    """Host-side f64 table PTBL[case*2209 + fq*47 + rq] of exact per-base
    log-probabilities for one algorithm (case codes from
    align._reconstruct_core)."""
    from ..assembler import _match_probability_vec

    fqg, rqg = np.meshgrid(np.arange(47), np.arange(47), indexing="ij")
    fqf = fqg.ravel()
    rqf = rqg.ravel()
    tbl = np.zeros(8 * 2209, dtype=np.float64)
    qs = tables.QUAL_SCORE
    nn = float(tables.QUAL_NN_SIMPLE_BAYESIAN)
    try:
        mp_match = _match_probability_vec(algo, np.ones(2209, bool),
                                          fqf, rqf)
        mp_mis = _match_probability_vec(algo, np.zeros(2209, bool),
                                        fqf, rqf)
    except ValueError:  # custom algorithm: scalar match_probability
        mp_match = np.array([algo.match_probability(True, a, b)
                             for a, b in zip(fqf, rqf)])
        mp_mis = np.array([algo.match_probability(False, a, b)
                           for a, b in zip(fqf, rqf)])
    for case in range(8):
        base = case * 2209
        if case == 1 or case == 7:
            tbl[base:base + 2209] = qs[fqf]
        elif case == 2 or case == 6:
            tbl[base:base + 2209] = qs[rqf]
        elif case == 3:
            tbl[base:base + 2209] = mp_match
        elif case == 4:
            tbl[base:base + 2209] = mp_mis
        elif case == 5:
            tbl[base:base + 2209] = nn
    return tbl
