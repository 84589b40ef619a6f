"""Device-side batched overlap alignment (JAX/XLA; Pallas variants in
pallas_score.py).

TPU-first design, NOT a translation of the reference's per-pair loops
(assembler.c:48-250): reads are decoded to padded [B, L] int8 tensors and
every overlap offset for every pair is scored in one shot.

The load-bearing layout trick: store the forward read RIGHT-ALIGNED in its
padded buffer and the reverse read FLIPPED (index i holds base rlen-1-i).
The reference pairs findex = flen+i-overlap with rindex = rlen-1-i
(algo_simple_bayes.c:46-47); right-aligned, findex becomes L+i-o —
independent of the per-pair read length — so scoring all overlaps for the
whole batch is a single uniform shifted comparison, and the k-mer candidate
seeding (assembler.c:91-118) reduces to the *same* shifted comparison on
per-position k-mer values (o = flen+rlen-1-pf-pr maps to a uniform
diagonal in the aligned frame).

Everything here is exact in the integer domain (match/mismatch/unknown
counts, candidate masks, k-mer emission gates); f64 decision-making from
these integers happens on host (host_finalize in assembler.py), which is
what makes the output bit-identical to the reference while the O(L^2) work
stays on the TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables

KMER_LEN = 8  # misc.h:33
NUM_KMERS_DEFAULT = 2  # pandaseq-assembler.h:51

# 2-bit k-mer packing: T=3, G=2, C=1, everything else 0 (misc.h:41)
_KCODE = np.zeros(16, dtype=np.int32)
_KCODE[8], _KCODE[4], _KCODE[2] = 3, 2, 1


def _right_align(x, flen, L, fill=0):
    """y[b, L - flen + t] = x[b, t]; left padding = fill."""
    idx = jnp.arange(L)[None, :] - (L - flen[:, None])
    v = jnp.take_along_axis(x, jnp.clip(idx, 0, L - 1), axis=1)
    return jnp.where(idx >= 0, v, fill)


def _flip(x, rlen, L, fill=0):
    """y[b, i] = x[b, rlen - 1 - i]; tail padding = fill."""
    idx = rlen[:, None] - 1 - jnp.arange(L)[None, :]
    v = jnp.take_along_axis(x, jnp.clip(idx, 0, L - 1), axis=1)
    return jnp.where(idx >= 0, v, fill)


def _kmer_values_fwd(codes):
    """kf[b, p] = packed k-mer of positions p-7..p, oldest base in the high
    bits (the FOREACH_KMER accumulation order, misc.h:41-42)."""
    L = codes.shape[1]
    kf = jnp.zeros_like(codes)
    for k in range(KMER_LEN):
        shifted = jnp.pad(codes, ((0, 0), (k, 0)))[:, :L]  # c[p-k]
        kf = kf | (shifted << (2 * k))
    return kf


def _kmer_values_rev(codes):
    """kr[b, p] = packed k-mer of positions p..p+7, HIGHEST position in the
    high bits (FOREACH_KMER_REVERSE visits descending, misc.h:43)."""
    L = codes.shape[1]
    kr = jnp.zeros_like(codes)
    for k in range(KMER_LEN):
        shifted = jnp.pad(codes, ((0, 0), (0, k)))[:, k:k + L]  # c[p+k]
        kr = kr | (shifted << (2 * k))
    return kr


def _window9_nonn(nonn, L):
    """all-non-N over a trailing window of 9 positions ending at p
    (the emission gate: FOREACH_KMER emits only once `bad` hits zero,
    i.e. at the 9th consecutive non-N base)."""
    cs = jnp.cumsum(nonn.astype(jnp.int32), axis=1)
    cs_pad = jnp.pad(cs, ((0, 0), (9, 0)))[:, :L]  # cs[p-9], 0 for p<9
    return (cs - cs_pad) == 9


def _occurrence_rank_plane(kf, emit, L):
    """rank[b, p] = number of earlier emissions with the same k-mer value
    via a lower-triangular equality plane — one [B, L, L] compare+reduce
    instead of three sorts (TPU sorts cost ~10 ms each at this shape)."""
    eq = (kf[:, :, None] == kf[:, None, :]) & emit[:, None, :]
    p = jnp.arange(L, dtype=jnp.int32)
    tri = p[None, :, None] > p[None, None, :]  # strictly earlier
    return jnp.sum((eq & tri).astype(jnp.int8), axis=2,
                   dtype=jnp.int32)


def _occurrence_rank(kf, emit, L):
    """rank[b, p] = number of earlier emissions with the same k-mer value
    (the kmerseen slot index); the reference keeps only the first
    num_kmers occurrences (assembler.c:94-100). O(L log L) via sort."""
    p = jnp.arange(L, dtype=jnp.int32)[None, :]
    # composite sort key: real emissions sort by (kmer, p); non-emissions
    # get unique keys larger than any real one
    key = jnp.where(emit, kf, (1 << 16) + p)
    comp = key * L + p
    order = jnp.argsort(comp, axis=1)
    sorted_key = jnp.take_along_axis(jnp.broadcast_to(key, comp.shape),
                                     order, axis=1)
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    seg_start = jnp.concatenate(
        [jnp.ones_like(sorted_key[:, :1], dtype=bool),
         sorted_key[:, 1:] != sorted_key[:, :-1]], axis=1)
    seg_head = jax.lax.cummax(jnp.where(seg_start, j, 0), axis=1)
    rank_sorted = j - seg_head
    inv = jnp.argsort(order, axis=1)
    return jnp.take_along_axis(rank_sorted, inv, axis=1)


def _aligned_frames(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, L):
    """Right-aligned forward / flipped reverse frames plus the all-overlap
    shifted gather of the forward frame. Shared by the exact scoring path
    (score_batch) and the fused fast path (assemble_step)."""
    nt16_f = fwd_nt.astype(jnp.int32) & 0x0F
    nt16_r = rev_nt.astype(jnp.int32) & 0x0F
    F_nt = _right_align(nt16_f, flen, L)
    F_q = _right_align(fwd_q.astype(jnp.int32), flen, L)
    R_nt = _flip(nt16_r, rlen, L)
    R_q = _flip(rev_q.astype(jnp.int32), rlen, L)
    return nt16_f, nt16_r, F_nt, F_q, R_nt, R_q


def _overlap_gather(L):
    """Index map idx[o-1, i] = position of overlap-local base i of overlap o
    in the right-aligned forward frame, plus the overlap-validity mask
    template ivalid[o-1, i] = i < o."""
    o_vals = jnp.arange(1, L + 1, dtype=jnp.int32)  # [O]
    i_vals = jnp.arange(L, dtype=jnp.int32)
    idx = i_vals[None, :] + (L - o_vals[:, None])  # [O, L]
    ivalid = i_vals[None, None, :] < o_vals[None, :, None]
    return o_vals, i_vals, idx, ivalid


@functools.partial(jax.jit, static_argnames=("L", "num_kmers", "algo_kind"))
def score_batch(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, L: int,
                num_kmers: int = NUM_KMERS_DEFAULT, algo_kind: str = "counts",
                lut_match=None, lut_mismatch=None, nn_term: float = 0.0):
    """Score every overlap offset for a batch of pairs.

    Returns dict with, for each overlap o (axis indexed by o-1, o in 1..L):
      matches, mismatches, unknowns, valid : [B, L] int32 exact counts
      cand                                 : [B, L] bool raw k-mer
                                             candidate flags (before the
                                             in-range / all-if-none rules,
                                             applied on host)
      lutsum (pear/rdp_mle only)           : [B, L] f32 LUT sums for
                                             candidate pruning
    """
    B = fwd_nt.shape[0]
    nt16_f = fwd_nt.astype(jnp.int32) & 0x0F
    nt16_r = rev_nt.astype(jnp.int32) & 0x0F
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]

    # ---- k-mer emission gates and values (exact seeding semantics) ----
    cf = jnp.asarray(_KCODE)[nt16_f]
    cr = jnp.asarray(_KCODE)[nt16_r]
    kf = _kmer_values_fwd(cf)
    kr = _kmer_values_rev(cr)
    nonn_f = nt16_f != 0x0F
    nonn_r = nt16_r != 0x0F
    emit_f = _window9_nonn(nonn_f, L) & (pos >= KMER_LEN) \
        & (pos < flen[:, None])
    # reverse emission at p needs positions p..p+8 visited and non-N
    w9r = _window9_nonn(jnp.flip(nonn_r, axis=1), L)
    emit_r = jnp.flip(w9r, axis=1) & (pos + KMER_LEN < rlen[:, None])
    rank = _occurrence_rank_plane(kf, emit_f, L)
    stored_f = emit_f & (rank < num_kmers)

    # ---- aligned frames ----
    F_nt = _right_align(nt16_f, flen, L)
    F_q = _right_align(fwd_q.astype(jnp.int32), flen, L)
    F_km = _right_align(jnp.where(stored_f, kf, -1), flen, L, fill=-1)
    R_nt = _flip(nt16_r, rlen, L)
    R_q = _flip(rev_q.astype(jnp.int32), rlen, L)
    R_km = _flip(jnp.where(emit_r, kr, -2), rlen, L, fill=-2)
    # pear reads BOTH quality values from the forward buffer
    # (algo_pear.c:52-54): index rlen-1-i into the persistent fwd buffer
    FP_q = _flip(fwd_q.astype(jnp.int32), rlen, L)

    # ---- all-overlap shifted comparison ----
    o_vals = jnp.arange(1, L + 1, dtype=jnp.int32)  # [O]
    i_vals = jnp.arange(L, dtype=jnp.int32)
    idx = i_vals[None, :] + (L - o_vals[:, None])  # [O, L]
    gather = lambda x: jnp.take(x, jnp.clip(idx, 0, L - 1), axis=1)

    FS_nt = gather(F_nt)  # [B, O, L]
    ivalid = i_vals[None, None, :] < o_vals[None, :, None]
    valid = (ivalid
             & (i_vals[None, None, :]
                >= o_vals[None, :, None] - flen[:, None, None])
             & (i_vals[None, None, :] < rlen[:, None, None]))

    Rb_nt = R_nt[:, None, :]
    n_mask = (FS_nt == 0x0F) | (Rb_nt == 0x0F)
    raw_match = (FS_nt & Rb_nt) != 0
    unknowns = jnp.sum(valid & n_mask, axis=2, dtype=jnp.int32)
    matches = jnp.sum(valid & ~n_mask & raw_match, axis=2, dtype=jnp.int32)
    mismatches = jnp.sum(valid & ~n_mask & ~raw_match, axis=2,
                         dtype=jnp.int32)
    nvalid = jnp.sum(valid, axis=2, dtype=jnp.int32)

    # ---- candidate mask: same diagonal frame on k-mer values ----
    FS_km = gather(F_km)
    cand = jnp.any((FS_km == R_km[:, None, :]) & ivalid, axis=2)

    out = dict(matches=matches, mismatches=mismatches, unknowns=unknowns,
               valid=nvalid, cand=cand)

    if algo_kind in ("pear", "rdp_mle"):
        # f32 LUT sums for candidate pruning; exact f64 re-scoring of the
        # shortlisted offsets happens on host.
        FS_q = gather(F_q)
        m_flat = jnp.asarray(lut_match, dtype=jnp.float32).reshape(-1)
        mm_flat = jnp.asarray(lut_mismatch, dtype=jnp.float32).reshape(-1)
        if algo_kind == "pear":
            q2 = FP_q[:, None, :]
        else:
            q2 = R_q[:, None, :]
        lut_idx = FS_q * 47 + q2
        mv = jnp.take(m_flat, lut_idx)
        mmv = jnp.take(mm_flat, lut_idx)
        if algo_kind == "pear":
            # N positions contribute -random_base (algo_pear.c:49-51)
            contrib = jnp.where(n_mask, jnp.float32(nn_term),
                                jnp.where(raw_match, mv, mmv))
        else:
            # rdp_mle has no N special case (algo_rdp_mle.c:64-71)
            contrib = jnp.where(raw_match, mv, mmv)
        out["lutsum"] = jnp.sum(jnp.where(valid, contrib, 0.0), axis=2,
                                dtype=jnp.float32)
    return out


@functools.partial(jax.jit, static_argnames=("L",))
def reconstruct_batch(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, fo, ro,
                      best_o, L: int):
    """Batched reconstruction (assembler.c:145-248) producing merged bases
    plus compact per-base provenance for exact host f64 finalization.

    Case codes:
      0 pad/hole, 1 fwd-unpaired, 2 rev-unpaired, 3 overlap match,
      4 overlap mismatch, 5 both B-cliff masked (q = qual_nn),
      6 forward masked (q = qual_score[rev q]),
      7 reverse masked (q = qual_score[fwd q])
    """
    return _reconstruct_core(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen,
                             fo, ro, best_o, L)


def _reconstruct_core(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, fo, ro,
                      best_o, L: int, L2: int | None = None):
    B = fwd_nt.shape[0]
    if L2 is None:
        L2 = 2 * L
    j = jnp.arange(L2, dtype=jnp.int32)[None, :]
    flen_ = flen[:, None]
    rlen_ = rlen[:, None]
    fo_ = fo[:, None]
    ro_ = ro[:, None]
    o_ = best_o[:, None]

    df = flen_ - fo_ - o_
    dr = rlen_ - ro_ - o_
    veez_df = jnp.maximum(df, 0)
    seq_len = df + o_ + dr  # length-1 in reference terms

    findex = fo_ + j
    rindex = rlen_ - 1 + df - j

    is_fwd = j < veez_df
    is_ovl = (j >= veez_df) & (j < df + o_ + jnp.minimum(dr, 0))
    is_rev = (j >= df + o_) & (j < df + o_ + jnp.maximum(dr, 0))

    f_ok = (findex >= 0) & (findex < flen_)
    r_ok = (rindex >= 0) & (rindex < rlen_)
    ovl_ok = is_ovl & f_ok & r_ok  # guard skips == holes (assembler.c:191)

    take_f = lambda x: jnp.take_along_axis(
        x, jnp.clip(findex, 0, L - 1), axis=1)
    take_r = lambda x: jnp.take_along_axis(
        x, jnp.clip(rindex, 0, L - 1), axis=1)

    # one packed gather per side (row-wise dynamic gathers dominate this
    # kernel's cost on TPU): nt in bits 0-3, qual in bits 4-9
    fp = take_f((fwd_nt.astype(jnp.int32) & 0x0F)
                | (fwd_q.astype(jnp.int32) << 4))
    rp = take_r((rev_nt.astype(jnp.int32) & 0x0F)
                | (rev_q.astype(jnp.int32) << 4))
    f_nt = fp & 0x0F
    f_q = (fp >> 4) & 0x3F
    r_nt = rp & 0x0F
    r_q = (rp >> 4) & 0x3F

    # B-cliff unmasked lengths (assembler.c:176-177)
    posL = jnp.arange(L, dtype=jnp.int32)[None, :]
    good_f = (posL < flen_) & (fwd_q != 2)
    uf = jnp.max(jnp.where(good_f, posL + 1, 0), axis=1, keepdims=True)
    good_r = (posL < rlen_) & (rev_q != 2)
    ur = jnp.max(jnp.where(good_r, posL + 1, 0), axis=1, keepdims=True)

    fmasked = findex >= uf
    rmasked = rindex >= ur
    ismatch = (f_nt & r_nt) != 0

    ovl_case = jnp.where(
        fmasked & rmasked, 5,
        jnp.where(fmasked, 6,
                  jnp.where(rmasked, 7,
                            jnp.where(ismatch, 3, 4))))
    case = jnp.where(is_fwd & f_ok, 1,
                     jnp.where(is_rev & r_ok, 2,
                               jnp.where(ovl_ok, ovl_case, 0)))

    ovl_nt = jnp.where(ismatch, f_nt & r_nt,
                       jnp.where(f_q < r_q, r_nt, f_nt))
    nt = jnp.where(case == 1, f_nt,
                   jnp.where(case == 2, r_nt,
                             jnp.where(ovl_ok, ovl_nt, 0)))

    written = case != 0
    popcnt = jnp.asarray(np.array([bin(i).count("1") for i in range(16)],
                                  dtype=np.int32))
    degen = jnp.sum(jnp.where(written, (popcnt[nt] != 1).astype(jnp.int32),
                              0), axis=1)
    ovl_mismatch = jnp.sum((ovl_ok & ~ismatch).astype(jnp.int32), axis=1)

    return dict(nt=nt.astype(jnp.int8), case=case.astype(jnp.int8),
                fq=f_q.astype(jnp.int8), rq=r_q.astype(jnp.int8),
                degenerates=degen, overlap_mismatches=ovl_mismatch,
                seq_len=seq_len[:, 0])


# ---------------------------------------------------------------------------
# Fused fast path: one jit, everything on device.
# ---------------------------------------------------------------------------

def _dense_counts(F_nt, R_nt, flen, rlen, L):
    """Exact integer match/mismatch/unknown/valid counts for every overlap
    o in 1..L: [B, O] each. Dense (no k-mer seeding) == reference -k 0:
    an empty kmerseen table flags no candidates, so ALL_BITS_IF_NONE
    (assembler.c:42,118) examines every overlap."""
    _, i_vals, idx, ivalid = _overlap_gather(L)
    o_vals = jnp.arange(1, L + 1, dtype=jnp.int32)
    FS_nt = jnp.take(F_nt, jnp.clip(idx, 0, L - 1), axis=1)  # [B, O, L]
    valid = (ivalid
             & (i_vals[None, None, :]
                >= o_vals[None, :, None] - flen[:, None, None])
             & (i_vals[None, None, :] < rlen[:, None, None]))
    Rb_nt = R_nt[:, None, :]
    n_mask = (FS_nt == 0x0F) | (Rb_nt == 0x0F)
    raw_match = (FS_nt & Rb_nt) != 0
    unknowns = jnp.sum(valid & n_mask, axis=2, dtype=jnp.int32)
    matches = jnp.sum(valid & ~n_mask & raw_match, axis=2, dtype=jnp.int32)
    mismatches = jnp.sum(valid & ~n_mask & ~raw_match, axis=2,
                         dtype=jnp.int32)
    nvalid = jnp.sum(valid, axis=2, dtype=jnp.int32)
    return matches, mismatches, unknowns, nvalid


def _simple_bayes_scores(m, mm, unk, flen, rlen, L, pmatch, pmismatch,
                         nn):
    """simple_bayesian overlap score (algo_simple_bayes.c:45-65) from the
    integer counts, f32 on device."""
    o = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :]
    tail = (o < flen[:, None]) | (o < rlen[:, None])
    nn_count = jnp.where(tail, flen[:, None] + rlen[:, None] - 2 * o + unk,
                         unk)
    return (jnp.float32(nn) * nn_count.astype(jnp.float32)
            + m.astype(jnp.float32) * jnp.float32(pmatch)
            + mm.astype(jnp.float32) * jnp.float32(pmismatch))


@functools.partial(jax.jit,
                   static_argnames=("L", "minoverlap", "maxoverlap"))
def assemble_step(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, *, L: int,
                  minoverlap: int = 2, maxoverlap: int = 0):
    """Fully fused on-device assembly step (the flagship compute graph).

    Dense simple_bayesian scoring of every overlap (reference -k 0
    semantics), argmax selection, reconstruction, per-base probabilities
    and mean quality — one XLA program, f32 scoring. The bit-exact
    production mode instead stops at the integer counts (score_batch) and
    finishes selection in f64 on host; this fused path is what runs when
    selection ties at f32 resolution are acceptable (turbo mode) and is
    the graph the multi-chip sharding wraps.

    Returns per-pair arrays: merged nt codes, per-base log-prob (f32),
    seq_len, quality, best overlap, ok mask, plus STAT counter inputs.
    """
    from .. import tables

    flen = flen.astype(jnp.int32)
    rlen = rlen.astype(jnp.int32)
    _, _, F_nt, F_q, R_nt, R_q = _aligned_frames(
        fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, L)
    m, mm, unk, nvalid = _dense_counts(F_nt, R_nt, flen, rlen, L)

    nn = float(tables.QUAL_NN_SIMPLE_BAYESIAN)
    # default epsilon q=0.36 (algo_simple_bayes.c:113)
    q = 0.36
    import math as _math
    pmatch = _math.log(0.25 * (1.0 - q) * (1.0 - q))
    pmismatch = _math.log((3.0 * q - 2.0 * q * q) / 18.0)
    scores = _simple_bayes_scores(m, mm, unk, flen, rlen, L, pmatch,
                                  pmismatch, nn)

    o = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :]
    maxo = flen + rlen - minoverlap - 1
    maxo = jnp.minimum(maxo, jnp.minimum(flen, rlen)) if maxoverlap == 0 \
        else jnp.minimum(maxo, maxoverlap)
    in_range = (o >= minoverlap) & (o <= maxo[:, None])
    scores = jnp.where(in_range, scores, -jnp.inf)
    floor = jnp.float32(nn) * (flen + rlen).astype(jnp.float32)
    best = jnp.max(scores, axis=1)
    besto = jnp.argmax(scores, axis=1).astype(jnp.int32) + 1
    badread = (flen < 2) | (rlen < 2) | (jnp.minimum(flen, rlen) < minoverlap)
    aligned = (best > floor) & ~badread

    zeros = jnp.zeros_like(flen)
    rec = _reconstruct_core(fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen,
                            zeros, zeros, besto, L)
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
    p = jnp.where(case == 1, jnp.take(qs, fq), p)
    p = jnp.where((case == 2) | (case == 6), jnp.take(qs, rq), p)
    p = jnp.where((case == 3) | (case == 4), mp, p)
    p = jnp.where(case == 5, jnp.float32(nn), p)
    p = jnp.where(case == 7, jnp.take(qs, fq), p)

    seq_len = rec["seq_len"]
    quality = jnp.sum(jnp.where(case != 0, p, 0.0), axis=1) \
        / (seq_len + 1).astype(jnp.float32)
    threshold = jnp.float32(_math.log(0.6))  # assembler_support.c:76
    length_ok = (seq_len + 1 > 0) & (seq_len + 1 <= 2 * 450)
    ok = aligned & length_ok & (quality >= threshold)
    lowq = aligned & length_ok & (quality < threshold)

    counters = dict(
        reads=jnp.int32(flen.shape[0]),
        ok=jnp.sum(ok, dtype=jnp.int32),
        lowq=jnp.sum(lowq, dtype=jnp.int32),
        badread=jnp.sum(badread, dtype=jnp.int32),
        noalgn=jnp.sum(~aligned & ~badread | (aligned & ~length_ok),
                       dtype=jnp.int32),
    )
    return dict(nt=rec["nt"], p=p, seq_len=seq_len, quality=quality,
                overlap=besto, ok=ok, degenerates=rec["degenerates"],
                overlap_mismatches=rec["overlap_mismatches"],
                counters=counters)
