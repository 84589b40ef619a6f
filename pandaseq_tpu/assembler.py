"""Batched assembler: one fused TPU dispatch per batch + exact f64 host
finalization.

Pipeline per batch (see SURVEY.md §7 and ops/fused.py):

  1. host (_pre): decode to padded [B, L] int8 tensors, badread gate,
     stateful module prechecks, vectorized primer location (-p/-q)
  2. device (_dispatch, ONE jit call): exact integer
     match/unknown/k-mer-hit counts for every overlap (skew diagonal
     reduction), f32 selection, reconstruction — all packed into a
     single int32 output plane whose host copy starts asynchronously
  3. host (_finalize): exact f64 winner re-derivation from the integer
     counts (full formula for the count-based algorithms; eps-shortlist
     re-scoring for the per-base-LUT ones), with a per-pair numpy-oracle
     fallback wherever the device's f32 argmax disagrees; exact quality
     via the native single-pass kernel (or PTBL gathers + region-ordered
     cumsums); post primers, threshold, filter modules, formatting —
     byte-identical to the C reference throughout

_pre/_dispatch/_finalize are pipelined ``depth`` batches deep
(assemble_stream / emit_stream) so tunnel latency and host work overlap.
Counter names mirror the reference STAT block (pool.c:83-104).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from . import oracle
from .nt import IUPAC_FORWARD
from .oracle import OracleConfig, OracleResult
from .ops import align as dev_align
from .tables import (QUAL_NN_SIMPLE_BAYESIAN, QUAL_SCORE, QUAL_SCORE_ERR,
                     QUAL_MATCH_PEAR, QUAL_MISMATCH_PEAR,
                     QUAL_MATCH_SIMPLE_BAYESIAN,
                     QUAL_MISMATCH_SIMPLE_BAYESIAN,
                     QUAL_MISMATCH_RDP_MLE)

_NN = QUAL_NN_SIMPLE_BAYESIAN
_EPS = 0.01  # f32 pruning slack for pear/rdp (error bound ~3e-4 at L=450)


def _bucket(n: int, step: int = 128) -> int:
    """Round up to the shape bucket so jit specializations stay few."""
    return ((max(n, 1) + step - 1) // step) * step


def _segmented_first_max(bs, o_arr, sums, floor, aligned, besto, best):
    """Per-pair first-strict-max over ascending o for flat (pair, o)
    combos sorted row-major (the reference's ascending loop with strict >
    keeps the earliest maximum, assembler.c:131-134). Mutates
    aligned/besto/best in place."""
    starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
    seg_best = np.maximum.reduceat(sums, starts)
    seg_ids = np.repeat(np.arange(len(starts)),
                        np.diff(np.r_[starts, len(bs)]))
    is_max = sums == seg_best[seg_ids]
    first_o = np.minimum.reduceat(
        np.where(is_max, o_arr, np.int64(1 << 40)), starts)
    b_of_seg = bs[starts]
    win = seg_best > floor[b_of_seg]
    aligned[b_of_seg[win]] = True
    besto[b_of_seg[win]] = first_o[win]
    best[b_of_seg[win]] = seg_best[win]


@dataclass
class Batch:
    sids: list
    fwd_nt: np.ndarray  # [B, L] int8
    fwd_q: np.ndarray
    rev_nt: np.ndarray
    rev_q: np.ndarray
    flen: np.ndarray  # [B] int32
    rlen: np.ndarray
    pairs: list  # original ReadPair objects (for exact re-scoring)


def make_batch(pairs, L: int) -> Batch:
    B = len(pairs)
    fwd_nt = np.zeros((B, L), dtype=np.int8)
    fwd_q = np.zeros((B, L), dtype=np.int8)
    rev_nt = np.zeros((B, L), dtype=np.int8)
    rev_q = np.zeros((B, L), dtype=np.int8)
    flen = np.zeros(B, dtype=np.int32)
    rlen = np.zeros(B, dtype=np.int32)
    n = pairs[0].fwd_nt.shape[0]
    for b, p in enumerate(pairs):
        fwd_nt[b, :n] = p.fwd_nt
        fwd_q[b, :n] = p.fwd_q  # full persistent-buffer snapshot (pear)
        rev_nt[b, :n] = p.rev_nt
        rev_q[b, :n] = p.rev_q
        flen[b] = p.flen
        rlen[b] = p.rlen
    return Batch([p.sid for p in pairs], fwd_nt, fwd_q, rev_nt, rev_q,
                 flen, rlen, list(pairs))


def _scores_from_counts(algo, m, mm, unk, valid, flen, rlen, o):
    """Vectorized f64 overlap scores from exact integer counts, matching
    each algorithm's C expression term-for-term."""
    m = m.astype(np.float64)
    mmf = mm.astype(np.float64)
    unkf = unk.astype(np.float64)
    name = algo.name
    if name in ("simple_bayesian", "uparse"):
        tail = (o < flen) | (o < rlen)
        nn_count = np.where(tail, flen + rlen - 2 * o + unk, unk)
        return (_NN * nn_count.astype(np.float64) + m * algo.pmatch
                + mmf * algo.pmismatch)
    if name == "ea_util":
        bad = mm + unk  # N or non-matching (algo_ea_util.c:49-51)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.log((bad.astype(np.float64) * bad + 1)
                          / valid.astype(np.float64))
    if name == "flash":
        bad = mm + unk
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(valid > 0, bad // np.maximum(valid, 1), 0)
            s = np.where(ratio > 0, np.log(ratio.astype(np.float64)), -np.inf)
        return np.where(valid == 0, -2.0, s)
    if name == "stitch":
        s = (m.astype(np.int64) - mm.astype(np.int64)).astype(np.uint64)
        val = s.astype(np.float64) / (flen + rlen).astype(np.float64)
        with np.errstate(divide="ignore"):
            return np.where(val > 0, np.log(np.maximum(val, 1e-300)), -np.inf)
    raise ValueError(name)


def _exact_rescore(algo, pair, o_list):
    """Sequential-order f64 re-score of selected overlaps (pear/rdp)."""
    return {int(o): algo.overlap_probability(
        pair.fwd_nt, pair.fwd_q, pair.flen, pair.rev_nt, pair.rev_q,
        pair.rlen, int(o)) for o in o_list}


# per-algorithm [2, 47, 47] match-probability tables for vectorized host
# reconstruction p lookup; formula algorithms are handled separately
_MP_TABLES = {
    "simple_bayesian": (QUAL_MATCH_SIMPLE_BAYESIAN,
                        QUAL_MISMATCH_SIMPLE_BAYESIAN),
    "stitch": (QUAL_MATCH_SIMPLE_BAYESIAN, QUAL_MISMATCH_SIMPLE_BAYESIAN),
    "pear": (QUAL_MATCH_PEAR, QUAL_MISMATCH_PEAR),
}


def _match_probability_vec(algo, ismatch, fq, rq):
    """Vectorized f64 match_probability over provenance arrays."""
    name = algo.name
    fq = np.clip(fq, 0, 46).astype(np.int32)
    rq = np.clip(rq, 0, 46).astype(np.int32)
    if name in _MP_TABLES:
        mt, mmt = _MP_TABLES[name]
        return np.where(ismatch, mt[fq, rq], mmt[fq, rq])
    if name == "uparse":
        from .tables import QUAL_MATCH_UPARSE, QUAL_MISMATCH_UPARSE
        return np.where(ismatch, QUAL_MATCH_UPARSE[fq, rq],
                        QUAL_MISMATCH_UPARSE[fq, rq])
    if name == "rdp_mle":
        from .tables import QUAL_MISMATCH_ASSEMBLED_RDP_MLE
        return np.where(ismatch, QUAL_SCORE[np.maximum(fq, rq)],
                        QUAL_MISMATCH_ASSEMBLED_RDP_MLE[fq, rq])
    if name == "ea_util":
        return QUAL_SCORE[np.maximum(fq, rq)]
    if name == "flash":
        diff = np.maximum(np.abs(fq - rq), 2)
        return np.where(ismatch, QUAL_SCORE[np.maximum(fq, rq)],
                        QUAL_SCORE[diff])
    raise ValueError(name)


def _compute_offsets_vec(threshold, penalty, reverse, nt, probs, notprobs,
                         seq_len, primer):
    """Vectorized panda_compute_offset over a batch (offset.c:47-90).

    Builds the value the C loop computes at every check index (0..S-1):
    indices < primerlen read a circular-buffer slot still at -INFINITY
    (value reduces to -index*penalty); indices >= primerlen hold the
    complete alignment starting at s = index - primerlen. Winner = first
    occurrence of the maximum, if strictly above exp(primerlen*threshold).
    Primers longer than the sequence return 0 (offset.c:62-64).
    """
    B, S = nt.shape
    plen = len(primer)
    pos = np.arange(S)[None, :]
    rows = np.arange(B)[:, None]
    if reverse:
        # scan coordinate i reads actual position seq_len-1-i
        idx = seq_len[:, None] - 1 - pos
        ok = idx >= 0
        idxc = np.clip(idx, 0, S - 1)
        nt_s = np.where(ok, nt[rows, idxc], 0)
        p_s = np.where(ok, probs[rows, idxc], 0.0)
        np_s = np.where(ok, notprobs[rows, idxc], 0.0)
    else:
        nt_s, p_s, np_s = nt, probs, notprobs
    # A[b, s] = alignment score for start s, accumulated in ascending x —
    # the same order the C circular buffer receives contributions. The
    # native kernel and the numpy slice-add fallback produce identical
    # f64 accumulation order.
    from .io import native as _native
    A = _native.primer_align(nt_s, p_s, np_s, np.asarray(primer))
    if A is None:
        A = np.zeros((B, S), dtype=np.float64)
        for x in range(plen):
            px = int(primer[x])
            if px == 0x0F:
                continue  # N primer bases contribute nothing (offset.c:80)
            W = S - x
            A[:, :W] += np.where((nt_s[:, x:] & px) != 0, p_s[:, x:],
                                 np_s[:, x:])
    # value at check index i
    checkvals = np.full((B, S), -np.inf)
    i_head = pos.astype(np.float64)
    head = 0.0 - i_head * penalty
    tail_start = np.roll(A, plen, axis=1)  # A[s = i - plen] at index i
    i_all = pos.astype(np.float64)
    with np.errstate(over="ignore", invalid="ignore"):
        tail = np.exp(tail_start / (i_all + 1)) - i_all * penalty
    checkvals = np.where(pos < plen, head, tail)
    checkvals = np.where(pos < seq_len[:, None], checkvals, -np.inf)
    checkvals = np.where(np.isnan(checkvals), -np.inf, checkvals)
    bestpr = math.exp(plen * threshold)
    best = checkvals.max(axis=1)
    arg = checkvals.argmax(axis=1)  # first occurrence == C's strict >
    result = np.where(best > bestpr, arg + 1, 0)
    return np.where(seq_len < plen, 0, result).astype(np.int64)


@dataclass
class Counters:
    """The reference's per-assembler STAT counters (pool.c:83-104)."""
    count: int = 0
    nofp: int = 0
    norp: int = 0
    noalgn: int = 0
    lowq: int = 0
    badread: int = 0
    slow: int = 0
    ok: int = 0
    overlaps: dict = field(default_factory=dict)

    def record_overlap(self, o):
        self.overlaps[o] = self.overlaps.get(o, 0) + 1


class BatchAssembler:
    """Assembles batches of read pairs with reference-identical output."""

    def __init__(self, cfg: OracleConfig | None = None, L: int = 512,
                 modules=(), need_p: bool | None = None, mesh=None):
        self.cfg = cfg or OracleConfig()
        self.L = L
        self.modules = list(modules)
        self.counters = Counters()
        # optional jax Mesh with a "dp" axis: batches whose size divides
        # the axis are sharded across its devices (XLA partitions the
        # fused graph; host finalization is unchanged)
        self.mesh = mesh
        # per-base probabilities materialize lazily per record (consumers:
        # FASTQ output, filter modules, post primers); quality comes from
        # the native single-pass kernel. need_p=True forces the eager
        # vectorized-[B,L2] path (also the fallback without the native
        # library).
        self.need_p = bool(need_p)
        algo = self.cfg.algorithm
        name = algo.name
        if name in ("pear", "rdp_mle", "ea_util", "flash", "stitch"):
            self._algo_kind = name
        elif name in ("simple_bayesian", "uparse"):
            self._algo_kind = "counts"
        else:
            # custom algorithm: device scores are only a warm guess;
            # exact per-pair selection runs on host
            self._algo_kind = "counts"
            self._custom = True
        if name in ("simple_bayesian", "uparse", "pear", "rdp_mle",
                    "ea_util", "flash", "stitch"):
            self._custom = False
        self._pmatch = getattr(algo, "pmatch", 0.0)
        self._pmismatch = getattr(algo, "pmismatch", 0.0)
        if name == "pear":
            self._lut_m, self._lut_mm = QUAL_MATCH_PEAR, QUAL_MISMATCH_PEAR
            self._nn_term = -algo.random_base
        elif name == "rdp_mle":
            self._lut_m = QUAL_MATCH_SIMPLE_BAYESIAN - _NN
            self._lut_mm = QUAL_MISMATCH_RDP_MLE - _NN
            self._nn_term = 0.0
        else:
            self._lut_m = self._lut_mm = None
            self._nn_term = 0.0
        from .ops import fused as _fused
        self._fused = _fused
        self._ptbl = _fused.build_ptable(algo)
        from .nt import result_phred
        # PHRED+33 output byte per pidx (panda_result_phred, nt.c:126-150)
        self._phtbl = (33 + result_phred(self._ptbl)).astype(np.uint8)

    # ------------------------------------------------------------------
    def assemble_batch(self, pairs):
        """Returns a list of (code, OracleResult|None) preserving order."""
        st = self._pre(pairs)
        dev = self._dispatch(st)
        return self._finalize(st, dev)

    def assemble_stream(self, pair_batches, depth: int = 3):
        """Pipelined driver: yields one result list per input batch,
        keeping up to ``depth`` batches in flight on the device before
        finalizing the oldest (the async-reader/pool overlap of the
        reference, async.c/pool.c, as device/host overlap; a deeper
        queue hides the tunnel's per-dispatch latency)."""
        from collections import deque
        q = deque()
        for pairs in pair_batches:
            st = self._pre(pairs)
            dev = self._dispatch(st)
            q.append((st, dev))
            if len(q) > depth:
                st0, dev0 = q.popleft()
                yield st0["pairs"], self._finalize(st0, dev0)
        while q:
            st0, dev0 = q.popleft()
            yield st0["pairs"], self._finalize(st0, dev0)

    def _pre(self, pairs):
        """Host stage 0: decode batch, badread, prechecks, primers.

        ``pairs`` is either a list of ReadPair or a prebuilt Batch (the
        native decoder path, io/native.py)."""
        cfg = self.cfg
        if isinstance(pairs, Batch):
            batch = pairs
            pairs = batch.pairs
            B = len(batch.sids)
        else:
            B = len(pairs)
            batch = make_batch(pairs, self.L)
        self.counters.count += B

        flen, rlen = batch.flen.astype(np.int64), batch.rlen.astype(np.int64)

        # --- stage 0: badread + precheck modules + primer offsets (host) ---
        badread = (flen < 2) | (rlen < 2)
        # module prechecks run after the badread gate, before primers
        # (assembler.c:259); sequential order matters (after:/before: are
        # stateful stream-position gates)
        prerej = np.zeros(B, dtype=bool)
        pre_mods = [m for m in self.modules if m.precheck is not None]
        if pre_mods:
            for b in range(B):
                if badread[b]:
                    continue
                p_ = batch.pairs[b]
                for mod in pre_mods:
                    if not mod.precheck(p_.sid, p_.fwd_nt, p_.fwd_q,
                                        p_.flen, p_.rev_nt, p_.rev_q,
                                        p_.rlen):
                        mod.rejected += 1
                        prerej[b] = True
                        break
        # post-primer mode aligns with zero offsets (assembler.c:285-288)
        init_fo = 0 if cfg.post_primers else cfg.forward_trim
        init_ro = 0 if cfg.post_primers else cfg.reverse_trim
        fo = np.full(B, init_fo, dtype=np.int64)
        ro = np.full(B, init_ro, dtype=np.int64)
        nofp = np.zeros(B, dtype=bool)
        norp = np.zeros(B, dtype=bool)
        if not cfg.post_primers:
            if cfg.forward_primer is not None and len(cfg.forward_primer):
                probs = QUAL_SCORE[np.clip(batch.fwd_q, 0, 46)]
                notp = QUAL_SCORE_ERR[np.clip(batch.fwd_q, 0, 46)]
                offv = _compute_offsets_vec(
                    cfg.threshold, cfg.primer_penalty, False,
                    batch.fwd_nt.astype(np.int32) & 0x0F, probs, notp,
                    flen, cfg.forward_primer)
                nofp = (offv == 0) & ~badread & ~prerej
                fo = np.maximum(offv - 1, 0)
            if cfg.reverse_primer is not None and len(cfg.reverse_primer):
                probs = QUAL_SCORE[np.clip(batch.rev_q, 0, 46)]
                notp = QUAL_SCORE_ERR[np.clip(batch.rev_q, 0, 46)]
                offv = _compute_offsets_vec(
                    cfg.threshold, cfg.primer_penalty, False,
                    batch.rev_nt.astype(np.int32) & 0x0F, probs, notp,
                    rlen, cfg.reverse_primer)
                norp = (offv == 0) & ~badread & ~prerej & ~nofp
                ro = np.maximum(offv - 1, 0)
        shortread = (np.minimum(flen, rlen) < cfg.minoverlap) & ~badread \
            & ~prerej & ~nofp & ~norp

        maxo = flen + rlen - cfg.minoverlap - fo - ro - 1
        if cfg.maxoverlap == 0:
            maxo = np.minimum(flen, rlen)
        else:
            maxo = np.minimum(maxo, cfg.maxoverlap)
        negs = ((cfg.minoverlap + fo >= flen)
                | (cfg.minoverlap + ro >= rlen))

        # shape buckets: overlap axis only needs max(maxo), merged axis
        # only needs max(flen+rlen); rounded to 128 so the jit cache stays
        # small
        O = int(min(self.L, _bucket(max(int(maxo.max(initial=1)), 1))))
        L2 = int(min(2 * self.L,
                     _bucket(int((flen + rlen).max(initial=2)) + 1)))
        # device frame width: reads are usually much shorter than the
        # decode stride, and the tunnel charges per byte — slice the
        # uploads (and the frame/rank-plane compute) to the batch's own
        # max length (>= O: the o-axis index map needs L - o >= 0)
        Lb = int(min(self.L, max(
            _bucket(int(max(flen.max(initial=1), rlen.max(initial=1)))),
            O)))
        return dict(pairs=pairs, batch=batch, B=B, flen=flen, rlen=rlen,
                    fo=fo, ro=ro, badread=badread, prerej=prerej,
                    nofp=nofp, norp=norp, shortread=shortread, maxo=maxo,
                    negs=negs, O=O, L2=L2, Lb=Lb)

    def _dispatch(self, st):
        """Stage 1: the fused device step (single dispatch; ops/fused.py).
        Returns async device arrays — do not block here."""
        cfg = self.cfg
        batch = st["batch"]
        Lb = st["Lb"]
        if Lb < self.L:
            # slice uploads to the batch's own width; keep jax arrays
            # (e.g. dp-sharded via shard_fused_batch) on device — lax
            # slicing preserves their sharding, numpy gets a compact copy
            def cut(a):
                if isinstance(a, np.ndarray):
                    return np.ascontiguousarray(a[:, :Lb])
                return a[:, :Lb]
            inputs = (cut(batch.fwd_nt), cut(batch.fwd_q),
                      cut(batch.rev_nt), cut(batch.rev_q),
                      batch.flen, batch.rlen)
        else:
            inputs = (batch.fwd_nt, batch.fwd_q, batch.rev_nt,
                      batch.rev_q, batch.flen, batch.rlen)
        if self.mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            ndp = self.mesh.shape.get("dp", 1)
            if st["B"] % ndp == 0:
                spec = NamedSharding(self.mesh, P("dp"))
                # device placement only; the host-side batch arrays stay
                # numpy for prechecks/fallbacks
                inputs = tuple(jax.device_put(a, spec) for a in inputs)
        kw = {}
        if self._algo_kind in ("pear", "rdp_mle"):
            kw = dict(lut_match=self._lut_m, lut_mismatch=self._lut_mm)
        out = self._fused.assemble_fused(
            *inputs,
            st["fo"].astype(np.int32), st["ro"].astype(np.int32),
            L=Lb, O=st["O"], L2=st["L2"], minoverlap=cfg.minoverlap,
            maxoverlap=cfg.maxoverlap, num_kmers=cfg.num_kmers,
            algo_kind=self._algo_kind, pmatch=float(self._pmatch),
            pmismatch=float(self._pmismatch),
            nn_term=float(self._nn_term), **kw)
        try:  # overlap device->host copy with the next batch's compute
            out.copy_to_host_async()
        except AttributeError:
            pass
        return out

    def _finalize(self, st, dev, emit: str | None = None):
        cfg = self.cfg
        algo = cfg.algorithm
        batch = st["batch"]
        B = st["B"]
        flen, rlen = st["flen"], st["rlen"]
        fo, ro = st["fo"], st["ro"]
        badread, prerej = st["badread"], st["prerej"]
        nofp, norp = st["nofp"], st["norp"]
        shortread, maxo, negs = st["shortread"], st["maxo"], st["negs"]
        out = [(None, None)] * B

        O, L2 = st["O"], st["L2"]
        allp = np.asarray(dev)
        packed = allp[:, :O]
        seq = allp[:, O:O + L2]
        scalars = allp[:, O + L2:O + L2 + 4].astype(np.int64)
        pidx = seq & 0xFFFF
        ascii_all = ((seq >> 16) & 0xFF).astype(np.uint8)
        seq_len = scalars[:, 0]
        degen = scalars[:, 1]
        ovl_mm = scalars[:, 2]
        besto32 = scalars[:, 3]

        m = (packed & 0x3FF).astype(np.int64)
        mm = ((packed >> 10) & 0x7FF).astype(np.int64)
        cand = (packed >> 21) != 0
        o = np.arange(1, O + 1, dtype=np.int64)[None, :]
        # valid(o) is deterministic given the lengths (no transfer needed)
        valid = np.maximum(
            0, np.minimum(o, rlen[:, None]) - np.maximum(0, o - flen[:, None]))
        unk = valid - m - mm

        # --- stage 2: host f64 selection ---
        in_range = (o >= cfg.minoverlap) & (o <= maxo[:, None])
        cand_in = cand & in_range
        none_found = ~cand_in.any(axis=1)
        cand_in = np.where(none_found[:, None], in_range, cand_in)
        examined = cand_in.sum(axis=1)
        slow_mask = examined == (maxo - cfg.minoverlap + 1)

        floor = _NN * (flen + rlen).astype(np.float64)
        algo = cfg.algorithm
        skip = badread | prerej | nofp | norp | negs | shortread
        if self._algo_kind in ("pear", "rdp_mle"):
            f32 = (allp[:, O + L2 + 4:O + L2 + 4 + O]
                   .view(np.float32).astype(np.float64))
            f32 = np.where(cand_in, f32, -np.inf)
            best32 = f32.max(axis=1, initial=-np.inf)
            sus = (cand_in & ~skip[:, None]
                   & ((f32 >= best32[:, None] - _EPS)
                      | (np.abs(f32 - floor[:, None]) <= _EPS)))
            aligned, besto, best = self._exact_select_lut(
                batch, sus, flen, rlen, floor)
        elif self._custom:
            # custom algorithm: exact per-pair scoring over every
            # candidate offset via its overlap_probability
            aligned = np.zeros(B, dtype=bool)
            besto = np.ones(B, dtype=np.int64)
            best = np.full(B, -np.inf)
            for b in range(B):
                if skip[b]:
                    continue
                exact = _exact_rescore(algo, batch.pairs[b],
                                       np.flatnonzero(cand_in[b]) + 1)
                bb, bo = floor[b], -1
                for oo in sorted(exact):
                    if exact[oo] > bb:
                        bb, bo = exact[oo], oo
                if bo != -1:
                    aligned[b] = True
                    besto[b] = bo
                    best[b] = bb
        else:
            # exact f64 scores directly from the integer counts, only at
            # the candidate offsets (typically a few % of the [B, O]
            # grid; elementwise, so 1-D fancy-indexed slices broadcast)
            bi, oi = np.nonzero(cand_in)
            scores = np.full(cand_in.shape, -np.inf)
            scores[bi, oi] = _scores_from_counts(
                algo, m[bi, oi], mm[bi, oi], unk[bi, oi], valid[bi, oi],
                flen[bi], rlen[bi], o[0, oi])
            scores = np.where(np.isnan(scores), -np.inf, scores)
            best = scores.max(axis=1, initial=-np.inf)
            besto = scores.argmax(axis=1) + 1  # first occurrence == C rule
            aligned = (best > floor) & ~skip

        # --- stage 3: exact-vs-f32 winner check; oracle fallback for the
        # (rare) pairs where the device's f32 selection differs ---
        fb = {}
        for b in np.flatnonzero(aligned & (besto != besto32)):
            res, code = oracle.align(
                cfg, batch.pairs[b].fwd_nt, batch.pairs[b].fwd_q,
                int(flen[b]), batch.pairs[b].rev_nt, batch.pairs[b].rev_q,
                int(rlen[b]), int(fo[b]), int(ro[b]))
            fb[int(b)] = res if code == "OK" else None

        # --- stage 4: exact quality (and, when consumed, per-base
        # probabilities) in f64 via the per-algorithm PTBL lookup ---
        quality = None
        if not self.need_p:
            from .io import native as _native
            quality = _native.quality(seq, self._ptbl, seq_len)
            p = None
        if quality is None:
            p = self._ptbl[np.clip(pidx, 0, self._ptbl.shape[0] - 1)]
            case = pidx // 2209
            is_fwd = (case == 1)
            is_rev = (case == 2)
            is_ovl = (case >= 3)
            # region-ordered sequential sums: masked cumsum == the C
            # loop's accumulation (adding 0.0 is exact); grouping
            # (f + r) + o matches assembler.c:244
            fsum = np.cumsum(np.where(is_fwd, p, 0.0), axis=1)[:, -1]
            osum = np.cumsum(np.where(is_ovl, p, 0.0), axis=1)[:, -1]
            rsum = np.cumsum(np.where(is_rev, p, 0.0), axis=1)[:, -1]
            quality = (fsum + rsum + osum) / (seq_len + 1).astype(np.float64)

        length_bad = (seq_len + 1 <= 0) | (seq_len + 1 > 2 * oracle.MAX_LEN)

        if emit is not None:
            return self._emit(st, emit, out, fb, badread, prerej,
                              shortread, nofp, norp, negs, slow_mask,
                              aligned, length_bad, quality, seq_len,
                              besto, ascii_all, pidx)

        # --- stage 5: verdicts + results ---
        for b in range(B):
            if badread[b]:
                out[b] = ("BADR", None)
                self.counters.badread += 1
                continue
            if prerej[b]:  # precheck reject: no STAT counter
                out[b] = ("MODULE", None)
                continue
            if shortread[b]:
                out[b] = ("BADR", None)
                self.counters.badread += 1
                continue
            if nofp[b]:
                out[b] = ("NOFP", None)
                self.counters.nofp += 1
                continue
            if norp[b]:
                out[b] = ("NORP", None)
                self.counters.norp += 1
                continue
            if negs[b]:
                out[b] = ("NOALGN", None)
                self.counters.noalgn += 1
                continue
            if slow_mask[b]:
                self.counters.slow += 1
            if b in fb:
                res = fb[b]
                if res is None or res.sequence_length + 1 > 2 * \
                        oracle.MAX_LEN:
                    out[b] = ("NOALGN", None)
                    self.counters.noalgn += 1
                    continue
                res.sid = batch.sids[b]
                res.forward_offset = int(fo[b])
                res.reverse_offset = int(ro[b])
                res.forward_length = int(flen[b])
                res.reverse_length = int(rlen[b])
            else:
                if not aligned[b] or length_bad[b]:
                    out[b] = ("NOALGN", None)
                    self.counters.noalgn += 1
                    continue
                res = OracleResult()
                res.sid = batch.sids[b]
                n = int(seq_len[b])
                res.sequence_ascii = ascii_all[b, :n]
                res.sequence_nt = IUPAC_FORWARD[ascii_all[b, :n] & 0x1F]
                res.sequence_p = p[b, :n] if p is not None else \
                    self._ptbl[pidx[b, :n]]  # lazy per-record fallback
                res.sequence_length = n
                res.quality = float(quality[b])
                res.overlap = int(besto[b])
                res.overlaps_examined = int(examined[b])
                res.overlap_mismatches = int(ovl_mm[b])
                res.degenerates = int(degen[b])
                res.estimated_overlap_probability = float(best[b])
                res.forward_offset = int(fo[b])
                res.reverse_offset = int(ro[b])
                res.forward_length = int(flen[b])
                res.reverse_length = int(rlen[b])

            code = self._post_primers_and_threshold(res)
            if code != "OK":
                out[b] = (code, res)
                continue
            keep = True
            for mod in self.modules:
                if mod.check is not None and not mod.check(res):
                    mod.rejected += 1
                    keep = False
                    break
            if not keep:
                out[b] = ("MODULE", res)
                continue
            self.counters.ok += 1
            self.counters.record_overlap(res.overlap)
            out[b] = ("OK", res)
        return out

    def _emit(self, st, fmt, out, fb, badread, prerej, shortread, nofp,
              norp, negs, slow_mask, aligned, length_bad, quality,
              seq_len, besto, ascii_all, pidx):
        """Fast byte-emission finalization (no modules / post-primers):
        OK pairs append directly to the output payload without
        materializing result objects — the hot CLI path."""
        cfg = self.cfg
        c = self.counters
        thr = cfg.threshold
        fastq = fmt == "fastq"
        payload = bytearray()
        B = len(out)
        qexp = np.exp(quality)
        sids = st["batch"].sids
        scored = np.zeros(B, dtype=bool)  # align() succeeded (BESTOLP)
        overlaps = np.asarray(besto, dtype=np.int64).copy()
        for b in range(B):
            if badread[b]:
                out[b] = ("BADR", None)
                c.badread += 1
                continue
            if prerej[b]:
                out[b] = ("MODULE", None)
                continue
            if shortread[b]:
                out[b] = ("BADR", None)
                c.badread += 1
                continue
            if nofp[b]:
                out[b] = ("NOFP", None)
                c.nofp += 1
                continue
            if norp[b]:
                out[b] = ("NORP", None)
                c.norp += 1
                continue
            if negs[b]:
                out[b] = ("NOALGN", None)
                c.noalgn += 1
                continue
            if slow_mask[b]:
                c.slow += 1
            if b in fb:
                res = fb[b]
                if res is None or res.sequence_length + 1 > \
                        2 * oracle.MAX_LEN:
                    out[b] = ("NOALGN", None)
                    c.noalgn += 1
                    continue
                res.sid = sids[b]
                scored[b] = True
                overlaps[b] = res.overlap
                if res.quality < thr:
                    c.lowq += 1
                    out[b] = ("LOWQ", res)
                    continue
                c.ok += 1
                c.record_overlap(res.overlap)
                from .io import output as out_mod
                payload += (out_mod.format_fastq(res) if fastq
                            else out_mod.format_fasta(res))
                out[b] = ("OK", None)
                continue
            if not aligned[b] or length_bad[b]:
                out[b] = ("NOALGN", None)
                c.noalgn += 1
                continue
            scored[b] = True
            q = quality[b]
            if q < thr:
                c.lowq += 1
                r = OracleResult()
                r.quality = float(q)
                r.sid = sids[b]
                out[b] = ("LOWQ", r)
                continue
            c.ok += 1
            c.record_overlap(int(besto[b]))
            n = int(seq_len[b])
            out[b] = ("OK", None)
            if n == 0:
                continue  # no output, still counted (output.c:89-91)
            head = b"%c%s;%f\n" % (64 if fastq else 62, str(sids[b])
                                   .encode(), qexp[b])
            payload += head
            payload += ascii_all[b, :n].tobytes()
            if fastq:
                payload += b"\n+\n"
                payload += self._phtbl[pidx[b, :n]].tobytes()
            payload += b"\n"
        return out, bytes(payload), dict(scored=scored, overlap=overlaps)

    def emit_stream(self, pair_batches, fmt: str = "fasta",
                    depth: int = 4, with_extras: bool = False,
                    threaded: bool = False):
        """Pipelined fast path yielding (pairs, codes, payload_bytes[,
        extras]) per batch. Requires no filter modules and pre-assembly
        primers.

        With ``threaded`` the host finalization runs on one worker
        thread (FIFO, so counter updates and batch order stay
        sequential) overlapping the next batch's dispatch/transfer —
        the pool.c worker/reader overlap, host-side."""
        assert not self.modules and not self.cfg.post_primers
        from collections import deque

        def fin(st0, dev0):
            codes, payload, extras = self._finalize(st0, dev0, emit=fmt)
            if with_extras:
                return st0["pairs"], codes, payload, extras
            return st0["pairs"], codes, payload

        q = deque()
        if threaded:
            from concurrent.futures import ThreadPoolExecutor
            ex = ThreadPoolExecutor(1)
            futs = deque()
            try:
                for pairs in pair_batches:
                    stt = self._pre(pairs)
                    dev = self._dispatch(stt)
                    q.append((stt, dev))
                    if len(q) > depth:
                        futs.append(ex.submit(fin, *q.popleft()))
                    while len(futs) > 2:
                        yield futs.popleft().result()
                while q:
                    futs.append(ex.submit(fin, *q.popleft()))
                while futs:
                    yield futs.popleft().result()
            finally:
                ex.shutdown(wait=False)
            return
        for pairs in pair_batches:
            stt = self._pre(pairs)
            dev = self._dispatch(stt)
            q.append((stt, dev))
            if len(q) > depth:
                yield fin(*q.popleft())
        while q:
            yield fin(*q.popleft())

    def _exact_select_lut(self, batch, sus, flen, rlen, floor):
        """Vectorized exact f64 re-scoring of the shortlisted (pair,
        overlap) combos for the per-base-LUT algorithms (pear/rdp_mle),
        reproducing the C loop's ascending-index f64 accumulation via
        masked cumsum and its strict-> first-max selection."""
        algo = self.cfg.algorithm
        B = sus.shape[0]
        aligned = np.zeros(B, dtype=bool)
        besto = np.ones(B, dtype=np.int64)
        best = np.full(B, -np.inf)
        bs, os0 = np.nonzero(sus)  # row-major: ascending (b, o)
        if len(bs) == 0:
            return aligned, besto, best
        o_arr = (os0 + 1).astype(np.int64)
        L = self.L
        W = min(int(o_arr.max(initial=1)), L)  # i < o <= W suffices
        I = np.arange(W, dtype=np.int64)[None, :]
        fi = flen[bs, None] - o_arr[:, None] + I
        ri = rlen[bs, None] - 1 - I
        inb = ((I < o_arr[:, None]) & (fi >= 0) & (fi < flen[bs, None])
               & (ri >= 0) & (ri < rlen[bs, None]))
        fic = fi % L  # decoder guarantees quals in 0..46; mod is cheaper
        ric = ri % L
        fnt = (batch.fwd_nt[bs[:, None], fic].astype(np.int32) & 0x0F)
        rnt = (batch.rev_nt[bs[:, None], ric].astype(np.int32) & 0x0F)
        isn = (fnt == 0x0F) | (rnt == 0x0F)
        match = (fnt & rnt) != 0
        if algo.name == "pear":
            # quality quirk: BOTH indices read the fwd buffer
            qa = batch.fwd_q[bs[:, None], fic]
            qb = batch.fwd_q[bs[:, None], ric]
            v = np.where(isn, -algo.random_base,
                         np.where(match, QUAL_MATCH_PEAR[qa, qb],
                                  QUAL_MISMATCH_PEAR[qa, qb]))
        else:  # rdp_mle: per-element (LUT - nn) like the C loop
            qa = batch.fwd_q[bs[:, None], fic]
            qb = batch.rev_q[bs[:, None], ric]
            v = np.where(match,
                         QUAL_MATCH_SIMPLE_BAYESIAN[qa, qb] - _NN,
                         QUAL_MISMATCH_RDP_MLE[qa, qb] - _NN)
        sums = np.cumsum(np.where(inb, v, 0.0), axis=1)[:, -1]
        _segmented_first_max(bs, o_arr, sums, floor, aligned, besto, best)
        return aligned, besto, best

    def _post_primers_and_threshold(self, res):
        cfg = self.cfg
        if cfg.post_primers:
            if cfg.forward_primer is not None and len(cfg.forward_primer):
                off = oracle.compute_offset_result(
                    cfg.threshold, cfg.primer_penalty, False,
                    res.sequence_nt, res.sequence_p, res.sequence_length,
                    cfg.forward_primer)
                if off == 0:
                    self.counters.nofp += 1
                    return "NOFP"
                res.forward_offset = off - 1
            else:
                res.forward_offset = cfg.forward_trim
            if cfg.reverse_primer is not None and len(cfg.reverse_primer):
                off = oracle.compute_offset_result(
                    cfg.threshold, cfg.primer_penalty, True,
                    res.sequence_nt, res.sequence_p, res.sequence_length,
                    cfg.reverse_primer)
                if off == 0:
                    self.counters.norp += 1
                    return "NORP"
                res.reverse_offset = off - 1
            else:
                res.reverse_offset = cfg.reverse_trim
            if res.sequence_length <= res.forward_offset + res.reverse_offset:
                self.counters.nofp += 1
                return "NOFP"
            res.sequence_length -= res.forward_offset + res.reverse_offset
            fo2 = res.forward_offset
            res.sequence_nt = res.sequence_nt[fo2:fo2 + res.sequence_length]
            res.sequence_p = res.sequence_p[fo2:fo2 + res.sequence_length]
            if res.sequence_ascii is not None:
                res.sequence_ascii = \
                    res.sequence_ascii[fo2:fo2 + res.sequence_length]
        if res.quality < cfg.threshold:
            self.counters.lowq += 1
            return "LOWQ"
        return "OK"
