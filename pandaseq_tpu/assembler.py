"""Batched assembler v2: shortlist device step + native host finalize.

Pipeline per batch (see SURVEY.md §7, ops/fused2.py, native/psq_io.cpp):

  1. host (_pre): decode to REVERSED left-aligned [B, L] int8 frames
     (the native decoder emits this layout directly), badread gate,
     stateful module prechecks, native primer location (-p/-q)
  2. device (_dispatch, ONE jit call): exact integer
     match/unknown/k-mer-hit counts for every overlap offset (int8 MXU
     diagonal-reduction matmul), f32 scoring, winner + top-SL shortlist
     — ~80 B/pair shipped back (the tunnel/PCIe wire is the system
     bottleneck, so the merged sequence never crosses it)
  3. host (_finalize): native psq_finalize re-derives the exact f64
     winner from the shortlisted integer counts (per-base f64 LUT
     re-scoring for pear/rdp_mle), reconstructs the merged read
     (assembler.c:145-248), accumulates the exact (f+r)+o quality sums
     and emits output bytes — byte-identical to the C reference. Pairs
     whose shortlist cannot decide (n_band > SL: > SL near-ties in f32)
     replay through the numpy oracle; custom algorithms route every
     pair through it.

_pre/_dispatch/_finalize are pipelined ``depth`` batches deep
(assemble_stream / emit_stream) so wire latency and host work overlap.
Counter names mirror the reference STAT block (pool.c:83-104).
"""

from __future__ import annotations

import math
import os
import threading
from dataclasses import dataclass, field

import numpy as np

from . import oracle
from .nt import IUPAC_FORWARD
from .oracle import OracleConfig, OracleResult
from .tables import (QUAL_NN_SIMPLE_BAYESIAN, QUAL_SCORE, QUAL_SCORE_ERR,
                     QUAL_MATCH_PEAR, QUAL_MISMATCH_PEAR,
                     QUAL_MATCH_SIMPLE_BAYESIAN, QUAL_MISMATCH_RDP_MLE)

_NN = QUAL_NN_SIMPLE_BAYESIAN

_ALGO_IDS = {"counts": 0, "ea_util": 1, "flash": 2, "stitch": 3,
             "pear": 4, "rdp_mle": 5}
_CODE_NAMES = ["OK", "BADR", "MODULE", "NOFP", "NORP", "NOALGN", "LOWQ"]
_OK_TUPLE = ("OK", None)


def _bucket(n: int, step: int = 128) -> int:
    """Round up to the shape bucket so jit specializations stay few."""
    return ((max(n, 1) + step - 1) // step) * step


@dataclass
class Batch:
    """Reversed-frame batch: row position j of ``fwd_nt[b]`` holds raw
    base flen[b]-1-j (left-aligned); the nt tail is zero, the QUAL tail
    keeps the persistent-buffer bytes raw (stale-read PEAR quirk,
    fastq.c:33-36). ``pairs`` yields raw-order per-pair views."""
    sids: list
    fwd_nt: np.ndarray  # [B, L] int8, reversed
    fwd_q: np.ndarray
    rev_nt: np.ndarray
    rev_q: np.ndarray
    flen: np.ndarray  # [B] int32
    rlen: np.ndarray
    pairs: list

    _ids_buf: np.ndarray = None
    _raw: tuple = None
    _nt_pack: np.ndarray = None

    def nt_packed(self) -> np.ndarray:
        """[B, L] byte plane: fwd | rev << 4 — the device nt upload
        (the decoder fills this directly; derived lazily otherwise)."""
        if self._nt_pack is None:
            self._nt_pack = (
                (self.fwd_nt.astype(np.uint8) & 0x0F)
                | ((self.rev_nt.astype(np.uint8) & 0x0F) << 4)
            ).view(np.int8)
        return self._nt_pack

    def ids_bytes(self, stride: int = 416) -> np.ndarray:
        """[B, stride] NUL-terminated canonical id strings."""
        if self._ids_buf is None:
            B = len(self.sids)
            buf = np.zeros((B, stride), dtype=np.uint8)
            for i, s in enumerate(self.sids):
                bs = str(s).encode()[:stride - 1]
                buf[i, :len(bs)] = np.frombuffer(bs, dtype=np.uint8)
            self._ids_buf = buf
        return self._ids_buf

    def trimmed(self, keep: np.ndarray, new_flen: np.ndarray,
                new_rlen: np.ndarray) -> "Batch":
        """New Batch with rows selected by ``keep`` and read lengths
        truncated (pandaseq-hang's overhang trim, hang.c:82-114):
        the reversed frames are rebuilt so raw bases >= the new length
        stay in place as stale persistent-buffer bytes — exactly the
        reference's truncate-length-only semantics."""
        raw = self.raw()
        L = self.fwd_nt.shape[1]
        pos = np.arange(L)[None, :]
        kf = new_flen[keep].astype(np.int32)
        kr = new_rlen[keep].astype(np.int32)

        def rebuild(raw_a, lens, zero_tail):
            a = raw_a[keep]
            idx = np.where(pos < lens[:, None], lens[:, None] - 1 - pos,
                           pos)
            out = np.take_along_axis(a, idx, axis=1)
            if zero_tail:
                out[pos >= lens[:, None]] = 0
            return out

        b = Batch([s for s, k in zip(self.sids, keep) if k],
                  rebuild(raw[0], kf, True), rebuild(raw[1], kf, False),
                  rebuild(raw[2], kr, True), rebuild(raw[3], kr, False),
                  kf, kr, None)
        from .io.native import _LazyViews
        b.pairs = _LazyViews(b)
        if self._ids_buf is not None:
            b._ids_buf = np.ascontiguousarray(self._ids_buf[keep])
        return b

    def raw(self):
        """Raw-order copies (fwd_nt, fwd_q, rev_nt, rev_q) of the
        reversed frames (one vectorized gather per array)."""
        if self._raw is None:
            L = self.fwd_nt.shape[1]
            pos = np.arange(L)[None, :]

            def dr(rows, lens):
                idx = np.where(pos < lens[:, None],
                               lens[:, None] - 1 - pos, pos)
                return np.take_along_axis(rows, idx, axis=1)

            self._raw = (dr(self.fwd_nt, self.flen),
                         dr(self.fwd_q, self.flen),
                         dr(self.rev_nt, self.rlen),
                         dr(self.rev_q, self.rlen))
        return self._raw


def make_batch(pairs, L: int) -> Batch:
    """Build a reversed-frame Batch from raw-order ReadPair objects."""
    B = len(pairs)
    fwd_nt = np.zeros((B, L), dtype=np.int8)
    fwd_q = np.zeros((B, L), dtype=np.int8)
    rev_nt = np.zeros((B, L), dtype=np.int8)
    rev_q = np.zeros((B, L), dtype=np.int8)
    flen = np.zeros(B, dtype=np.int32)
    rlen = np.zeros(B, dtype=np.int32)
    for b, p in enumerate(pairs):
        fl, rl = int(p.flen), int(p.rlen)
        n = min(p.fwd_nt.shape[0], L)
        fwd_nt[b, :fl] = p.fwd_nt[:fl][::-1]
        fwd_q[b, :fl] = p.fwd_q[:fl][::-1]
        fwd_q[b, fl:n] = p.fwd_q[fl:n]  # stale buffer snapshot (pear)
        rev_nt[b, :rl] = p.rev_nt[:rl][::-1]
        rev_q[b, :rl] = p.rev_q[:rl][::-1]
        rev_q[b, rl:n] = p.rev_q[rl:n]
        flen[b] = fl
        rlen[b] = rl
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
            s = np.where(ratio > 0, np.log(ratio.astype(np.float64)),
                         -np.inf)
        return np.where(valid == 0, -2.0, s)
    if name == "stitch":
        s = (m.astype(np.int64) - mm.astype(np.int64)).astype(np.uint64)
        val = s.astype(np.float64) / (flen + rlen).astype(np.float64)
        with np.errstate(divide="ignore"):
            return np.where(val > 0, np.log(np.maximum(val, 1e-300)),
                            -np.inf)
    raise ValueError(name)


# per-algorithm [2, 47, 47] match-probability tables for the PTBL build
_MP_TABLES = {
    "simple_bayesian": (QUAL_MATCH_SIMPLE_BAYESIAN,
                        None),
    "stitch": (QUAL_MATCH_SIMPLE_BAYESIAN, None),
    "pear": (QUAL_MATCH_PEAR, QUAL_MISMATCH_PEAR),
}


def _match_probability_vec(algo, ismatch, fq, rq):
    """Vectorized f64 match_probability over provenance arrays."""
    from .tables import QUAL_MISMATCH_SIMPLE_BAYESIAN
    name = algo.name
    fq = np.clip(fq, 0, 46).astype(np.int32)
    rq = np.clip(rq, 0, 46).astype(np.int32)
    if name in ("simple_bayesian", "stitch"):
        return np.where(ismatch, QUAL_MATCH_SIMPLE_BAYESIAN[fq, rq],
                        QUAL_MISMATCH_SIMPLE_BAYESIAN[fq, rq])
    if name == "pear":
        return np.where(ismatch, QUAL_MATCH_PEAR[fq, rq],
                        QUAL_MISMATCH_PEAR[fq, rq])
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
    """Vectorized panda_compute_offset over a batch of RAW-order arrays
    (offset.c:47-90) — numpy fallback when the native library is
    unavailable (the hot path is native/psq_io.cpp:psq_compute_offsets).

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
        idx = seq_len[:, None] - 1 - pos
        ok = idx >= 0
        idxc = np.clip(idx, 0, S - 1)
        nt_s = np.where(ok, nt[rows, idxc], 0)
        p_s = np.where(ok, probs[rows, idxc], 0.0)
        np_s = np.where(ok, notprobs[rows, idxc], 0.0)
    else:
        nt_s, p_s, np_s = nt, probs, notprobs
    A = np.zeros((B, S), dtype=np.float64)
    for x in range(plen):
        px = int(primer[x])
        if px == 0x0F:
            continue  # N primer bases contribute nothing (offset.c:80)
        W = S - x
        A[:, :W] += np.where((nt_s[:, x:] & px) != 0, p_s[:, x:],
                             np_s[:, x:])
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


class ResultBatchView:
    """Columnar view over one batch's reconstructed results, consumed
    by vectorized module checks (Module.check_batch) — semantically the
    fields of panda_result_seq, one array per field."""

    def __init__(self, st, r, ptbl):
        osc = r["osc"]
        self.overlap = osc[:, 0].astype(np.int64)
        self.sequence_length = osc[:, 1].astype(np.int64)
        self.degenerates = osc[:, 2].astype(np.int64)
        self.overlap_mismatches = osc[:, 3].astype(np.int64)
        self.overlaps_examined = osc[:, 4].astype(np.int64)
        self.quality = r["quality"]
        self.estimated_overlap_probability = r["best"]
        self.forward_length = st["flen"]
        self.reverse_length = st["rlen"]
        self._pidx = r["pidx"]
        self._ptbl = ptbl

    def p(self):
        """[B, L2] per-base f64 log probabilities (PTBL-gathered)."""
        return self._ptbl[self._pidx]


class _SharedFetch:
    """One grouped device result, fetched to host at most once."""

    __slots__ = ("dev", "_host")

    def __init__(self, dev):
        self.dev = dev
        self._host = None

    def fetch(self):
        if self._host is None:
            self._host = np.asarray(self.dev)
            self.dev = None  # release device buffer
        return self._host


class _SliceView:
    """One batch's rows of a grouped (mega-dispatch) device result.
    np.asarray triggers a single shared transfer; slicing rows of the
    contiguous host array is free."""

    __slots__ = ("_shared", "_lo", "_hi")

    def __init__(self, shared, lo, hi):
        self._shared = shared
        self._lo = lo
        self._hi = hi

    def __array__(self, dtype=None, copy=None):
        out = self._shared.fetch()[self._lo:self._hi]
        if dtype is not None and out.dtype != dtype:
            out = out.astype(dtype)
        return out


class _FutureArray:
    """Lazy stolen-batch result: np.asarray waits for the host-twin
    worker (mirrors _SliceView's contract for device results)."""

    __slots__ = ("_fut",)

    def __init__(self, fut):
        self._fut = fut

    def __array__(self, dtype=None, copy=None):
        out = self._fut.result()
        if dtype is not None and out.dtype != dtype:
            out = out.astype(dtype)
        return out


class _HostStealer:
    """One-thread executor for work-stolen candidate-twin groups.
    idle() is the steal gate: at most one stolen group is ever in
    flight, so the twin's own (contention-inflated) service time
    self-limits the steal rate — if the 4 cores are already saturated
    by decode/finalize, the twin runs slow and steals become rare."""

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor
        self.ex = ThreadPoolExecutor(1)
        self._n = 0
        self._lock = threading.Lock()

    def idle(self):
        # single-submitter invariant: submit() is only called from the
        # dispatch thread, but take the lock anyway — the check is cold
        # and the invariant stays explicit if a second submitter appears
        with self._lock:
            return self._n == 0

    def submit(self, fn, *a):
        with self._lock:
            self._n += 1
        fut = self.ex.submit(fn, *a)

        def _done(_f):
            with self._lock:
                self._n -= 1
        fut.add_done_callback(_done)
        return fut

    def shutdown(self):
        self.ex.shutdown(wait=True)


class _DeviceOffload:
    """Opportunistic device offload for a HOST-engine pipeline — the
    inverse of the hybrid host-steal: when the measured auto probe
    picked the host engine (runtime.pick_engine), the accelerator sits
    idle while the host candidate search is ~30% of the serial chain
    (BENCH_STAGES.json: 8.2 of 28.6 ms/batch). Routing a bounded
    number of groups to the device's candidate-list kernel removes
    that stage for them; both engines produce bit-identical masks, so
    output is unchanged (tests/test_offload.py).

    Stall safety: the lane runs on DAEMON threads (a wedged tunnel RPC
    can never hang process exit) and dispatch+fetch complete inside
    the lane job, so the ordered finalize pipeline waits at most an
    adaptive timeout (4x the EMA group latency) before recomputing the
    group's masks with the exact native twin and discarding the late
    device result. While a lane job is wedged, the outstanding cap
    stops new offloads — a brownout degrades to plain host mode."""

    CAP = 2  # groups in flight on the device lane

    def __init__(self, asm):
        # hand-rolled daemon-thread lane, NOT ThreadPoolExecutor: TPE
        # threads are non-daemon and joined at interpreter exit, so a
        # wedged tunnel RPC inside a lane job would hang process exit
        import queue
        self.asm = asm
        self.q = queue.Queue()
        self.outstanding = []
        self.failed = set()  # futures that already timed out / raised
        self.lat = None  # EMA seconds per completed group
        self.count = 0  # batches offloaded
        self.timeouts = 0  # batches recomputed on host after timeout
        for _ in range(2):
            threading.Thread(target=self._worker, daemon=True).start()

    def _worker(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            fut, job = item
            try:
                fut.set_result(job())
            except BaseException as e:  # surfaced at fut.result()
                fut.set_exception(e)

    def room(self):
        self.outstanding = [f for f in self.outstanding
                            if not f.done()]
        return len(self.outstanding) < self.CAP

    def timeout(self):
        # generous before the first completion (the first dispatch may
        # compile); thereafter 4x the typical group round-trip
        return max(2.0, 4.0 * self.lat) if self.lat is not None \
            else 60.0

    def submit_group(self, sts):
        """One grouped device dispatch+fetch on the lane; returns one
        _OffloadView per st. _sparse_plane runs HERE on the dispatch
        thread so st mutation stays single-threaded."""
        import time as _time
        from concurrent.futures import Future
        asm = self.asm
        Lb, O = sts[0]["Lb"], sts[0]["O"]
        planes, flens, rlens = [], [], []
        for st in sts:
            st["plane_kind"] = 1
            st["cand_list"] = True
            planes.append(asm._sparse_plane(st))
            flens.append(st["batch"].flen)
            rlens.append(st["batch"].rlen)
        plane = np.concatenate(planes, axis=0)
        fl = np.concatenate(flens)
        rl = np.concatenate(rlens)
        t0 = _time.perf_counter()

        def job():
            out = asm._fused2.assemble_candidates_list_packed4(
                plane, fl, rl, L=Lb, O=O, num_kmers=asm.cfg.num_kmers)
            arr = np.asarray(out)
            dt = _time.perf_counter() - t0
            self.lat = dt if self.lat is None \
                else 0.7 * self.lat + 0.3 * dt
            return arr

        fut = Future()
        self.q.put((fut, job))
        self.outstanding.append(fut)
        views = []
        lo = 0
        for st in sts:
            views.append(_OffloadView(self, fut, lo, lo + st["B"], st))
            lo += st["B"]
        self.count += len(sts)
        return views

    def shutdown(self):
        for _ in range(2):
            self.q.put(None)
        self.asm._offload_count += self.count
        self.asm._offload_timeouts += self.timeouts


class _OffloadFailed(Exception):
    """A sibling view already declared this offload future dead."""


class _OffloadView:
    """One batch's slice of an offloaded group. Waits up to the lane's
    adaptive timeout for the device result; on timeout OR any device
    error, recomputes the batch's candidate mask with the exact native
    host twin (identical bits) and flips the st contract to mask form.
    The first failure marks the shared future dead so sibling views
    fall back immediately instead of serially re-waiting."""

    __slots__ = ("_off", "_fut", "_lo", "_hi", "_st")

    def __init__(self, off, fut, lo, hi, st):
        self._off = off
        self._fut = fut
        self._lo = lo
        self._hi = hi
        self._st = st

    def __array__(self, dtype=None, copy=None):
        off = self._off
        try:
            if self._fut in off.failed:
                raise _OffloadFailed  # siblings skip the dead wait
            # ANY failure — timeout, device RPC error, compile error,
            # OOM — degrades to the exact host recompute; only the
            # timeout leaves the (possibly still-running) job behind
            arr = self._fut.result(timeout=off.timeout())
            return arr[self._lo:self._hi]
        except Exception:
            off.failed.add(self._fut)
            off.timeouts += 1
            st = self._st
            st["cand_list"] = False
            st["hasN_rows"] = np.zeros(0, dtype=np.int64)
            st["cand_faithful"] = False
            from .io import native
            return native.cand_mask(
                st["batch"], np.arange(st["B"], dtype=np.int64),
                off.asm.cfg.num_kmers, st["O"])


class _BatchResults:
    """Columnar backing shared by one batch's NativeResult rows."""

    __slots__ = ("sids", "osc_l", "qual_l", "best_l", "ascii", "pidx",
                 "ptbl", "fo_l", "ro_l", "flen_l", "rlen_l",
                 "_ring_src", "_ring_gen")

    def __init__(self, st, r, ptbl):
        batch = st["batch"]
        self.sids = batch.sids
        # sids may be a lazy view over the decoder's RING id buffer
        # (io/native.py _LazyIds); a deferred .sid read after the ring
        # laps would silently return another batch's id — fail loudly
        # instead (same contract as BatchAssembler._check_ring)
        self._ring_src = getattr(batch, "_ring_src", None)
        self._ring_gen = getattr(batch, "_ring_gen", 0)
        self.osc_l = r["osc"].tolist()
        self.qual_l = r["quality"].tolist()
        self.best_l = r["best"].tolist()
        self.ascii = r["ascii"]
        self.pidx = r["pidx"]
        self.ptbl = ptbl
        self.fo_l = st["fo"].tolist()
        self.ro_l = st["ro"].tolist()
        self.flen_l = st["flen"].tolist()
        self.rlen_l = st["rlen"].tolist()


class NativeResult:
    """OracleResult-compatible lazy row view over the native finalize
    arrays: the batched library path hands out B of these per batch and
    most consumers read only a few fields, so nothing materializes
    until accessed (the eager per-row OracleResult build was ~3 us/row
    — the whole library-path ceiling)."""

    __slots__ = ("_v", "_b", "_nt", "_p", "_sid", "sequence")

    def __init__(self, v, b):
        self._v = v
        self._b = b
        self._nt = None
        self._p = None
        self._sid = None
        self.sequence = None

    @property
    def sid(self):
        if self._sid is None:
            v = self._v
            src = v._ring_src
            if src is not None and \
                    src._ring_i - v._ring_gen >= src._ring_n:
                raise RuntimeError(
                    "decode ring overrun: this result's id buffer was "
                    "reused — consume results within the reader's ring "
                    "window, or read .sid earlier")
            self._sid = v.sids[self._b]
        return self._sid

    @property
    def sequence_length(self):
        return self._v.osc_l[self._b][1]

    @property
    def quality(self):
        return self._v.qual_l[self._b]

    @property
    def overlap(self):
        return self._v.osc_l[self._b][0]

    @property
    def overlaps_examined(self):
        return self._v.osc_l[self._b][4]

    @property
    def overlap_mismatches(self):
        return self._v.osc_l[self._b][3]

    @property
    def degenerates(self):
        return self._v.osc_l[self._b][2]

    @property
    def estimated_overlap_probability(self):
        return self._v.best_l[self._b]

    @property
    def slow(self):
        return bool(self._v.osc_l[self._b][5] & 2)

    @property
    def forward_offset(self):
        return self._v.fo_l[self._b]

    @property
    def reverse_offset(self):
        return self._v.ro_l[self._b]

    @property
    def forward_length(self):
        return self._v.flen_l[self._b]

    @property
    def reverse_length(self):
        return self._v.rlen_l[self._b]

    @property
    def sequence_ascii(self):
        return self._v.ascii[self._b, :self.sequence_length]

    @property
    def sequence_nt(self):
        if self._nt is None:
            self._nt = IUPAC_FORWARD[self.sequence_ascii & 0x1F]
        return self._nt

    @property
    def sequence_p(self):
        if self._p is None:
            v = self._v
            self._p = v.ptbl[v.pidx[self._b, :self.sequence_length]]
        return self._p


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

    SL = 8  # device shortlist width (ops/fused2.py)

    def __init__(self, cfg: OracleConfig | None = None, L: int = 512,
                 modules=(), need_p: bool | None = None, mesh=None,
                 host_only: bool | None = None):
        # native psq_finalize stages shortlists in fixed 32-entry
        # stack buffers (and rejects SL > 32 itself); fail loudly here
        # if anyone ever widens the class constant past that bound
        assert self.SL <= 32, "shortlist width exceeds the native bound"
        self.cfg = cfg or OracleConfig()
        self.L = L
        self.modules = list(modules)
        self.counters = Counters()
        # optional jax Mesh with a "dp" axis: batches whose size divides
        # the axis are sharded across its devices (XLA partitions the
        # fused graph; host finalization is unchanged). A second "op"
        # axis > 1 additionally shards the overlap-plane ROWS via the
        # shard_map twins in parallel/shard.py (_dispatch_op).
        self.mesh = mesh
        self._op_steps = {}
        self.need_p = bool(need_p)
        # host-only candidate search, tri-state: None = decide lazily
        # at first dispatch (PANDASEQ_TPU_HOST env override, else auto:
        # skip the device when jax would run the kernel on CPU XLA —
        # the native host twin psq_cand_mask is ~40x faster there);
        # True = force host for this instance (the accelerator-vs-host
        # A/B in bench.py measures both sides in the same weather
        # window); False = pin the device path, overriding env + auto.
        self._host_only = host_only
        self.engine_info = ({"reason": "constructor"}
                            if host_only is not None else None)
        algo = self.cfg.algorithm
        name = algo.name
        self._custom = name not in ("simple_bayesian", "uparse", "pear",
                                    "rdp_mle", "ea_util", "flash",
                                    "stitch")
        if name in ("pear", "rdp_mle", "ea_util", "flash", "stitch"):
            self._algo_kind = name
        else:
            self._algo_kind = "counts"
        self._pmatch = float(getattr(algo, "pmatch", 0.0))
        self._pmismatch = float(getattr(algo, "pmismatch", 0.0))
        if name == "pear":
            lut_m = np.ascontiguousarray(QUAL_MATCH_PEAR, np.float64)
            lut_mm = np.ascontiguousarray(QUAL_MISMATCH_PEAR, np.float64)
            self._nn_term = float(-algo.random_base)
        elif name == "rdp_mle":
            # per-element (LUT - nn) like the C loop (algo_rdp_mle.c:64)
            lut_m = np.ascontiguousarray(
                QUAL_MATCH_SIMPLE_BAYESIAN - _NN, np.float64)
            lut_mm = np.ascontiguousarray(
                QUAL_MISMATCH_RDP_MLE - _NN, np.float64)
            self._nn_term = 0.0
        else:
            lut_m = lut_mm = None
            self._nn_term = 0.0
        self._lut_m, self._lut_mm = lut_m, lut_mm
        self._algo_params = dict(
            algo_id=_ALGO_IDS[self._algo_kind], pmatch=self._pmatch,
            pmismatch=self._pmismatch, qual_nn=float(_NN),
            nn_term=self._nn_term, lut_m=lut_m, lut_mm=lut_mm)
        self._cfg_params = dict(minoverlap=self.cfg.minoverlap,
                                maxoverlap=self.cfg.maxoverlap,
                                threshold=float(self.cfg.threshold))
        from .ops import fused2 as _fused2
        self._fused2 = _fused2
        from .ops.fused2 import build_ptable
        self._ptbl = np.ascontiguousarray(build_ptable(algo), np.float64)
        from .nt import result_phred
        # PHRED+33 output byte per pidx (panda_result_phred, nt.c:126-150)
        self._phtbl = np.ascontiguousarray(
            33 + result_phred(self._ptbl), np.uint8)
        self._payload_buf = None
        self._arrays_buf = None  # reused want_arrays ascii/pidx planes
        # sparse download format: candidate LIST (default, 12 B/pair)
        # vs bitmask (32 B/pair; forced by the PANDASEQ_TPU_JOIN
        # alternate-kernel opt-in, whose kernel emits masks)
        self._cand_list = not os.environ.get("PANDASEQ_TPU_JOIN")
        self._host_steals = 0  # batches work-stolen to the host twin
        self._offload_count = 0  # batches device-offloaded (host eng.)
        self._offload_timeouts = 0  # offloads recomputed after timeout

    # ------------------------------------------------------------------
    def assemble_batch(self, pairs):
        """Returns a list of (code, OracleResult|None) preserving order."""
        st = self._pre(pairs)
        dev = self._dispatch(st)
        return self._finalize(st, dev)

    def _threaded_pipeline(self, pair_batches, fin, depth: int,
                           group: int = 1):
        """Two-stage host pipeline: the main thread runs _pre/_dispatch
        (keeping ``depth`` batches in flight on the device), one FIFO
        worker thread waits for each device->host transfer and runs
        ``fin`` (so counter updates, stateful modules and output order
        stay sequential) — the reference's reader-thread + worker-pool
        overlap (async.c, pool.c) as pipeline stages. (A deeper
        fetch/finalize split measured slower on small hosts: thread
        contention outweighs the overlap.) The finally-block finalizes
        every dispatched batch even when the consumer stops iterating
        mid-stream."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(1)
        q = deque()  # (st, dev) in flight on device
        futs = deque()

        # hybrid work-steal (PANDASEQ_TPU_HYBRID: default adaptive,
        # "0" off, "force" always-steal for tests): when the finalize
        # worker is visibly behind — which on a wire-bound deployment
        # means it is blocked in a device fetch — and the twin worker
        # is idle, the next group's candidate masks are computed by
        # the exact native host twin instead of the device, so spare
        # host cores add throughput ON TOP of the saturated wire.
        hyb = os.environ.get("PANDASEQ_TPU_HYBRID", "")
        # the stealer thread is created lazily on the first steal so the
        # common case (adaptive gate never fires) spawns no extra thread
        stealer_box = [None]

        def stealer():
            if stealer_box[0] is None:
                stealer_box[0] = _HostStealer()
            return stealer_box[0]

        def route():
            if hyb == "0":
                return False
            if hyb == "force":
                return True
            s = stealer_box[0]
            return ((s is None or s.idle()) and len(futs) >= 2
                    and not futs[0].done())

        # host engine + idle accelerator: opportunistic device offload
        # (the inverse of the host steal; at most one of the two is
        # active, keyed off the resolved engine)
        offload = _DeviceOffload(self) if self._offload_enabled() \
            else None

        try:
            for st, dev in self._dispatch_stream(pair_batches, group,
                                                 route, stealer,
                                                 offload):
                q.append((st, dev))
                if len(q) > depth:
                    futs.append(ex.submit(fin, *q.popleft()))
                while len(futs) > 2:
                    yield futs.popleft().result()
            while q:
                futs.append(ex.submit(fin, *q.popleft()))
            while futs:
                yield futs.popleft().result()
        finally:
            while q:
                futs.append(ex.submit(fin, *q.popleft()))
            while futs:
                try:
                    futs.popleft().result()
                except Exception:
                    pass
            ex.shutdown(wait=True)
            if stealer_box[0] is not None:
                stealer_box[0].shutdown()
            if offload is not None:
                offload.shutdown()

    def assemble_stream(self, pair_batches, depth: int = 3,
                        threaded: bool = False, group: int = 1):
        """Pipelined driver: yields one result list per input batch,
        keeping up to ``depth`` batches in flight on the device before
        finalizing the oldest (the async-reader/pool overlap of the
        reference, async.c/pool.c, as device/host overlap). With
        ``threaded`` the transfer wait and the host finalization run on
        separate FIFO worker threads. ``group`` stacks that many
        consecutive batches into one device dispatch (_dispatch_group)
        to amortize the wire's fixed per-dispatch floor."""
        from collections import deque
        if threaded:
            def fin(st0, plane):
                return st0["pairs"], self._finalize(st0, plane)

            yield from self._threaded_pipeline(pair_batches, fin, depth,
                                               group)
            return
        q = deque()
        for st, dev in self._dispatch_stream(pair_batches, group):
            q.append((st, dev))
            if len(q) > depth:
                st0, dev0 = q.popleft()
                yield st0["pairs"], self._finalize(st0, dev0)
        while q:
            st0, dev0 = q.popleft()
            yield st0["pairs"], self._finalize(st0, dev0)

    def pre_stream(self, pair_batches):
        """Map batches through the host _pre stage (decode-side work:
        badread gates, module prechecks, primer scans, shape
        bucketing) inside the generator — wrap the result with
        io.prefetch.prefetch() to run _pre on the reader thread,
        overlapping the primer scan (the reference does it on its
        worker threads, assembler.c:262-288) with device dispatch.
        assemble_stream/emit_stream accept the resulting st dicts in
        place of raw batches."""
        for pairs in pair_batches:
            yield self._pre(pairs)

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

        flen = batch.flen.astype(np.int64)
        rlen = batch.rlen.astype(np.int64)

        badread = (flen < 2) | (rlen < 2)
        # module prechecks run after the badread gate, before primers
        # (assembler.c:259); sequential order matters (after:/before:
        # are stateful stream-position gates)
        prerej = np.zeros(B, dtype=bool)
        pre_mods = [m for m in self.modules if m.precheck is not None]
        if pre_mods:
            # module-major with an alive mask == the reference's
            # pair-major first-failure short-circuit (module.c:124-154):
            # module m sees pair b iff every earlier module passed it,
            # and stateful gates (after/before, scalar-only) still see
            # surviving pairs in stream order
            alive = ~badread
            for mod in pre_mods:
                if not alive.any():
                    break
                verdict = None
                if mod.precheck_batch is not None:
                    verdict = mod.precheck_batch(batch, alive)
                if verdict is not None:
                    rej = alive & ~np.asarray(verdict, dtype=bool)
                else:
                    rej = np.zeros(B, dtype=bool)
                    for b in np.flatnonzero(alive):
                        p_ = batch.pairs[b]
                        if not mod.precheck(p_.sid, p_.fwd_nt, p_.fwd_q,
                                            p_.flen, p_.rev_nt, p_.rev_q,
                                            p_.rlen):
                            rej[b] = True
                mod.rejected += int(rej.sum())
                alive &= ~rej
            prerej = ~badread & ~alive
        # post-primer mode aligns with zero offsets (assembler.c:285-288)
        init_fo = 0 if cfg.post_primers else cfg.forward_trim
        init_ro = 0 if cfg.post_primers else cfg.reverse_trim
        fo = np.full(B, init_fo, dtype=np.int64)
        ro = np.full(B, init_ro, dtype=np.int64)
        nofp = np.zeros(B, dtype=bool)
        norp = np.zeros(B, dtype=bool)
        if not cfg.post_primers:
            if cfg.forward_primer is not None and len(cfg.forward_primer):
                offv = self._primer_offsets(batch, True)
                nofp = (offv == 0) & ~badread & ~prerej
                fo = np.maximum(offv - 1, 0)
            if cfg.reverse_primer is not None and len(cfg.reverse_primer):
                offv = self._primer_offsets(batch, False)
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

        skip = np.zeros(B, dtype=np.uint8)
        skip[negs] = 6
        skip[norp] = 5
        skip[nofp] = 4
        skip[shortread] = 3
        skip[prerej] = 2
        skip[badread] = 1

        # shape buckets: overlap axis needs max(maxo); frame width needs
        # the batch's own max read length (>= O); 128-bucketed so the
        # jit cache stays small. O_full > O (an explicit -O beyond the
        # frame width with long reads: maxo can reach 2*MAX_LEN-3)
        # cannot be represented on the device plane — those batches
        # reroute to the host candidate twin at full mask width
        # (_dispatch's overflow branch).
        O_full = int(_bucket(max(int(maxo.max(initial=1)), 1)))
        O = int(min(self.L, O_full))
        Lb = int(min(self.L, max(
            _bucket(int(max(flen.max(initial=1), rlen.max(initial=1)))),
            O)))
        return dict(pairs=pairs, batch=batch, B=B, flen=flen, rlen=rlen,
                    fo=fo, ro=ro, badread=badread, prerej=prerej,
                    nofp=nofp, norp=norp, shortread=shortread, maxo=maxo,
                    negs=negs, skip=skip, O=O, Lb=Lb, O_full=O_full)

    def _primer_offsets(self, batch, forward: bool):
        """panda_compute_offset over the whole batch (offset.c:47-90):
        native single pass, or the numpy fallback on raw arrays."""
        cfg = self.cfg
        primer = cfg.forward_primer if forward else cfg.reverse_primer
        nt = batch.fwd_nt if forward else batch.rev_nt
        q = batch.fwd_q if forward else batch.rev_q
        lens = batch.flen if forward else batch.rlen
        from .io import native as _native
        off = _native.compute_offsets(nt, q, lens, primer,
                                      cfg.threshold, cfg.primer_penalty)
        if off is not None:
            return off
        raw = batch.raw()
        nt_r, q_r = (raw[0], raw[1]) if forward else (raw[2], raw[3])
        probs = QUAL_SCORE[np.clip(q_r, 0, 46)]
        notp = QUAL_SCORE_ERR[np.clip(q_r, 0, 46)]
        return _compute_offsets_vec(
            cfg.threshold, cfg.primer_penalty, False,
            nt_r.astype(np.int32) & 0x0F, probs, notp,
            lens.astype(np.int64), primer)

    def _sparse_mode(self):
        """(sparse, lut): whether the device ships only the k-mer
        candidate bitmask (sparse path: every built-in algorithm when
        the native finalize is available), and whether the algorithm
        scores per-base f64 LUT sums. -k 0 normally keeps the device
        shortlist (the host scan is O(maxo*L) per pair — the
        reference's own SLOW path, assembler.c:42,118,135-137), but a
        host-only run routes it through the sparse machinery too: an
        all-zero candidate mask IS the exact -k 0 state (no k-mer hits
        -> ALL_BITS_IF_NONE dense scan in psq_finalize)."""
        from .io import native as _native
        lut = self._algo_kind in ("pear", "rdp_mle")
        have = _native.get_lib() is not None and not self._custom
        sparse = have and (lut or self.cfg.num_kmers > 0)
        if have and not sparse and self._resolve_host_only():
            sparse = True
        return sparse, lut

    def _resolve_host_only(self) -> bool:
        """Engine resolution, lazy at first dispatch. Priority:
        constructor host_only > PANDASEQ_TPU_ENGINE=tpu|host > legacy
        PANDASEQ_TPU_HOST > measured auto probe (runtime.pick_engine:
        device kernel vs native twin, cached per environment — the
        deployment default must not lose to its own fallback)."""
        if self._host_only is None:
            legacy = os.environ.get("PANDASEQ_TPU_HOST")
            env = os.environ.get("PANDASEQ_TPU_ENGINE", "")
            if env in ("tpu", "host"):
                self._host_only = env == "host"
                self.engine_info = {"reason": "env"}
            elif legacy is not None:
                self._host_only = legacy not in ("0", "")
                self.engine_info = {"reason": "env-legacy"}
            elif self.mesh is not None:
                self._host_only = False  # sharded runs pin the device
                self.engine_info = {"reason": "mesh"}
            else:
                from .runtime import pick_engine
                eng, info = pick_engine(
                    num_kmers=min(max(self.cfg.num_kmers, 1), 2))
                self._host_only = eng == "host"
                self.engine_info = info
        return self._host_only

    def _offload_enabled(self) -> bool:
        """Whether the threaded pipeline may opportunistically offload
        candidate groups to the device while the HOST engine serves the
        pipeline (_DeviceOffload). OPT-IN (PANDASEQ_TPU_OFFLOAD=1, or
        =force to skip the accelerator-backend gate in tests): a
        same-window A/B on the dev tunnel measured offload LOSING
        10-40% — the tunnel's dispatch-side host CPU cost (RPC
        serialization of the upload on these 4 cores) exceeds the
        candidate-stage saving. On PCIe-attached hosts dispatch is
        near-free DMA and the lane should win; enable it there after a
        local A/B (docs/PERF.md round-5 notes). Also requires: host
        engine, the native lib, a built-in algorithm, k-mer seeding in
        the device kernel's exact range, no mesh."""
        env = os.environ.get("PANDASEQ_TPU_OFFLOAD", "")
        if env not in ("1", "force"):
            return False
        from .io import native as _native
        if (_native.get_lib() is None or self._custom
                or self.mesh is not None
                or self.cfg.num_kmers not in (1, 2)):
            return False
        if not self._resolve_host_only():
            return False  # device engine already serves the pipeline
        if env == "force":
            return True
        import jax
        return jax.default_backend() != "cpu"

    @property
    def engine(self) -> str:
        """'host' or 'tpu' — which candidate-search engine this
        assembler uses (resolving the auto probe if still pending);
        logged in the CLI's provenance lines (args.c:515-531
        analogue)."""
        return "host" if self._resolve_host_only() else "tpu"

    def _sparse_plane(self, st):
        """Host prep for the sparse path: 4-bit packed upload plane
        (2-bit k-mer codes only, 128 B/pair at Lb=256). The device
        assumes no Ns; rows flagged hasN get their masks recomputed
        exactly on host in _finalize (native psq_cand_mask).
        num_kmers >= 3 routes EVERY row through the host's faithful
        kmerseen simulation — the reference's misindexed occupancy
        check (assembler.c:94-99) drops/overwrites k-mers in a pattern
        the device's rank-based seeding cannot express."""
        from .io import native as _native
        plane, hasN = _native.pack4(st["batch"], st["Lb"])
        if self.cfg.num_kmers >= 3:
            st["hasN_rows"] = np.arange(st["B"], dtype=np.int64)
            st["cand_faithful"] = True
        else:
            st["hasN_rows"] = np.flatnonzero(hasN)
        return plane

    def _sparse_host(self, st):
        """Host-only sparse dispatch: no device — every row's candidate
        mask comes from the exact native host twin in _finalize (the
        same fixup path hasN rows always take). -k 0 needs no fixup at
        all: the zero mask is already exact (no candidates ->
        ALL_BITS_IF_NONE in psq_finalize)."""
        if self.cfg.num_kmers == 0:
            st["hasN_rows"] = np.zeros(0, dtype=np.int64)
        else:
            st["hasN_rows"] = np.arange(st["B"], dtype=np.int64)
        st["cand_faithful"] = self.cfg.num_kmers >= 3
        return np.zeros((st["B"], st["O"] // 32), dtype=np.int32)

    def _cut(self, a, Lb):
        if Lb >= self.L:
            return a
        if isinstance(a, np.ndarray):
            return np.ascontiguousarray(a[:, :Lb])
        return a[:, :Lb]

    def _dense_plane(self, st, lut):
        """Upload plane for the non-sparse (device shortlist) paths.
        ONE byte plane per dispatch: the wire charges a fixed per-array
        RPC on each non-tiny jit argument, so the LUT algorithms' three
        byte planes ship concatenated (measured -5 ms/batch vs three
        arguments); [B] scalars ride the dispatch inline."""
        batch = st["batch"]
        Lb = st["Lb"]
        if lut:
            return np.concatenate(
                [self._cut(batch.nt_packed(), Lb),
                 self._cut(batch.fwd_q, Lb),
                 self._cut(batch.rev_q, Lb)], axis=1)
        # count-based scoring needs no quality arrays on device
        return np.ascontiguousarray(self._cut(batch.nt_packed(), Lb))

    def _launch(self, sparse, lut, plane, flen, rlen, fo32, ro32, Lb, O):
        """The jit call itself on already-built host arrays."""
        cfg = self.cfg
        if sparse:
            if not self._cand_list:
                # opt-in alternate kernel: mask download via the
                # gather-free sorted join (see fused2.cand_mask_join,
                # PANDASEQ_TPU_JOIN)
                out = self._fused2.assemble_candidates_packed4(
                    plane, flen, rlen, L=Lb, O=O,
                    num_kmers=cfg.num_kmers)
            else:
                # candidate LIST download (12 B/pair vs the mask's 32):
                # the wire is half-duplex, so the smaller fetch buys
                # headline throughput; _finalize rebuilds the mask and
                # routes count > C rows through the exact host twin
                out = self._fused2.assemble_candidates_list_packed4(
                    plane, flen, rlen, L=Lb, O=O,
                    num_kmers=cfg.num_kmers)
        else:
            common = dict(
                L=Lb, O=O, SL=self.SL, minoverlap=cfg.minoverlap,
                maxoverlap=cfg.maxoverlap, num_kmers=cfg.num_kmers,
                algo_kind=self._algo_kind, pmatch=self._pmatch,
                pmismatch=self._pmismatch)
            if lut:
                out = self._fused2.assemble_shortlist_packed(
                    plane, flen, rlen, fo32, ro32, nn_term=self._nn_term,
                    lut_match=self._lut_m, lut_mismatch=self._lut_mm,
                    **common)
            else:
                out = self._fused2.assemble_shortlist_nt(
                    plane, flen, rlen, fo32, ro32, **common)
        try:  # overlap device->host copy with the next batch's compute
            out.copy_to_host_async()
        except AttributeError:
            pass
        return out

    def _overflow_host(self, st):
        """maxo exceeds the device plane width (explicit -O beyond the
        frame bucket with long reads): widen the candidate mask to
        O_full and compute it with the exact native host twin — the
        device cannot represent diagonals past O. Works for every
        algorithm: built-ins score the masked candidates exactly in
        psq_finalize; custom algorithms replay through the oracle
        (fb covers selection), with examined/SLOW derived from the
        same reference-faithful mask."""
        st["O"] = st["O_full"]
        st["plane_kind"] = 1
        return self._sparse_host(st)

    def _dispatch(self, st):
        """Stage 1: the fused device step (single dispatch;
        ops/fused2.py). Returns async device arrays — do not block."""
        cfg = self.cfg
        batch = st["batch"]
        Lb = st["Lb"]
        from .io import native as _native
        if st["O_full"] > st["O"] and _native.get_lib() is not None:
            return self._overflow_host(st)
        sparse, lut = self._sparse_mode()
        st["plane_kind"] = 1 if sparse else 0
        if sparse:
            if self._resolve_host_only():
                return self._sparse_host(st)
            plane = self._sparse_plane(st)
        use_op = False
        if self.mesh is not None:
            n_op = self.mesh.shape.get("op", 1)
            use_op = (n_op > 1 and st["O"] % n_op == 0
                      and st["B"] % self.mesh.shape.get("dp", 1) == 0)
        if sparse:
            pass  # plane already built above
        elif use_op:
            plane = None  # _dispatch_op ships the planes separately
        else:
            plane = self._dense_plane(st, lut)
        inputs = (plane, batch.flen, batch.rlen)
        if self.mesh is not None and plane is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            ndp = self.mesh.shape.get("dp", 1)
            if st["B"] % ndp == 0:
                spec = NamedSharding(self.mesh, P("dp"))
                inputs = tuple(jax.device_put(a, spec) for a in inputs)
        fo32 = st["fo"].astype(np.int32)
        ro32 = st["ro"].astype(np.int32)
        if use_op:
            return self._dispatch_op(st, batch, lambda a: self._cut(a, Lb),
                                     sparse, inputs, fo32, ro32)
        if sparse and self._cand_list:
            st["cand_list"] = True  # _launch ships the list download
        return self._launch(sparse, lut, *inputs, fo32, ro32, Lb, st["O"])

    def _dispatch_group(self, sts):
        """ONE device dispatch for a group of pre'd batches. The wire
        charges a fixed per-dispatch floor (~25-40 ms RPC on the dev
        tunnel, measured; cheaper but real over PCIe) regardless of
        size, so K stacked batches divide that floor by K. The kernels
        are batch-parallel, so stacking rows along B is bit-exact —
        each batch reads back its own row block (_SliceView). Falls
        back to per-batch dispatch when the group is heterogeneous
        (shape buckets differ) or a mesh / host-only path is active."""
        if len(sts) == 1:
            return [self._dispatch(sts[0])]
        sparse, lut = self._sparse_mode()
        if self.mesh is not None or (sparse and self._resolve_host_only()) \
                or any(st["O_full"] > st["O"] for st in sts):
            return [self._dispatch(st) for st in sts]
        key0 = (sts[0]["Lb"], sts[0]["O"])
        if any((st["Lb"], st["O"]) != key0 for st in sts):
            return [self._dispatch(st) for st in sts]
        Lb, O = key0
        planes, flens, rlens, fos, ros = [], [], [], [], []
        for st in sts:
            st["plane_kind"] = 1 if sparse else 0
            if sparse and self._cand_list:
                st["cand_list"] = True
            planes.append(self._sparse_plane(st) if sparse
                          else self._dense_plane(st, lut))
            flens.append(st["batch"].flen)
            rlens.append(st["batch"].rlen)
            fos.append(st["fo"].astype(np.int32))
            ros.append(st["ro"].astype(np.int32))
        dev = self._launch(
            sparse, lut, np.concatenate(planes, axis=0),
            np.concatenate(flens), np.concatenate(rlens),
            np.concatenate(fos), np.concatenate(ros), Lb, O)
        shared = _SharedFetch(dev)
        views = []
        lo = 0
        for st in sts:
            views.append(_SliceView(shared, lo, lo + st["B"]))
            lo += st["B"]
        return views

    def _host_route_ok(self, sts):
        """Whether a group may be work-stolen to the host candidate
        twin with bit-identical results: the sparse (candidate-mask)
        path only — psq_cand_mask IS the exactness anchor those rows
        already ride for hasN/overflow fixups. Mesh runs keep their
        sharded dispatch; host-only runs are already all-host; k=0
        stays on the device shortlist (the host scan is the
        reference's own SLOW path)."""
        if self.mesh is not None or not sts:
            return False
        if any(st["O_full"] > st["O"] for st in sts):
            return False  # the widened-mask reroute handles these
        sparse, _ = self._sparse_mode()
        return (sparse and self.cfg.num_kmers >= 1
                and not self._resolve_host_only())

    def _offload_ok(self, sts):
        """Group eligibility for the device-offload lane: sparse
        candidate contract only (k in 1..2 — enforced at enable time),
        no O-overflow reroutes, homogeneous bucket (guaranteed by the
        flush-on-bucket-change rule)."""
        return bool(sts) and not any(st["O_full"] > st["O"]
                                     for st in sts)

    def _dispatch_group_host(self, sts, stealer):
        """Work-stolen group: every row's candidate mask from the
        exact native twin (psq_cand_mask) on the stealer's thread —
        no upload, no download, the wire stays free for the device
        groups in flight. Reads the full nt planes (N bases included),
        so no hasN fixup is needed; num_kmers >= 3 uses the faithful
        kmerseen simulation, same as the device path's fixup rows."""
        from .io import native as _native
        if not hasattr(stealer, "submit"):  # lazy factory from the
            stealer = stealer()             # threaded pipeline
        k = self.cfg.num_kmers
        outs = []
        for st in sts:
            st["plane_kind"] = 1
            st["cand_list"] = False
            st["hasN_rows"] = np.zeros(0, dtype=np.int64)
            st["cand_faithful"] = k >= 3
            fut = stealer.submit(
                _native.cand_mask, st["batch"],
                np.arange(st["B"], dtype=np.int64), k, st["O"],
                st["cand_faithful"])
            outs.append(_FutureArray(fut))
            self._host_steals += 1
        return outs

    def _dispatch_stream(self, pair_batches, group: int = 1,
                         route=None, stealer=None, offload=None):
        """(st, dev) pairs in input order, dispatching up to ``group``
        consecutive same-bucket batches per device call. When ``route``
        (the hybrid steal gate) fires and the group is eligible, the
        whole group is computed by the host candidate twin instead;
        with a host engine and an ``offload`` lane, eligible groups go
        to the idle accelerator while it has room."""
        pend = []

        def flush():
            if offload is not None and offload.room() \
                    and self._offload_ok(pend):
                devs = offload.submit_group(pend)
            elif route is not None and route() \
                    and self._host_route_ok(pend):
                devs = self._dispatch_group_host(pend, stealer)
            else:
                devs = self._dispatch_group(pend)
            for item in zip(pend, devs):
                yield item
            pend.clear()

        for pairs in pair_batches:
            st = pairs if isinstance(pairs, dict) else self._pre(pairs)
            if pend and (st["Lb"], st["O"]) != (pend[0]["Lb"],
                                                pend[0]["O"]):
                yield from flush()
            pend.append(st)
            if len(pend) >= group:
                yield from flush()
        if pend:
            yield from flush()

    def _dispatch_op(self, st, batch, cut, sparse, inputs, fo32, ro32):
        """Overlap-plane-row ("op")-sharded dispatch: the engine path
        for a 2-D (dp, op) mesh. The sharded twins (parallel/shard.py)
        psum exact integer partial diagonal sums, so output is
        bit-identical to the single-chip kernels (asserted by
        dryrun_multichip and tests/test_parallel.py)."""
        from .parallel import shard as _shard
        cfg = self.cfg
        Lb, O = st["Lb"], st["O"]
        key = ("cand4" if sparse else self._algo_kind, Lb, O)
        step = self._op_steps.get(key)
        if sparse:
            if step is None:
                step = _shard.make_sharded_cand_step_packed4(
                    self.mesh, L=Lb, O=O, num_kmers=cfg.num_kmers)
                self._op_steps[key] = step
            return step(*inputs)
        if step is None:
            step = _shard.make_sharded_step(
                self.mesh, L=Lb, O=O, SL=self.SL,
                minoverlap=cfg.minoverlap, maxoverlap=cfg.maxoverlap,
                num_kmers=cfg.num_kmers, algo_kind=self._algo_kind,
                pmatch=self._pmatch, pmismatch=self._pmismatch,
                nn_term=self._nn_term, lut_match=self._lut_m,
                lut_mismatch=self._lut_mm)
            self._op_steps[key] = step
        args = _shard.shard_batch(self.mesh, (
            np.ascontiguousarray(cut(batch.nt_packed())),
            np.ascontiguousarray(cut(batch.fwd_q)),
            np.ascontiguousarray(cut(batch.rev_q)),
            batch.flen, batch.rlen, fo32, ro32))
        return step(*args)

    def _mask_from_list(self, st, lst):
        """Rebuild the [B, O//32] candidate bitmask from the device's
        first-C candidate list ([B, C+2] int16: count, C ascending
        offsets 0-padded, pad); rows whose true count exceeds C join
        the hasN fixup set, whose masks the exact native twin
        recomputes before selection."""
        from .ops.fused2 import CAND_LIST_C as C
        B = st["B"]
        W = st["O"] // 32
        lst = np.asarray(lst)
        cnt = lst[:, 0].astype(np.int32)
        mask = np.zeros((B, W), dtype=np.uint32)
        flat = mask.reshape(-1)
        rowbase = np.arange(B, dtype=np.int64) * W
        for c in range(C):
            k = lst[:, 1 + c].astype(np.int64) - 1
            v = k >= 0
            if not v.any():
                break
            kv = k[v]
            # one entry per row within a column -> distinct flat
            # indices, so the fancy-indexed |= is exact
            flat[rowbase[v] + (kv >> 5)] |= \
                np.uint32(1) << (kv & 31).astype(np.uint32)
        over = np.flatnonzero(cnt > C)
        if len(over):
            rows = st.get("hasN_rows")
            st["hasN_rows"] = over if rows is None or not len(rows) \
                else np.union1d(rows, over)
        return mask.view(np.int32)

    def _resolve_fallbacks(self, st, plane):
        """Pairs the shortlist cannot decide exactly (n_band > SL) — or
        every pair, for custom algorithms (whose plane may be a
        candidate mask of a different width) — replay through the
        numpy oracle for their selection."""
        B = st["B"]
        SL = self.SL
        fb_mask = np.zeros(B, dtype=np.uint8)
        if self._custom:
            need = np.ones(B, dtype=bool)
        else:
            need = plane[:, 2 * SL + 2] > SL  # n_band
        need = need & (st["skip"] == 0)
        fb_besto = np.zeros(B, dtype=np.int32)
        fb_aligned = np.zeros(B, dtype=np.uint8)
        fb_best = np.zeros(B, dtype=np.float64)
        cfg = self.cfg
        for b in np.flatnonzero(need):
            p = st["batch"].pairs[b]
            res, code = oracle.align(
                cfg, p.fwd_nt, p.fwd_q, int(st["flen"][b]), p.rev_nt,
                p.rev_q, int(st["rlen"][b]), int(st["fo"][b]),
                int(st["ro"][b]))
            fb_mask[b] = 1
            if code == "OK":
                fb_besto[b] = res.overlap
                fb_aligned[b] = 1
                fb_best[b] = res.estimated_overlap_probability
        return fb_mask, fb_besto, fb_aligned, fb_best

    def _check_ring(self, st):
        """Fail loudly if the decode ring lapped this batch's buffers
        while they were in flight (undersized ring for the pipeline
        depth/group/claim stride — silent data corruption otherwise)."""
        batch = st["batch"]
        src = getattr(batch, "_ring_src", None)
        if src is not None and \
                src._ring_i - batch._ring_gen >= src._ring_n:
            raise RuntimeError(
                "decode ring overrun: batch buffers were reused while "
                "still in flight (ring=%d, %d batches pulled since) — "
                "increase NativeBatchReader ring for this pipeline "
                "depth/group/claim stride"
                % (src._ring_n, src._ring_i - batch._ring_gen))

    def _finalize(self, st, dev, emit: str | None = None):
        out = self._finalize_inner(st, dev, emit)
        # after every read of the batch's (possibly ring-backed)
        # planes: native finalize/emit and the skip/fallback paths have
        # all consumed them by now
        self._check_ring(st)
        return out

    def _finalize_inner(self, st, dev, emit: str | None = None):
        from .io import native as _native
        plane = np.asarray(dev)
        if _native.get_lib() is None:
            return self._finalize_py(st, plane, emit)
        pk = st.get("plane_kind", 0)
        if pk:
            B = st["B"]
            writable = False
            if st.get("cand_list"):
                plane = self._mask_from_list(st, plane)  # fresh array
                writable = True
            rows = st.get("hasN_rows")
            if rows is not None and len(rows):
                # the 4-bit upload dropped the N planes; recompute
                # these rows' candidate masks exactly on host
                fix = _native.cand_mask(st["batch"], rows,
                                        self.cfg.num_kmers, st["O"],
                                        faithful=st.get("cand_faithful",
                                                        False))
                if not writable:
                    plane = np.array(plane)  # writable copy
                plane[rows] = fix
            if self._custom:
                # custom algorithms on the mask path (the O-overflow
                # reroute): selection replays through the oracle
                fb = self._resolve_fallbacks(st, plane)
            else:
                # sparse path: f64 selection is exact by construction —
                # no band, no oracle replay
                fb = (np.zeros(B, np.uint8), np.zeros(B, np.int32),
                      np.zeros(B, np.uint8), np.zeros(B, np.float64))
        else:
            fb = self._resolve_fallbacks(st, plane)
        fmt = 0 if emit is None else (2 if emit == "fastq" else 1)
        check_mods = [m for m in self.modules
                      if m.check is not None or m.check_batch is not None]
        if emit is not None and check_mods:
            # batched module path: reconstruct to arrays, vectorized
            # module verdicts, then the native emit-only pass
            B = st["B"]
            ab = self._arrays_buf
            if ab is None or ab[0].shape[0] < B:
                ab = (np.zeros((B, 928), dtype=np.uint8),
                      np.zeros((B, 928), dtype=np.int16))
                self._arrays_buf = ab
            r = _native.finalize(
                st["batch"], st["skip"], st["fo"], st["ro"], plane,
                self.SL, fb, self._algo_params, self._cfg_params,
                self._ptbl, self._phtbl, 0, want_arrays=True,
                plane_kind=pk, arrays_buf=ab)
            return self._emit_with_modules(st, r, fmt)
        # no arrays_buf reuse here: _results_from_native hands out
        # views into ascii/pidx, which must outlive the next batch
        if fmt != 0:
            cap = st["B"] * (_native.ID_STRIDE + 2 * 928 + 64)
            if self._payload_buf is None \
                    or self._payload_buf.nbytes < cap:
                self._payload_buf = np.empty(cap, dtype=np.uint8)
        r = _native.finalize(
            st["batch"], st["skip"], st["fo"], st["ro"], plane, self.SL,
            fb, self._algo_params, self._cfg_params, self._ptbl,
            self._phtbl, fmt, want_arrays=(fmt == 0),
            payload_buf=self._payload_buf, plane_kind=pk)
        if emit is not None:
            return self._emit_from_native(st, r, emit)
        return self._results_from_native(st, r)

    def _emit_with_modules(self, st, r, fmt):
        """Emit fast path with vectorized filter modules: threshold
        (assembler.c:334) then module checks in chain order
        (assembler.c:339, first rejection wins, per-module rejected
        tallies) computed as batch masks; payload via psq_emit."""
        from .io import native as _native
        c = self.counters
        codes = r["codes"]
        osc = r["osc"]
        B = len(codes)
        slow_n = int(((osc[:, 5] & 2) != 0).sum())
        c.slow += slow_n
        c.badread += int((codes == 1).sum())
        c.nofp += int((codes == 3).sum())
        c.norp += int((codes == 4).sum())
        noalgn = int((codes == 5).sum())
        recon_ok = codes == 0
        lowq = recon_ok & (r["quality"] < self.cfg.threshold)
        c.lowq += int(lowq.sum())
        sel = recon_ok & ~lowq
        view = ResultBatchView(st, r, self._ptbl)
        module_rej = np.zeros(B, dtype=bool)
        for mod in self.modules:
            if mod.check_batch is None:
                continue
            ok_mask = np.asarray(mod.check_batch(view, sel))
            rej = sel & ~ok_mask
            nrej = int(rej.sum())
            if nrej:
                mod.rejected += nrej
                module_rej |= rej
                sel = sel & ok_mask
        c.noalgn += noalgn
        n_ok = int(sel.sum())
        c.ok += n_ok
        hist = np.bincount(osc[sel, 0], minlength=1)
        for o in np.flatnonzero(hist):
            c.overlaps[int(o)] = c.overlaps.get(int(o), 0) + int(hist[o])
        cap = B * (416 + 2 * 928 + 64)
        if self._payload_buf is None or self._payload_buf.nbytes < cap:
            self._payload_buf = np.empty(cap, dtype=np.uint8)
        payload = _native.emit(
            r["ascii"], r["pidx"], osc[:, 1], r["quality"],
            sel.view(np.uint8), st["batch"].ids_bytes(), self._phtbl,
            fmt, payload_buf=self._payload_buf)
        out = [_OK_TUPLE] * B
        sids = st["batch"].sids
        nonok_rows = np.flatnonzero(~sel)
        for b in nonok_rows:
            if module_rej[b]:
                out[b] = ("MODULE", None)
            elif lowq[b]:
                res = OracleResult()
                res.quality = float(r["quality"][b])
                res.sid = sids[b]
                out[b] = ("LOWQ", res)
            else:
                out[b] = (_CODE_NAMES[codes[b]], None)
        cc = np.array([n_ok, int(lowq.sum()), noalgn,
                       int((codes == 1).sum()), int((codes == 3).sum()),
                       int((codes == 4).sum()), slow_n], dtype=np.int64)
        hist_full = np.zeros(1024, dtype=np.int64)
        hist_full[:len(hist)] = hist
        extras = dict(scored=(osc[:, 5] & 1) != 0,
                      overlap=osc[:, 0].astype(np.int64),
                      counters_delta=cc, hist_delta=hist_full,
                      nonok_rows=nonok_rows)
        return out, payload, extras

    def _emit_from_native(self, st, r, emit):
        """Fast path: counters + payload straight from psq_finalize."""
        c = self.counters
        cc = r["counters"]
        c.ok += int(cc[0])
        c.lowq += int(cc[1])
        c.noalgn += int(cc[2])
        c.badread += int(cc[3])
        c.nofp += int(cc[4])
        c.norp += int(cc[5])
        c.slow += int(cc[6])
        hist = r["hist"]
        for o in np.flatnonzero(hist):
            c.overlaps[int(o)] = c.overlaps.get(int(o), 0) + int(hist[o])
        codes = r["codes"]
        osc = r["osc"]
        # OK rows share one tuple; only the rare non-OK rows get
        # per-record Python objects (the loop over 8192 rows was ~3 ms)
        out = [_OK_TUPLE] * len(codes)
        sids = st["batch"].sids
        nonok_rows = np.flatnonzero(codes)
        for b in nonok_rows:
            cd = codes[b]
            res = None
            if cd == 6:  # LOWQ: logger needs quality + sid
                res = OracleResult()
                res.quality = float(r["quality"][b])
                res.sid = sids[b]
            out[b] = (_CODE_NAMES[cd], res)
        extras = dict(scored=(osc[:, 5] & 1) != 0,
                      overlap=osc[:, 0].astype(np.int64),
                      # per-batch deltas for per-thread STAT attribution
                      # (pool.c:83-104 prints each assembler's tallies)
                      counters_delta=cc.copy(), hist_delta=hist,
                      nonok_rows=nonok_rows)
        return out, r["payload"], extras

    def _results_from_native(self, st, r):
        """General (library) path: lazy columnar NativeResult views +
        vectorized threshold/module verdicts and counter updates
        (assembler.c:301-348 semantics). post_primers configs and
        scalar-check custom modules keep the eager per-row loop — both
        may mutate result fields in place, which the lazy views don't
        support."""
        if self.cfg.post_primers or any(
                m.check is not None and m.check_batch is None
                for m in self.modules):
            return self._results_from_native_eager(st, r)
        c = self.counters
        codes = r["codes"]
        osc = r["osc"]
        B = len(codes)
        c.slow += int(((osc[:, 5] & 2) != 0).sum())
        c.badread += int((codes == 1).sum())
        c.nofp += int((codes == 3).sum())
        c.norp += int((codes == 4).sum())
        c.noalgn += int((codes == 5).sum())
        recon_ok = codes == 0
        lowq = recon_ok & (r["quality"] < self.cfg.threshold)
        c.lowq += int(lowq.sum())
        sel = recon_ok & ~lowq
        rows = _BatchResults(st, r, self._ptbl)
        # module check chain (assembler.c:339): module-major with an
        # alive mask == the reference's pair-major first-failure
        # short-circuit; vectorized check_batch when the module has
        # one, scalar check over lazy rows otherwise
        module_rej = np.zeros(B, dtype=bool)
        bview = None
        for mod in self.modules:
            if not sel.any():
                break
            if mod.check_batch is None:  # precheck-only module
                continue
            if bview is None:
                bview = ResultBatchView(st, r, self._ptbl)
            ok_mask = np.asarray(mod.check_batch(bview, sel))
            rej = sel & ~ok_mask
            nrej = int(rej.sum())
            if nrej:
                mod.rejected += nrej
                module_rej |= rej
                sel &= ~rej
        n_ok = int(sel.sum())
        c.ok += n_ok
        if n_ok:
            hist = np.bincount(osc[sel, 0], minlength=1)
            for o in np.flatnonzero(hist):
                c.overlaps[int(o)] = c.overlaps.get(int(o), 0) \
                    + int(hist[o])
        out = [(None, None)] * B
        sel_l = sel.tolist()
        codes_l = codes.tolist()
        lowq_l = lowq.tolist()
        modrej_l = module_rej.tolist()
        scored = (osc[:, 5] & 1).tolist()
        names = _CODE_NAMES
        for b in range(B):
            if sel_l[b]:
                out[b] = ("OK", NativeResult(rows, b))
            elif modrej_l[b]:
                out[b] = ("MODULE", NativeResult(rows, b))
            elif lowq_l[b]:
                out[b] = ("LOWQ", NativeResult(rows, b))
            else:
                cd = codes_l[b]
                if cd == 5 and scored[b]:
                    # align ran: a BESTOLP line (possibly -1) is due
                    # (assembler.c:139 precedes the early-outs)
                    out[b] = ("NOALGN", NativeResult(rows, b))
                else:
                    out[b] = (names[cd], None)
        return out

    def _results_from_native_eager(self, st, r):
        """Eager per-row OracleResult build + post primers / threshold /
        filter modules in order (assembler.c:301-348) — the post_primers
        path, which truncates result fields in place."""
        c = self.counters
        codes = r["codes"]
        osc = r["osc"]
        B = len(codes)
        out = [(None, None)] * B
        batch = st["batch"]
        # plain-int views: numpy scalar indexing costs ~100 ns/read and
        # this loop touches ~10 fields per pair
        codes_l = codes.tolist()
        osc_l = osc.tolist()
        qual_l = r["quality"].tolist()
        best_l = r["best"].tolist()
        fo_l = st["fo"].tolist()
        ro_l = st["ro"].tolist()
        flen_l = st["flen"].tolist()
        rlen_l = st["rlen"].tolist()
        ascii_a = r["ascii"]
        pidx_a = r["pidx"]
        ptbl = self._ptbl
        sids = batch.sids
        # -a: one vectorized primer scan per batch (the scalar
        # per-pair oracle loop measured < 330 pairs/s at 196k scale)
        post_pre = self._post_primer_offsets_batch(r) \
            if self.cfg.post_primers else None
        for b in range(B):
            cd = codes_l[b]
            ob = osc_l[b]
            if ob[5] & 2:
                c.slow += 1
            if cd == 1:
                out[b] = ("BADR", None)
                c.badread += 1
                continue
            if cd == 2:  # precheck reject: no STAT counter
                out[b] = ("MODULE", None)
                continue
            if cd == 3:
                out[b] = ("NOFP", None)
                c.nofp += 1
                continue
            if cd == 4:
                out[b] = ("NORP", None)
                c.norp += 1
                continue
            if cd == 5:
                res = None
                if ob[5] & 1:
                    # align ran: a BESTOLP line (possibly -1) is due,
                    # mirroring oracle.assemble's NOALGN-with-result
                    # return (assembler.c:139 precedes the early-outs)
                    res = OracleResult()
                    res.sid = sids[b]
                    res.overlap = ob[0]
                    res.overlaps_examined = ob[4]
                    res.slow = bool(ob[5] & 2)
                out[b] = ("NOALGN", res)
                c.noalgn += 1
                continue
            n = ob[1]
            res = OracleResult()
            res.sid = sids[b]
            res.sequence_ascii = ascii_a[b, :n]
            # sequence_nt / sequence_p materialize lazily on first
            # access (OracleResult properties) from these views
            res._pidx = pidx_a[b, :n]
            res._ptbl = ptbl
            res.sequence_length = n
            res.quality = qual_l[b]
            res.overlap = ob[0]
            res.overlaps_examined = ob[4]
            res.overlap_mismatches = ob[3]
            res.degenerates = ob[2]
            res.estimated_overlap_probability = best_l[b]
            res.slow = bool(ob[5] & 2)
            res.forward_offset = fo_l[b]
            res.reverse_offset = ro_l[b]
            res.forward_length = flen_l[b]
            res.reverse_length = rlen_l[b]

            code = self._post_primers_and_threshold(res, post_pre, b)
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
            c.ok += 1
            c.record_overlap(res.overlap)
            out[b] = ("OK", res)
        return out

    def _finalize_py(self, st, plane, emit):
        """Pure-python fallback (no native library): replay every
        non-skipped pair through the exact numpy oracle."""
        cfg = self.cfg
        c = self.counters
        B = st["B"]
        out = [(None, None)] * B
        batch = st["batch"]
        payload = bytearray()
        scored = np.zeros(B, dtype=bool)
        overlaps = np.zeros(B, dtype=np.int64)
        from .io import output as out_mod
        for b in range(B):
            sk = st["skip"][b]
            if sk in (1, 3):
                out[b] = ("BADR", None)
                c.badread += 1
                continue
            if sk == 2:
                out[b] = ("MODULE", None)
                continue
            if sk == 4:
                out[b] = ("NOFP", None)
                c.nofp += 1
                continue
            if sk == 5:
                out[b] = ("NORP", None)
                c.norp += 1
                continue
            if sk == 6:
                out[b] = ("NOALGN", None)
                c.noalgn += 1
                continue
            p = batch.pairs[b]
            res, code = oracle.align(
                cfg, p.fwd_nt, p.fwd_q, int(st["flen"][b]), p.rev_nt,
                p.rev_q, int(st["rlen"][b]), int(st["fo"][b]),
                int(st["ro"][b]))
            if res is not None and res.slow:
                c.slow += 1
            if res is not None:
                # BESTOLP is due for every align-attempted pair, even
                # bestoverlap == -1 (assembler.c:139 precedes the early
                # returns); res.overlap carries -1 in that case
                scored[b] = True
                overlaps[b] = res.overlap
            if code != "OK" or res.sequence_length + 1 > 2 * \
                    oracle.MAX_LEN:
                out[b] = ("NOALGN", res)
                c.noalgn += 1
                continue

            res.sid = batch.sids[b]
            res.forward_offset = int(st["fo"][b])
            res.reverse_offset = int(st["ro"][b])
            res.forward_length = int(st["flen"][b])
            res.reverse_length = int(st["rlen"][b])
            if emit is not None:
                if res.quality < cfg.threshold:
                    c.lowq += 1
                    out[b] = ("LOWQ", res)
                    continue
                keep = True
                for mod in self.modules:  # check chain (assembler.c:339)
                    if mod.check is not None and not mod.check(res):
                        mod.rejected += 1
                        keep = False
                        break
                if not keep:
                    out[b] = ("MODULE", res)
                    continue
                c.ok += 1
                c.record_overlap(res.overlap)
                payload += (out_mod.format_fastq(res) if emit == "fastq"
                            else out_mod.format_fasta(res))
                out[b] = ("OK", None)
                continue
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
            c.ok += 1
            c.record_overlap(res.overlap)
            out[b] = ("OK", res)
        if emit is not None:
            return out, bytes(payload), dict(scored=scored,
                                             overlap=overlaps)
        return out

    def emit_stream(self, pair_batches, fmt: str = "fasta",
                    depth: int = 4, with_extras: bool = False,
                    threaded: bool = False, group: int = 1):
        """Pipelined fast path yielding (pairs, codes, payload_bytes[,
        extras]) per batch. Requires pre-assembly primers; filter
        modules are allowed when every check-stage module has a
        vectorized ``check_batch`` (all built-ins do).

        With ``threaded`` the host finalization runs on one worker
        thread (FIFO, so counter updates and batch order stay
        sequential) overlapping the next batch's dispatch/transfer —
        the pool.c worker/reader overlap, host-side. ``group`` stacks
        that many consecutive batches into one device dispatch."""
        assert not self.cfg.post_primers
        assert all(m.check is None or m.check_batch is not None
                   for m in self.modules)
        from collections import deque

        def fin(st0, dev0):
            codes, payload, extras = self._finalize(st0, dev0, emit=fmt)
            if with_extras:
                return st0["pairs"], codes, payload, extras
            return st0["pairs"], codes, payload

        if threaded:
            yield from self._threaded_pipeline(pair_batches, fin, depth,
                                               group)
            return
        q = deque()
        for st, dev in self._dispatch_stream(pair_batches, group):
            q.append((st, dev))
            if len(q) > depth:
                yield fin(*q.popleft())
        while q:
            yield fin(*q.popleft())

    def _post_primer_offsets_batch(self, r):
        """Batched panda_compute_offset_result (offset.c:124-133) over
        the reconstructed merged sequences: one vectorized scan per
        primer per BATCH instead of a per-pair python loop — a 196k-pair
        `-a` run measured < 330 pairs/s on the scalar path (round-5
        sweep timeout), this pass restores batch rate. Exactly the
        scalar math: nt from the ascii plane, per-base log probs from
        the ptbl gather, notprobs via the faithful log1mexp NaN quirk
        (offset.c:35-38 — negative log-probs make log(-expm1(-p)) NaN,
        so -a only accepts alignments where every non-N primer base
        matches; oracle.log1mexp docstring). Rows the per-pair loop
        rejects before primers are computed too — harmlessly, their
        offsets are never read. Returns (fwd_offsets|None,
        rev_offsets|None) or None when no primer is configured."""
        cfg = self.cfg
        fwd, rev = cfg.forward_primer, cfg.reverse_primer
        need_f = fwd is not None and len(fwd) > 0
        need_r = rev is not None and len(rev) > 0
        if not (need_f or need_r):
            return None
        seq_len = r["osc"][:, 1].astype(np.int64)
        # trim the scan width to the batch's longest merged sequence:
        # the planes are L2cap=928 wide but merged reads are ~2x250,
        # and the f64 gather + plen shifted adds dominate this pass
        Smax = max(int(seq_len.max(initial=0)), 1)
        nt = IUPAC_FORWARD[r["ascii"][:, :Smax] & 0x1F]
        probs = self._ptbl[r["pidx"][:, :Smax]]
        with np.errstate(invalid="ignore", divide="ignore",
                         over="ignore"):
            # vectorized oracle.log1mexp: both branches computed with
            # the same scalar functions, selected elementwise
            notprobs = np.where(probs > math.log(2),
                                np.log1p(-np.exp(-probs)),
                                np.log(-np.expm1(-probs)))
        fo = _compute_offsets_vec(cfg.threshold, cfg.primer_penalty,
                                  False, nt, probs, notprobs, seq_len,
                                  fwd) if need_f else None
        ro = _compute_offsets_vec(cfg.threshold, cfg.primer_penalty,
                                  True, nt, probs, notprobs, seq_len,
                                  rev) if need_r else None
        return fo, ro

    def _post_primers_and_threshold(self, res, pre=None, b=0):
        """pre: optional (fwd_offsets, rev_offsets) arrays from
        _post_primer_offsets_batch — row ``b`` replaces the scalar
        oracle calls bit-for-bit."""
        cfg = self.cfg
        if cfg.post_primers:
            if cfg.forward_primer is not None and len(cfg.forward_primer):
                off = int(pre[0][b]) if pre is not None else \
                    oracle.compute_offset_result(
                        cfg.threshold, cfg.primer_penalty, False,
                        res.sequence_nt, res.sequence_p,
                        res.sequence_length, cfg.forward_primer)
                if off == 0:
                    self.counters.nofp += 1
                    return "NOFP"
                res.forward_offset = off - 1
            else:
                res.forward_offset = cfg.forward_trim
            if cfg.reverse_primer is not None and len(cfg.reverse_primer):
                off = int(pre[1][b]) if pre is not None else \
                    oracle.compute_offset_result(
                        cfg.threshold, cfg.primer_penalty, True,
                        res.sequence_nt, res.sequence_p,
                        res.sequence_length, cfg.reverse_primer)
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
