"""Decode-ring overrun tripwire + heterogeneous-bucket grouping.

The ring tripwire turns a silently-corrupting misconfiguration
(pipeline holds more batches than the decode ring has slots — the
5M-pair mux run shipped ~36k wrong records before it existed) into a
hard error. Mixed shape buckets must flush dispatch groups instead of
concatenating incompatible kernels.
"""

import os

import numpy as np
import pytest

from pandaseq_tpu import oracle
from pandaseq_tpu.assembler import BatchAssembler
from pandaseq_tpu.io import native

DATA = os.path.join(os.path.dirname(__file__), "data")
F1 = os.path.join(DATA, "synth_1.fastq")
F2 = os.path.join(DATA, "synth_2.fastq")


def test_ring_overrun_raises():
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    asm = BatchAssembler(oracle.OracleConfig(), L=512)

    def batches():
        # ring=3 slots but the pipeline holds depth+group+... more
        yield from native.NativeBatchReader(F1, F2, policy="PRESENT",
                                            batch=64, L=512, ring=3)

    with pytest.raises(RuntimeError, match="ring overrun"):
        for _ in asm.emit_stream(batches(), fmt="fasta", depth=6,
                                 group=2):
            pass


def test_ring_ok_when_sized():
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    asm = BatchAssembler(oracle.OracleConfig(), L=512)

    def batches():
        yield from native.NativeBatchReader(F1, F2, policy="PRESENT",
                                            batch=64, L=512, ring=16)

    n = 0
    for _, codes, _ in asm.emit_stream(batches(), fmt="fasta", depth=6,
                                       group=2):
        n += len(codes)
    assert n > 0


def _mk_pairs(rng, n_pairs, read_len, tag):
    onehot = np.array([1, 2, 4, 8], dtype=np.int8)
    comp = {1: 8, 8: 1, 2: 4, 4: 2}

    class P:
        pass

    out = []
    for k in range(n_pairs):
        p = P()
        fwd = onehot[rng.randint(0, 4, size=read_len)]
        rev = np.empty(read_len, dtype=np.int8)
        ov = read_len // 3
        for i in range(read_len):
            rev[i] = comp[int(fwd[read_len - ov + i])] if i < ov \
                else onehot[rng.randint(0, 4)]
        p.fwd_nt = fwd
        p.rev_nt = rev[::-1].copy()
        p.fwd_q = rng.randint(2, 41, size=read_len).astype(np.int8)
        p.rev_q = rng.randint(2, 41, size=read_len).astype(np.int8)
        p.flen = read_len
        p.rlen = read_len
        p.sid = "%s%d" % (tag, k)
        out.append(p)
    return out


def test_group_mixed_buckets_flush():
    """Alternating 100bp / 250bp batches land in different (Lb, O)
    buckets; grouped dispatch must flush at each boundary and still
    match the ungrouped run exactly."""
    rng = np.random.RandomState(3)
    stream = [_mk_pairs(rng, 40, 100, "a"), _mk_pairs(rng, 40, 250, "b"),
              _mk_pairs(rng, 40, 100, "c"), _mk_pairs(rng, 40, 250, "d"),
              _mk_pairs(rng, 40, 100, "e")]

    def run(group):
        asm = BatchAssembler(oracle.OracleConfig(), L=512)
        out = []
        for _, codes, pay in asm.emit_stream(iter(stream), fmt="fasta",
                                             depth=2, group=group):
            out.append((codes, pay))
        return out, asm.counters

    o1, c1 = run(1)
    o4, c4 = run(4)
    assert o1 == o4
    assert (c1.ok, c1.noalgn, c1.lowq) == (c4.ok, c4.noalgn, c4.lowq)
    # sanity: buckets really differ across the stream
    asm = BatchAssembler(oracle.OracleConfig(), L=512)
    sts = [asm._pre(b) for b in stream[:2]]
    assert (sts[0]["Lb"], sts[0]["O"]) != (sts[1]["Lb"], sts[1]["O"])
