"""Grouped (mega-)dispatch equivalence: stacking K batches into one
device call (_dispatch_group) is a pure transport change — the kernels
are batch-parallel, so every output byte, code and counter must match
the per-batch dispatch, for the sparse path, the dense -k 0 shortlist
path, the LUT path, and heterogeneous tail batches.
"""

import os

import numpy as np
import pytest

from pandaseq_tpu import oracle
from pandaseq_tpu.assembler import BatchAssembler
from pandaseq_tpu.io import native

DATA = os.path.join(os.path.dirname(__file__), "data")


def _run(group, cfg=None, fmt="fasta", batch=384, host_only=None):
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    asm = BatchAssembler(cfg or oracle.OracleConfig(), L=512,
                         host_only=host_only)

    def batches():
        yield from native.NativeBatchReader(
            os.path.join(DATA, "synth_1.fastq"),
            os.path.join(DATA, "synth_2.fastq"),
            policy="PRESENT", batch=batch, L=512)

    payload = bytearray()
    all_codes = []
    for _, codes, pay in asm.emit_stream(batches(), fmt=fmt, depth=4,
                                         group=group):
        payload += pay
        all_codes.extend(codes)
    return bytes(payload), all_codes, asm.counters


@pytest.mark.parametrize("algo", ["simple_bayesian", "pear"])
def test_group_matches_single(algo):
    cfg = oracle.OracleConfig(algorithm=oracle.make_algorithm(algo))
    p1, c1, ct1 = _run(1, cfg)
    p3, c3, ct3 = _run(3, cfg)
    assert p1 == p3
    assert c1 == c3
    assert (ct1.ok, ct1.lowq, ct1.noalgn, ct1.slow, ct1.overlaps) == \
        (ct3.ok, ct3.lowq, ct3.noalgn, ct3.slow, ct3.overlaps)


def test_group_dense_k0():
    # -k 0: non-sparse device shortlist path, fo/ro concatenated too
    cfg = oracle.OracleConfig(num_kmers=0)
    p1, c1, _ = _run(1, cfg)
    p4, c4, _ = _run(4, cfg)
    assert p1 == p4 and c1 == c4


def test_group_k0_host_only_matches_device():
    # forced host-only -k 0 rides the sparse machinery with an all-zero
    # candidate mask (ALL_BITS_IF_NONE dense scan in psq_finalize) and
    # must equal the device shortlist path
    cfg = oracle.OracleConfig(num_kmers=0)
    pd, cd, ctd = _run(1, cfg)
    ph, ch, cth = _run(2, cfg, host_only=True)
    assert pd == ph and cd == ch
    assert ctd.ok == cth.ok and ctd.slow == cth.slow


def test_group_assemble_stream_threaded():
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    outs = []
    for group, threaded in ((1, False), (3, True)):
        asm = BatchAssembler(oracle.OracleConfig(), L=512)

        def batches():
            yield from native.NativeBatchReader(
                os.path.join(DATA, "synth_1.fastq"),
                os.path.join(DATA, "synth_2.fastq"),
                policy="PRESENT", batch=300, L=512)

        res = []
        for _, results in asm.assemble_stream(batches(), depth=3,
                                              threaded=threaded,
                                              group=group):
            res.extend(
                (code, None if r is None else
                 (r.sequence_length, r.overlap, round(r.quality, 12)))
                for code, r in results)
        outs.append(res)
    assert outs[0] == outs[1]


def test_low_entropy_overflow_rows_match_host():
    """Rows whose candidate count exceeds the device list width must be
    recomputed exactly on host (the hasN fixup channel): low-entropy
    poly-C reads produce dozens of candidate diagonals per pair."""
    import numpy as np

    from pandaseq_tpu import oracle
    from pandaseq_tpu.assembler import BatchAssembler

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    onehot = {"A": 1, "C": 2, "G": 4, "T": 8}
    rng = np.random.RandomState(9)

    class P:
        pass

    pairs = []
    for k in range(64):
        n = 100
        # poly-C with sparse random substitutions: highly repetitive
        fwd = np.full(n, onehot["C"], dtype=np.int8)
        rev = np.full(n, onehot["G"], dtype=np.int8)  # raw rev: comp C
        for _ in range(6):
            fwd[rng.randint(n)] = [1, 4, 8][rng.randint(3)]
            rev[rng.randint(n)] = [1, 2, 8][rng.randint(3)]
        p = P()
        p.fwd_nt, p.rev_nt = fwd, rev
        p.fwd_q = rng.randint(20, 41, size=n).astype(np.int8)
        p.rev_q = rng.randint(20, 41, size=n).astype(np.int8)
        p.flen = p.rlen = n
        p.sid = "lo%d" % k
        pairs.append(p)

    def run(host_only):
        asm = BatchAssembler(oracle.OracleConfig(), L=512,
                             host_only=host_only)
        out = []
        for _, codes, pay in asm.emit_stream(iter([pairs]), fmt="fasta",
                                             depth=1):
            out.append((codes, pay))
        return out, asm.counters

    od, cd = run(False)   # device path: list download + overflow fixup
    oh, ch = run(True)    # exact host twin end to end
    assert od == oh
    assert (cd.ok, cd.noalgn, cd.lowq, cd.slow, cd.overlaps) == \
        (ch.ok, ch.noalgn, ch.lowq, ch.slow, ch.overlaps)
