"""Hybrid work-steal equivalence: routing a group's candidate masks to
the exact native host twin (PANDASEQ_TPU_HYBRID) instead of the device
is a pure transport change — every payload byte, code and counter must
match the device path, because psq_cand_mask is the same exactness
anchor the hasN/overflow fixup rows already ride
(assembler.c:84-118 candidate search semantics either way).
"""

import os

import numpy as np
import pytest

from pandaseq_tpu import oracle
from pandaseq_tpu.assembler import BatchAssembler
from pandaseq_tpu.io import native

DATA = os.path.join(os.path.dirname(__file__), "data")


def _run(hybrid, cfg=None, fmt="fasta", batch=384, group=2):
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    os.environ["PANDASEQ_TPU_HYBRID"] = hybrid
    try:
        asm = BatchAssembler(cfg or oracle.OracleConfig(), L=512)

        def batches():
            yield from native.NativeBatchReader(
                os.path.join(DATA, "synth_1.fastq"),
                os.path.join(DATA, "synth_2.fastq"),
                policy="PRESENT", batch=batch, L=512)

        payload = bytearray()
        all_codes = []
        for _, codes, pay in asm.emit_stream(
                batches(), fmt=fmt, depth=4, group=group, threaded=True):
            payload += pay
            all_codes.extend(codes)
        return bytes(payload), all_codes, asm.counters, asm._host_steals
    finally:
        del os.environ["PANDASEQ_TPU_HYBRID"]


@pytest.mark.parametrize("algo,nk", [("simple_bayesian", 2),
                                     ("pear", 2),
                                     ("simple_bayesian", 1),
                                     ("rdp_mle", 3)])
def test_forced_steal_matches_device(algo, nk):
    cfg = oracle.OracleConfig(algorithm=oracle.make_algorithm(algo),
                              num_kmers=nk)
    pd, cd, ctd, sd = _run("0", cfg)
    ph, ch, cth, sh = _run("force", cfg)
    assert sd == 0 and sh > 0  # steal actually happened
    assert pd == ph
    assert cd == ch
    assert (ctd.ok, ctd.lowq, ctd.noalgn, ctd.slow, ctd.overlaps) == \
        (cth.ok, cth.lowq, cth.noalgn, cth.slow, cth.overlaps)


def test_k0_never_steals():
    # -k 0 must stay on the device shortlist (the host dense scan is
    # the reference's own SLOW path) even when forced
    cfg = oracle.OracleConfig(num_kmers=0)
    p0, c0, _, s0 = _run("0", cfg)
    pf, cf, _, sf = _run("force", cfg)
    assert sf == 0
    assert p0 == pf and c0 == cf


def test_adaptive_default_stays_exact():
    # default adaptive mode: steals may or may not fire on this host —
    # output must be identical either way
    pd, cd, ctd, _ = _run("0")
    pa, ca, cta, _ = _run("")
    assert pd == pa and cd == ca and ctd.ok == cta.ok
