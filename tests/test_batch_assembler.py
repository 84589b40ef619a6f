"""The batched device pipeline must produce byte-identical output to the
C reference (via the oracle-validated golden files) for every algorithm."""

import numpy as np
import pytest

from tests.test_oracle_golden import (F1, F2, _diff_head, ref_output)


def batch_output(algo="simple_bayesian", fastq=False, batch_size=64,
                 cfg_kw=None):
    from pandaseq_tpu import oracle
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod

    cfg = oracle.OracleConfig(algorithm=oracle.make_algorithm(algo))
    for k, v in (cfg_kw or {}).items():
        setattr(cfg, k, v)
    asm = BatchAssembler(cfg, L=512)
    fmt = out_mod.format_fastq if fastq else out_mod.format_fasta

    pairs = []
    reader = fq.read_pairs(F1, F2, policy="PRESENT")
    while True:
        try:
            pairs.append(next(reader))
        except (StopIteration, fq.StreamError):
            break
    chunks = []
    for i in range(0, len(pairs), batch_size):
        for code, res in asm.assemble_batch(pairs[i:i + batch_size]):
            if code == "OK":
                chunks.append(fmt(res))
    return b"".join(chunks), asm.counters


@pytest.mark.parametrize("algo,flag", [
    ("simple_bayesian", None),
    ("pear", "pear"),
    ("rdp_mle", "rdp_mle"),
    ("uparse", "uparse"),
    ("stitch", "stitch"),
    ("ea_util", "ea_util"),
    ("flash", "flash"),
])
def test_batch_fasta_bit_identical(algo, flag):
    ref = ref_output(["-A", flag] if flag else [])
    got, _ = batch_output(algo)
    assert got == ref, _diff_head(ref, got)


def test_batch_fastq_bit_identical():
    ref = ref_output(["-F"])
    got, _ = batch_output(fastq=True)
    assert got == ref, _diff_head(ref, got)


def test_batch_counters_match_reference_stats():
    import re
    import subprocess
    from tests.test_oracle_golden import REF_BIN, _ensure_ref
    _ensure_ref()
    log = subprocess.run([REF_BIN, "-T", "1", "-f", F1, "-r", F2],
                         capture_output=True).stderr.decode()
    stats = dict(re.findall(r"STAT\t(\w+)\t(\d+)", log))
    _, counters = batch_output()
    assert counters.count == int(stats["READS"])
    assert counters.ok == int(stats["OK"])
    assert counters.noalgn == int(stats["NOALGN"])
    assert counters.lowq == int(stats["LOWQ"])
    assert counters.badread == int(stats["BADR"])
    assert counters.slow == int(stats["SLOW"])


def test_batch_minoverlap():
    ref = ref_output(["-o", "50"])
    got, _ = batch_output(cfg_kw={"minoverlap": 50})
    assert got == ref, _diff_head(ref, got)


def test_batch_primers_pre():
    import os
    from tests.test_oracle_primers import (FWD_PRIMER, REV_PRIMER, P1, P2,
                                           _ensure_primer_data, _nt_codes)
    from tests.test_oracle_primers import ref_output as primer_ref
    from pandaseq_tpu import oracle
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod

    _ensure_primer_data()
    ref = primer_ref(["-p", FWD_PRIMER, "-q", REV_PRIMER])
    cfg = oracle.OracleConfig(
        forward_primer=_nt_codes(FWD_PRIMER),
        reverse_primer=_nt_codes(REV_PRIMER, complement=True))
    asm = BatchAssembler(cfg, L=512)
    pairs = []
    reader = fq.read_pairs(P1, P2, policy="PRESENT")
    while True:
        try:
            pairs.append(next(reader))
        except (StopIteration, fq.StreamError):
            break
    chunks = []
    for i in range(0, len(pairs), 64):
        for code, res in asm.assemble_batch(pairs[i:i + 64]):
            if code == "OK":
                chunks.append(out_mod.format_fasta(res))
    got = b"".join(chunks)
    assert got == ref, _diff_head(ref, got)


def test_batch_primers_post():
    from tests.test_oracle_primers import (FWD_PRIMER, REV_PRIMER, P1, P2,
                                           _ensure_primer_data, _nt_codes)
    from tests.test_oracle_primers import ref_output as primer_ref
    from pandaseq_tpu import oracle
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod

    _ensure_primer_data()
    ref = primer_ref(["-a", "-p", FWD_PRIMER, "-q", REV_PRIMER])
    cfg = oracle.OracleConfig(
        post_primers=True,
        forward_primer=_nt_codes(FWD_PRIMER),
        reverse_primer=_nt_codes(REV_PRIMER, complement=True))
    asm = BatchAssembler(cfg, L=512)
    pairs = []
    reader = fq.read_pairs(P1, P2, policy="PRESENT")
    while True:
        try:
            pairs.append(next(reader))
        except (StopIteration, fq.StreamError):
            break
    chunks = []
    for i in range(0, len(pairs), 64):
        for code, res in asm.assemble_batch(pairs[i:i + 64]):
            if code == "OK":
                chunks.append(out_mod.format_fasta(res))
    got = b"".join(chunks)
    assert got == ref, _diff_head(ref, got)


def test_batch_mixed_extreme_lengths_vs_oracle():
    """The per-batch device frame width (Lb bucketing, assembler._pre)
    must not change results: batches mixing tiny and MAX_LEN reads take
    every bucket boundary, and each pair must agree with the exact f64
    oracle."""
    from pandaseq_tpu import oracle, seqid
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io.fastq import ReadPair

    rng = np.random.default_rng(99)
    lengths = [2, 3, 17, 47, 127, 128, 129, 200, 255, 256, 257,
               300, 383, 384, 449, 450, 450, 5, 450, 64]
    pairs = []
    for i, n in enumerate(lengths):
        m = int(lengths[(i * 7 + 3) % len(lengths)])
        # 1-hot A/C/G/T codes 1,2,4,8 with a shared overlap core so some
        # pairs actually merge
        core = rng.choice([1, 2, 4, 8], size=60).astype(np.int8)
        fwd = np.zeros(512, dtype=np.int8)
        rev = np.zeros(512, dtype=np.int8)
        fwd[:n] = rng.choice([1, 2, 4, 8], size=n)
        rev[:m] = rng.choice([1, 2, 4, 8], size=m)
        k = min(40, n, m)
        if k > 0:  # plant a true overlap: fwd tail == revcomp head
            fwd[n - k:n] = core[:k]
            rc = {1: 8, 2: 4, 4: 2, 8: 1}
            rev[:k] = [rc[int(x)] for x in core[:k][::-1]]
        fq = np.zeros(512, dtype=np.int8)
        rq = np.zeros(512, dtype=np.int8)
        fq[:n] = rng.integers(2, 41, n)
        rq[:m] = rng.integers(2, 41, m)
        sid = seqid.parse(
            "M00000:1:000000000-AAAAA:1:1101:%d:%d 1:N:0:1"
            % (1000 + i, 2000 + i), seqid.TAG_OPTIONAL)[1]
        pairs.append(ReadPair(sid=sid, fwd_nt=fwd, fwd_q=fq, flen=n,
                              rev_nt=rev, rev_q=rq, rlen=m))

    cfg = oracle.OracleConfig()
    asm = BatchAssembler(cfg, L=512)
    got = asm.assemble_batch(pairs)
    assert len(got) == len(pairs)
    n_ok = 0
    for pair, (code, res) in zip(pairs, got):
        want_res, want_code = oracle.align(
            cfg, pair.fwd_nt, pair.fwd_q, pair.flen,
            pair.rev_nt, pair.rev_q, pair.rlen, 0, 0)
        if want_code == "OK" and want_res.quality < cfg.threshold:
            want_code = "LOWQ"
        if code == "OK":
            n_ok += 1
            assert want_code == "OK"
            assert res.sequence_length == want_res.sequence_length
            assert np.array_equal(
                np.asarray(res.sequence_nt[:res.sequence_length]),
                np.asarray(want_res.sequence_nt[:want_res
                                                .sequence_length]))
            assert res.overlap == want_res.overlap
            assert res.quality == want_res.quality
        else:
            assert want_code != "OK", (pair.sid, code, want_code)
    assert n_ok >= 5  # the planted overlaps must merge


@pytest.mark.parametrize("algo", ["pear", "rdp_mle", "simple_bayesian",
                                  "uparse", "ea_util", "flash", "stitch"])
@pytest.mark.parametrize("cfg_kw", [{}, {"num_kmers": 0},
                                    {"maxoverlap": 80},
                                    {"minoverlap": 20}])
def test_sparse_path_matches_shortlist(algo, cfg_kw):
    """The sparse candidate-bitmask path (plane_kind=1: device ships
    only k-mer candidates, native host scores them in exact f64 — LUT
    loops for pear/rdp, integer counts for the rest) must equal the
    banded-shortlist path (plane_kind=0) result-for-result — including
    -k 0 (ALL_BITS_IF_NONE everywhere) and clamped ranges."""
    from pandaseq_tpu import oracle
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    cfg = oracle.OracleConfig(algorithm=oracle.make_algorithm(algo))
    for k, v in cfg_kw.items():
        setattr(cfg, k, v)
    pairs = []
    reader = fq.read_pairs(F1, F2, policy="PRESENT")
    while True:
        try:
            pairs.append(next(reader))
        except (StopIteration, fq.StreamError):
            break
    pairs = pairs[:96]

    asm = BatchAssembler(cfg, L=512)
    st = asm._pre(pairs)
    dev = asm._dispatch(st)
    lut = algo in ("pear", "rdp_mle")
    expect_sparse = 1 if (lut or cfg.num_kmers > 0) else 0
    assert st["plane_kind"] == expect_sparse
    if not expect_sparse:
        return  # -k 0 counts: same (shortlist) path on both sides
    sparse = asm._finalize(st, dev)

    # force the shortlist path by faking native-lib absence at dispatch
    asm2 = BatchAssembler(cfg, L=512)
    st2 = asm2._pre(pairs)
    orig = native._lib
    try:
        native._lib = None
        import unittest.mock as mock
        with mock.patch.object(native, "get_lib", return_value=None):
            dev2 = asm2._dispatch(st2)
    finally:
        native._lib = orig
    assert st2["plane_kind"] == 0
    shortlist = asm2._finalize(st2, dev2)

    assert len(sparse) == len(shortlist)
    for (c1, r1), (c2, r2) in zip(sparse, shortlist):
        assert c1 == c2
        if c1 == "OK":
            assert r1.overlap == r2.overlap
            assert r1.overlaps_examined == r2.overlaps_examined
            assert r1.sequence_length == r2.sequence_length
            np.testing.assert_array_equal(r1.sequence_nt, r2.sequence_nt)
            assert r1.estimated_overlap_probability == \
                r2.estimated_overlap_probability


def test_pyfallback_emit_applies_module_checks(monkeypatch):
    """No-native fallback: emit_stream with check-stage modules must
    apply the checks (it silently skipped them before), matching the
    native modules path's counters and payload."""
    from pandaseq_tpu import filters, oracle, stats
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable for the baseline")
    import os
    logger = stats.LogProxy(open(os.devnull, "wb"))
    reader = list(native.NativeBatchReader(F1, F2, batch=64, L=512))

    def run():
        mod = filters.load_module("completely_miss_the_point:0", logger)
        asm = BatchAssembler(oracle.OracleConfig(), L=512, modules=[mod])
        payload = b""
        for _, codes, pl in asm.emit_stream(iter(reader)):
            payload += pl
        return payload, mod.rejected, asm.counters.ok

    base_payload, base_rej, base_ok = run()
    assert base_rej > 0  # mm<=0 rejects plenty on synthetic reads
    monkeypatch.setattr(native, "get_lib", lambda: None)
    py_payload, py_rej, py_ok = run()
    assert py_payload == base_payload
    assert (py_rej, py_ok) == (base_rej, base_ok)
