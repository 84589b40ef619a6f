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
