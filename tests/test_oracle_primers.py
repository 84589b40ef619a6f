"""Golden tests for primer location/stripping (-p/-q), trim counts, and
post-assembly primer mode (-a) against the C reference binary."""

import os
import subprocess

import numpy as np
import pytest

from tests.test_oracle_golden import _diff_head, _ensure_ref, REF_BIN, ROOT

DATA = os.path.join(ROOT, "tests", "data")
P1 = os.path.join(DATA, "primer_1.fastq")
P2 = os.path.join(DATA, "primer_2.fastq")
FWD_PRIMER = "GTGCCAGCMGCCGCGGTAA"
REV_PRIMER = "GGACTACHVGGGTWTCTAAT"


def _ensure_primer_data():
    _ensure_ref()
    if not os.path.exists(P1):
        subprocess.run(
            ["python", os.path.join(ROOT, "tests", "golden", "make_data.py"),
             "--out-prefix", os.path.join(DATA, "primer"),
             "--fwd-primer", FWD_PRIMER, "--rev-primer", REV_PRIMER,
             "--pairs", "150", "--seed", "7"], check=True, cwd=ROOT)


def ref_output(extra_args=()):
    _ensure_primer_data()
    out = subprocess.run([REF_BIN, "-T", "1", "-f", P1, "-r", P2,
                          *extra_args],
                         capture_output=True, check=False)
    return out.stdout


def oracle_output(**cfg_kw):
    from pandaseq_tpu import oracle
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod

    cfg = oracle.OracleConfig()
    for k, v in cfg_kw.items():
        setattr(cfg, k, v)
    chunks = []
    reader = fq.read_pairs(P1, P2, policy="PRESENT")
    while True:
        try:
            pair = next(reader)
        except (StopIteration, fq.StreamError):
            break
        res, code = oracle.assemble(cfg, pair)
        if code == "OK":
            chunks.append(out_mod.format_fasta(res))
    return b"".join(chunks)


def _nt_codes(s, complement=False):
    from pandaseq_tpu.nt import nt_from_ascii, nt_from_ascii_complement
    fn = nt_from_ascii_complement if complement else nt_from_ascii
    return fn(np.frombuffer(s.encode(), dtype=np.uint8))


def test_primers_pre():
    ref = ref_output(["-p", FWD_PRIMER, "-q", REV_PRIMER])
    got = oracle_output(forward_primer=_nt_codes(FWD_PRIMER),
                        reverse_primer=_nt_codes(REV_PRIMER, complement=True))
    assert ref.count(b">") > 100  # non-vacuous
    assert got == ref, _diff_head(ref, got)


def test_primers_post():
    ref = ref_output(["-a", "-p", FWD_PRIMER, "-q", REV_PRIMER])
    got = oracle_output(post_primers=True,
                        forward_primer=_nt_codes(FWD_PRIMER),
                        reverse_primer=_nt_codes(REV_PRIMER, complement=True))
    assert got == ref, _diff_head(ref, got)


def test_trim_counts():
    ref = ref_output(["-p", "19", "-q", "20"])
    got = oracle_output(forward_trim=19, reverse_trim=20)
    assert got == ref, _diff_head(ref, got)


def test_primer_penalty():
    ref = ref_output(["-p", FWD_PRIMER, "-q", REV_PRIMER, "-D", "0.01"])
    got = oracle_output(forward_primer=_nt_codes(FWD_PRIMER),
                        reverse_primer=_nt_codes(REV_PRIMER, complement=True),
                        primer_penalty=0.01)
    assert got == ref, _diff_head(ref, got)


def test_deep_primer_offset_negs_golden():
    """Deep primer hits (offset near the read end) must still score
    large overlaps: with -O 0 the reference REPLACES the offset-derived
    overlap bound with min(flen, rlen) (assembler.c:78-82), finds the
    true overlap, and rejects the pair post-align with NEGS -> NOALGN
    (assembler.c:145-150, 293-299). Taking min() of the two bounds
    instead silently assembled these two pairs (found at the 204,800-
    pair primers soak; byte-level regression)."""
    import subprocess
    import sys

    from tests.test_oracle_golden import REF_BIN, _ensure_ref

    _ensure_ref()
    args = ["-T", "1", "-p", "GTGCCAGCMGCCGCGGTAA",
            "-q", "GGACTACHVGGGTWTCTAAT",
            "-f", os.path.join(DATA, "negs_1.fastq"),
            "-r", os.path.join(DATA, "negs_2.fastq")]
    ref = subprocess.run([REF_BIN, *args], capture_output=True)
    got = subprocess.run(
        [sys.executable, "-m", "pandaseq_tpu.cli.main", *args],
        capture_output=True, cwd=ROOT,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert got.stdout == ref.stdout  # both empty: NOALGN x2
    assert b"STAT\tNOALGN\t2" in ref.stderr
    assert b"STAT\tNOALGN\t2" in got.stderr
