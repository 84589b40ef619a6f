"""Byte-identical comparison of the numpy oracle against the C reference
binary over the synthetic regression dataset, across algorithms and output
formats.

These tests build the reference with tests/golden/build_ref.sh (cached) and
are skipped when a C toolchain is unavailable.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.path.join(ROOT, "tests", "ref_build", "pandaseq-ref")
DATA = os.path.join(ROOT, "tests", "data")
F1 = os.path.join(DATA, "synth_1.fastq")
F2 = os.path.join(DATA, "synth_2.fastq")


def _ensure_ref():
    if not os.path.exists(REF_BIN):
        subprocess.run(["bash", os.path.join(ROOT, "tests", "golden",
                                             "build_ref.sh")], check=True,
                       capture_output=True)
    if not os.path.exists(F1):
        subprocess.run([sys.executable,
                        os.path.join(ROOT, "tests", "golden", "make_data.py"),
                        "--out-prefix", os.path.join(DATA, "synth")],
                       check=True, cwd=ROOT)


def ref_output(extra_args=()):
    _ensure_ref()
    # -T 1: single-threaded so output order is deterministic (pandaseq.1
    # notes threaded order is nondeterministic) and STAT lines are global
    out = subprocess.run([REF_BIN, "-T", "1", "-f", F1, "-r", F2,
                          *extra_args],
                         capture_output=True, check=False)
    return out.stdout


def oracle_output(algo="simple_bayesian", algo_arg=None, fastq=False,
                  extra_cfg=None):
    from pandaseq_tpu import oracle
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod

    cfg = oracle.OracleConfig(algorithm=oracle.make_algorithm(algo, algo_arg))
    if extra_cfg:
        for k, v in extra_cfg.items():
            setattr(cfg, k, v)
    chunks = []
    reader = fq.read_pairs(F1, F2, policy="PRESENT")
    fmt = out_mod.format_fastq if fastq else out_mod.format_fasta
    while True:
        try:
            pair = next(reader)
        except StopIteration:
            break
        except fq.StreamError:
            break
        res, code = oracle.assemble(cfg, pair)
        if code == "OK":
            chunks.append(fmt(res))
    return b"".join(chunks)


def _diff_head(a: bytes, b: bytes, n=3):
    la, lb = a.split(b"\n"), b.split(b"\n")
    out = []
    for i, (x, y) in enumerate(zip(la, lb)):
        if x != y:
            out.append(f"line {i}:\n  ref: {x[:120]}\n  got: {y[:120]}")
            if len(out) >= n:
                break
    return "\n".join(out) or f"length ref={len(a)} got={len(b)}"


@pytest.mark.parametrize("algo,flag", [
    ("simple_bayesian", None),
    ("pear", "pear"),
    ("rdp_mle", "rdp_mle"),
    ("uparse", "uparse"),
    ("stitch", "stitch"),
    ("ea_util", "ea_util"),
    ("flash", "flash"),
])
def test_fasta_bit_identical(algo, flag):
    args = ["-A", flag] if flag else []
    ref = ref_output(args)
    got = oracle_output(algo)
    assert got == ref, _diff_head(ref, got)


def test_fastq_bit_identical():
    ref = ref_output(["-F"])
    got = oracle_output(fastq=True)
    assert got == ref, _diff_head(ref, got)


def test_threshold_09():
    ref = ref_output(["-t", "0.9"])
    import math
    got = oracle_output(extra_cfg={"threshold": math.log(0.9)})
    assert got == ref, _diff_head(ref, got)


def test_minoverlap_50():
    ref = ref_output(["-o", "50"])
    got = oracle_output(extra_cfg={"minoverlap": 50})
    assert got == ref, _diff_head(ref, got)
