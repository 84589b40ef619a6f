"""Overlap-axis overflow (-O beyond the device frame bucket with long
reads): maxo can reach 2*MAX_LEN-3 = 897 while the device plane is
capped at the L=512 frame width, so candidate diagonals past 512 cannot
be represented on the device. Those batches must reroute through the
native host candidate twin at full mask width (assembler._overflow_host)
and stay byte-identical to the reference — round 3 silently dropped
those candidates (OK 255 vs the reference's 129 on this dataset).
"""

import os
import subprocess
import sys

import pytest

from tests.test_oracle_golden import REF_BIN, _ensure_ref

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)
PREFIX = os.path.join(ROOT, "tests", "data", "longo")


@pytest.fixture(scope="module")
def long_reads():
    f1 = PREFIX + "_1.fastq"
    if not os.path.exists(f1):
        subprocess.run(
            [sys.executable,
             os.path.join(ROOT, "tests", "golden", "make_data.py"),
             "--pairs", "300", "--seed", "99", "--read-len", "440",
             "--amp-min", "500", "--amp-max", "870",
             "--out-prefix", PREFIX],
            check=True, cwd=ROOT, stdout=subprocess.DEVNULL)
    return f1, PREFIX + "_2.fastq"


@pytest.mark.parametrize("extra", [
    ["-O", "850", "-o", "4"],
    ["-O", "850", "-o", "4", "-A", "pear"],
    ["-O", "850", "-o", "4", "-A", "ea_util"],
    ["-O", "897", "-k", "4"],  # faithful kmerseen + max-wide mask
])
def test_overflow_o_bit_identical(long_reads, extra):
    _ensure_ref()
    f1, f2 = long_reads
    base = ["-f", f1, "-r", f2]
    ref = subprocess.run([REF_BIN, "-T", "1", *base, *extra],
                         capture_output=True)
    got = subprocess.run(
        [sys.executable, "-m", "pandaseq_tpu.cli.main", "-T", "1",
         *base, *extra],
        capture_output=True, env=ENV, cwd=ROOT, timeout=600)
    assert got.returncode == ref.returncode
    assert len(ref.stdout) > 0  # non-vacuous
    assert got.stdout == ref.stdout


def test_overflow_o_custom_algorithm(long_reads):
    """Custom algorithms ride the mask path under overflow: selection
    replays through the oracle, reconstruction stays native. Use a
    registered custom algo that mimics simple_bayesian and compare
    against the reference's simple_bayesian output."""
    import numpy as np

    from pandaseq_tpu import algorithms, oracle
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    _ensure_ref()
    f1, f2 = long_reads
    ref = subprocess.run(
        [REF_BIN, "-T", "1", "-f", f1, "-r", f2, "-O", "850", "-o", "4"],
        capture_output=True)

    class Mimic(oracle.SimpleBayes):
        name = "mimic_sb"

    cfg = oracle.OracleConfig(algorithm=Mimic(), minoverlap=4,
                              maxoverlap=850)
    asm = BatchAssembler(cfg, L=512)
    assert asm._custom
    out = []
    for b in native.NativeBatchReader(f1, f2, policy="PRESENT",
                                      batch=128, L=512):
        st = asm._pre(b)
        assert st["O_full"] > st["Lb"]  # the overflow regime
        for code, res in asm._finalize(st, asm._dispatch(st)):
            if code == "OK":
                import math
                out.append(">%s;%f\n%s\n" % (
                    res.sid, math.exp(res.quality),
                    res.sequence_ascii.tobytes().decode()))
    assert "".join(out).encode() == ref.stdout
