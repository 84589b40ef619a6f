"""pandaseq-checkid / pandaseq-hang / pandaseq-diff parity and the native
C++ decoder equivalence."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_oracle_golden import F1, F2, ROOT, _ensure_ref

REF_DIR = os.path.join(ROOT, "tests", "ref_build")
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)


def run_tool(mod, args, timeout=400):
    return subprocess.run([sys.executable, "-m", "pandaseq_tpu.cli." + mod,
                           *args], capture_output=True, env=ENV, cwd=ROOT,
                          timeout=timeout)


def run_ref_tool(binary, args):
    _ensure_ref()
    return subprocess.run([os.path.join(REF_DIR, binary), *args],
                          capture_output=True)


@pytest.mark.parametrize("header", [
    "M01271:10:000000000-A3WGH:1:1101:18786:6175 1:N:0:1",
    "M00000:7:000000000-TEST1:1:1101:10000:2000 2:N:0:ACGTAC",
    "HWUSI-EAS100R:6:73:941:1973#ACGT/1",
    "SRR014849.1 EIXKN4201CFU84.1 length=93",
    "complete garbage",
])
def test_checkid_matches_reference(header):
    ref = run_ref_tool("pandaseq-checkid-ref", [header])
    got = run_tool("checkid", [header])
    assert got.stdout == ref.stdout
    assert got.returncode == ref.returncode


def test_hang_matches_reference():
    from tests.test_oracle_primers import P1, P2, _ensure_primer_data
    _ensure_primer_data()
    args = ["-T", "1", "-f", P1, "-r", P2,
            "-P", "GGACTACHVGGGTWTCTAAT", "-Q", "GTGCCAGCMGCCGCGGTAA"]
    ref = run_ref_tool("pandaseq-hang-ref", args)
    got = run_tool("hang", args)
    assert got.stdout == ref.stdout


def test_diff_identical_configs():
    args = ["-f", F1, "-r", F2, "--", "--", "-t", "0.9"]
    ref = run_ref_tool("pandaseq-diff-ref", args)
    got = run_tool("diffcmd", args)
    assert got.stdout == ref.stdout
    assert got.returncode == ref.returncode


def test_diff_differing_configs():
    args = ["-f", F1, "-r", F2, "--", "--", "-A", "rdp_mle"]
    ref = run_ref_tool("pandaseq-diff-ref", args)
    got = run_tool("diffcmd", args)
    assert got.stdout == ref.stdout
    assert got.returncode == ref.returncode


# ---------------------------------------------------------------------
# Native decoder
# ---------------------------------------------------------------------

def test_native_decoder_matches_python():
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("native decoder unavailable")
    batches = list(native.NativeBatchReader(F1, F2, batch=64, L=512))
    pairs = list(fq.read_pairs(F1, F2, policy="PRESENT"))
    flat_idx = 0
    for b in batches:
        for i in range(len(b.sids)):
            p = pairs[flat_idx]
            v = b.pairs[i]  # raw-order view over the reversed frames
            assert str(p.sid) == str(v.sid)
            assert p.flen == v.flen and p.rlen == v.rlen
            # nt tails past the read are zeroed in the reversed layout
            # (stale nt is never read); QUAL tails keep the stale
            # persistent-buffer bytes (the PEAR quirk) verbatim
            assert np.array_equal(p.fwd_nt[:p.flen], v.fwd_nt[:p.flen])
            assert np.array_equal(p.fwd_q[:450], v.fwd_q[:450])
            assert np.array_equal(p.rev_nt[:p.rlen], v.rev_nt[:p.rlen])
            assert np.array_equal(p.rev_q[:450], v.rev_q[:450])
            flat_idx += 1
    assert flat_idx == len(pairs)


def test_native_decoder_gz(tmp_path):
    import gzip
    from pandaseq_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("native decoder unavailable")
    g1 = tmp_path / "f1.fastq.gz"
    g2 = tmp_path / "f2.fastq.gz"
    g1.write_bytes(gzip.compress(open(F1, "rb").read()))
    g2.write_bytes(gzip.compress(open(F2, "rb").read()))
    n = sum(len(b.sids) for b in
            native.NativeBatchReader(str(g1), str(g2), batch=64))
    assert n == 200


def test_native_decoder_bz2(tmp_path):
    import bz2
    from pandaseq_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("native decoder unavailable")
    b1 = tmp_path / "f1.fastq.bz2"
    b2 = tmp_path / "f2.fastq.bz2"
    b1.write_bytes(bz2.compress(open(F1, "rb").read()))
    b2.write_bytes(bz2.compress(open(F2, "rb").read()))
    n = sum(len(b.sids) for b in
            native.NativeBatchReader(str(b1), str(b2), batch=64))
    assert n == 200


def test_native_batch_through_assembler():
    """Native-decoded batches produce identical output to ReadPair lists."""
    from pandaseq_tpu import oracle
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import native
    from pandaseq_tpu.io import output as out_mod
    if native.get_lib() is None:
        pytest.skip("native decoder unavailable")

    def collect(stream):
        asm = BatchAssembler(oracle.OracleConfig(), L=512)
        outp = []
        for _, results in asm.assemble_stream(stream):
            for code, res in results:
                if code == "OK":
                    outp.append(out_mod.format_fasta(res))
        return b"".join(outp)

    got_native = collect(native.NativeBatchReader(F1, F2, batch=64, L=512))
    pairs = list(fq.read_pairs(F1, F2, policy="PRESENT"))
    got_python = collect([pairs[i:i + 64] for i in range(0, len(pairs), 64)])
    assert got_native == got_python


def test_native_decoder_header_dialects(tmp_path):
    """The C++ seqid parser must accept the same 4 dialects as Python."""
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("native decoder unavailable")
    cases = [
        ("M01271:10:000000000-A3WGH:1:1101:18786:6175 1:N:0:ACGT",
         "M01271:10:000000000-A3WGH:1:1101:18786:6175 2:N:0:ACGT"),
        ("1468:1:1:12675:1118#ATCACGA/1", "1468:1:1:12675:1118#ATCACGA/2"),
        ("MISEQ03:18:000000000-A1REG:1:1101:14774:1712#GATAGTGCCAC/1",
         "MISEQ03:18:000000000-A1REG:1:1101:14774:1712#GATAGTGCCAC/2"),
        ("SRR014849.1 EIXKN4201CFU84.1 length=93",
         "SRR014849.1 EIXKN4201CFU84.1 length=93"),
    ]
    f1 = tmp_path / "d1.fastq"
    f2 = tmp_path / "d2.fastq"
    with open(f1, "w") as a, open(f2, "w") as b:
        for h1, h2 in cases:
            a.write("@%s\nACGTACGTAC\n+\nIIIIIIIIII\n" % h1)
            b.write("@%s\nACGTACGTAC\n+\nIIIIIIIIII\n" % h2)
    n_native = sum(len(bb.sids) for bb in native.NativeBatchReader(
        str(f1), str(f2), policy="OPTIONAL", batch=16))
    n_py = 0
    reader = fq.read_pairs(str(f1), str(f2), policy="OPTIONAL")
    while True:
        try:
            next(reader)
            n_py += 1
        except (StopIteration, fq.StreamError):
            break
    assert n_native == n_py == len(cases)
