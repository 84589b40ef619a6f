"""CLI input-mode parity: PHRED+64 (-6) and separate index reads (-i)."""

import os
import subprocess
import sys

from tests.test_oracle_golden import F1, F2, REF_BIN, ROOT, _ensure_ref

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)


def run_cli(args):
    return subprocess.run(
        [sys.executable, "-m", "pandaseq_tpu.cli.main", *args],
        capture_output=True, env=ENV, cwd=ROOT, timeout=400)


def run_ref(args):
    _ensure_ref()
    return subprocess.run([REF_BIN, "-T", "1", *args], capture_output=True)


def _write_phred64(src, dst):
    with open(src) as fin, open(dst, "w") as fout:
        for n, line in enumerate(fin):
            if n % 4 == 3:
                line = "".join(chr(ord(c) + 31) for c in line.rstrip()) \
                    + "\n"
            fout.write(line)


def test_phred64(tmp_path):
    f1 = tmp_path / "p64_1.fastq"
    f2 = tmp_path / "p64_2.fastq"
    _write_phred64(F1, str(f1))
    _write_phred64(F2, str(f2))
    args = ["-6", "-f", str(f1), "-r", str(f2)]
    ref = run_ref(args)
    got = run_cli(args)
    assert got.stdout == ref.stdout
    assert got.stdout  # non-empty


def test_index_reads(tmp_path):
    # index file: one barcode read per pair, same headers as forward
    idx = tmp_path / "index.fastq"
    tags = []
    with open(F1) as fin, open(idx, "w") as fout:
        for n, line in enumerate(fin):
            if n % 4 == 0:
                tag = "ACGT" if (n // 4) % 2 == 0 else "TTGG"
                tags.append(tag)
                fout.write(line)
                fout.write(tag + "\n+\n" + "I" * len(tag) + "\n")
    args = ["-f", F1, "-r", F2, "-i", str(idx)]
    ref = run_ref(args)
    got = run_cli(args)
    assert got.stdout == ref.stdout
    # tags really come from the index read
    assert b":ACGT;" in got.stdout or b":TTGG;" in got.stdout
