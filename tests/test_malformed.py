"""Malformed-input behavior must match the reference: a bad record
terminates the stream (partial output + stats), per assembler.c:356-358
treating a failed next() as end-of-stream."""

import os
import subprocess
import sys

from tests.test_oracle_golden import F1, F2, REF_BIN, ROOT, _ensure_ref

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)


def run_both(f1, f2, extra=()):
    _ensure_ref()
    ref = subprocess.run([REF_BIN, "-T", "1", "-f", f1, "-r", f2, *extra],
                         capture_output=True)
    got = subprocess.run(
        [sys.executable, "-m", "pandaseq_tpu.cli.main", "-f", f1, "-r",
         f2, *extra], capture_output=True, env=ENV, cwd=ROOT, timeout=400)
    return ref, got


def _mutate(src, dst, line_no, new_line):
    lines = open(src).readlines()
    if new_line is None:
        lines = lines[:line_no]
    else:
        lines[line_no] = new_line
    open(dst, "w").writelines(lines)


def test_bad_nt_mid_stream(tmp_path):
    f1 = str(tmp_path / "m1.fastq")
    _mutate(F1, f1, 41, "ACGTZZZACGT\n")  # record 10's sequence
    ref, got = run_both(f1, F2)
    assert got.stdout == ref.stdout  # partial output up to the bad record
    assert got.returncode == ref.returncode


def test_truncated_file(tmp_path):
    f1 = str(tmp_path / "t1.fastq")
    _mutate(F1, f1, 42, None)  # cut mid-record
    ref, got = run_both(f1, F2)
    assert got.stdout == ref.stdout
    assert got.returncode == ref.returncode


def test_not_paired(tmp_path):
    f2 = str(tmp_path / "p2.fastq")
    lines = open(F2).readlines()
    lines[40] = lines[40].replace(":2010", ":9999")
    open(f2, "w").writelines(lines)
    ref, got = run_both(F1, f2)
    assert got.stdout == ref.stdout
    assert got.returncode == ref.returncode


def test_missing_separator(tmp_path):
    f1 = str(tmp_path / "s1.fastq")
    _mutate(F1, f1, 42, "NOTPLUS\n")  # '+' line replaced
    ref, got = run_both(f1, F2)
    assert got.stdout == ref.stdout
    assert got.returncode == ref.returncode


def test_qual_length_mismatch(tmp_path):
    f1 = str(tmp_path / "q1.fastq")
    _mutate(F1, f1, 43, "III\n")
    ref, got = run_both(f1, F2)
    assert got.stdout == ref.stdout
    assert got.returncode == ref.returncode


def test_empty_inputs(tmp_path):
    e1 = tmp_path / "e1.fastq"
    e2 = tmp_path / "e2.fastq"
    e1.write_text("")
    e2.write_text("")
    ref, got = run_both(str(e1), str(e2))
    assert got.stdout == ref.stdout == b""
    assert got.returncode == ref.returncode == 1
