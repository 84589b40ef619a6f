"""End-to-end CLI tests: the ``pandaseq`` CLI must be byte-identical to
the reference binary on stdout and match its STAT counters."""

import os
import re
import subprocess
import sys

import pytest

from tests.test_oracle_golden import F1, F2, REF_BIN, _diff_head, _ensure_ref

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)


def run_cli(args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "pandaseq_tpu.cli.main", *args],
        capture_output=True, env=ENV, cwd=ROOT, timeout=timeout)


def run_ref(args):
    _ensure_ref()
    return subprocess.run([REF_BIN, "-T", "1", *args], capture_output=True)


BASE = ["-f", F1, "-r", F2]


@pytest.mark.parametrize("extra", [
    [],
    ["-F"],
    ["-o", "40"],
    ["-t", "0.8"],
    ["-A", "rdp_mle"],
    ["-N", "-l", "250", "-L", "460"],
    ["-C", "min_phred:10"],
])
def test_cli_stdout_bit_identical(extra):
    ref = run_ref(BASE + extra)
    got = run_cli(BASE + extra)
    assert got.stdout == ref.stdout, _diff_head(ref.stdout, got.stdout)
    assert got.returncode == ref.returncode


def test_cli_stat_counters_match():
    ref = run_ref(BASE)
    got = run_cli(BASE)
    pat = r"STAT\t(READS|NOALGN|LOWQ|BADR|SLOW|OK)\t(\d+)"
    ref_stats = dict(re.findall(pat, ref.stderr.decode()))
    got_stats = dict(re.findall(pat, got.stderr.decode()))
    assert ref_stats == got_stats
    # OVERLAPS histogram line
    ref_h = re.search(r"STAT\tOVERLAPS\t([\d ]+)", ref.stderr.decode())
    got_h = re.search(r"STAT\tOVERLAPS\t([\d ]+)", got.stderr.decode())
    assert ref_h.group(1) == got_h.group(1)


def test_cli_output_file(tmp_path):
    out = tmp_path / "out.fasta"
    ref = run_ref(BASE)
    got = run_cli(BASE + ["-w", str(out)])
    assert got.stdout == b""
    assert out.read_bytes() == ref.stdout


def test_cli_output_bz2(tmp_path):
    import bz2
    out = tmp_path / "out.fasta.bz2"
    ref = run_ref(BASE)
    run_cli(BASE + ["-W", str(out)])
    assert bz2.decompress(out.read_bytes()) == ref.stdout


def test_cli_log_file(tmp_path):
    log = tmp_path / "log.txt"
    got = run_cli(BASE + ["-g", str(log)])
    assert b"STAT\tOK" in log.read_bytes()
    assert got.returncode == 0


def test_cli_version_and_help():
    v = run_cli(["-v"])
    assert v.returncode == 1
    assert b"pandaseq" in v.stderr
    h = run_cli(["-h"])
    assert h.returncode == 1
    assert b"-A algorithm" in h.stderr
    assert b"min_phred" in h.stderr


def test_cli_missing_files():
    r = run_cli([])
    assert r.returncode == 1
    assert b"You must supply both forward and reverse reads." in r.stderr


def test_cli_unaligned_file(tmp_path):
    """-u collects NOALGN pairs exactly as the reference does."""
    fail_ref = tmp_path / "ref_unaligned.txt"
    fail_got = tmp_path / "got_unaligned.txt"
    # -o 400 forces alignment failures (overlap can never reach 400)
    extra = ["-o", "260"]
    ref = run_ref(BASE + extra + ["-u", str(fail_ref)])
    got = run_cli(BASE + extra + ["-u", str(fail_got)])
    assert fail_got.read_bytes() == fail_ref.read_bytes()
    assert got.stdout == ref.stdout


def test_cli_gzip_input(tmp_path):
    import gzip
    g1 = tmp_path / "f1.fastq.gz"
    g2 = tmp_path / "f2.fastq.gz"
    g1.write_bytes(gzip.compress(open(F1, "rb").read()))
    g2.write_bytes(gzip.compress(open(F2, "rb").read()))
    ref = run_ref(BASE)
    got = run_cli(["-f", str(g1), "-r", str(g2)])
    assert got.stdout == ref.stdout


def test_cli_bz2_input(tmp_path):
    import bz2
    b1 = tmp_path / "f1.fastq.bz2"
    b2 = tmp_path / "f2.fastq.bz2"
    b1.write_bytes(bz2.compress(open(F1, "rb").read()))
    b2.write_bytes(bz2.compress(open(F2, "rb").read()))
    ref = run_ref(BASE)
    got = run_cli(["-f", str(b1), "-r", str(b2)])
    assert got.stdout == ref.stdout


@pytest.mark.parametrize("extra", [
    ["-o", "30", "-O", "200"],
    ["-t", "0.95"],
    ["-A", "uparse:0.25"],
    ["-A", "ea_util"],
    ["-k", "4"],
    ["-k", "0"],
])
def test_cli_more_flag_combos(extra):
    ref = run_ref(BASE + extra)
    got = run_cli(BASE + extra)
    assert got.stdout == ref.stdout, _diff_head(ref.stdout, got.stdout)


def test_cli_primers_and_penalty():
    from tests.test_oracle_primers import (FWD_PRIMER, REV_PRIMER, P1, P2,
                                           _ensure_primer_data)
    _ensure_primer_data()
    base = ["-f", P1, "-r", P2]
    for extra in (["-p", FWD_PRIMER, "-q", REV_PRIMER],
                  ["-p", FWD_PRIMER, "-q", REV_PRIMER, "-D", "0.1"],
                  ["-a", "-p", FWD_PRIMER, "-q", REV_PRIMER],
                  # post-assembly primers with penalty and one-sided
                  # variants: pins the BATCHED post-primer scan
                  # (_post_primer_offsets_batch) against the reference
                  ["-a", "-p", FWD_PRIMER, "-q", REV_PRIMER, "-D",
                   "0.001"],
                  ["-a", "-q", REV_PRIMER, "-t", "0.3"],
                  ["-a", "-p", FWD_PRIMER, "-D", "0.1"],
                  ["-p", "5", "-q", "7"]):
        ref = run_ref(base + extra)
        got = run_cli(base + extra)
        assert got.stdout == ref.stdout, extra


def test_cli_module_reject_stat_line():
    import re
    got = run_cli(BASE + ["-C", "min_phred:25"])
    ref = run_ref(BASE + ["-C", "min_phred:25"])
    g = re.search(r"STAT\tmin_phred\t(\d+)", got.stderr.decode())
    r = re.search(r"STAT\tmin_phred\t(\d+)", ref.stderr.decode())
    assert g and r and g.group(1) == r.group(1)
    assert got.stdout == ref.stdout


def test_hang_skip_and_threshold():
    import os
    from tests.test_oracle_primers import P1, P2, _ensure_primer_data
    _ensure_primer_data()
    ROOT2 = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for extra in (["-s"], ["-t", "0.8"]):
        args = ["-T", "1", "-f", P1, "-r", P2,
                "-P", "GGACTACHVGGGTWTCTAAT",
                "-Q", "GTGCCAGCMGCCGCGGTAA", *extra]
        ref = subprocess.run([os.path.join(ROOT2, "tests", "ref_build",
                                           "pandaseq-hang-ref"), *args],
                             capture_output=True)
        got = subprocess.run([sys.executable, "-m",
                              "pandaseq_tpu.cli.hang", *args],
                             capture_output=True, env=ENV, cwd=ROOT2,
                             timeout=400)
        assert got.stdout == ref.stdout, extra


def test_cli_debug_streams_match_reference(tmp_path):
    """-d BSKRM per-base trace lines (FMER/RMER/OLD/BESTOLP/RECR/BUILD/
    MISM) are byte-identical to the reference, order-independent."""
    import re
    for n in (1, 2):
        lines = open([F1, F2][n - 1]).readlines()
        (tmp_path / f"d{n}.fastq").write_text("".join(lines[:12]))
    args = ["-f", str(tmp_path / "d1.fastq"),
            "-r", str(tmp_path / "d2.fastq"), "-d", "BSKRM"]
    ref = run_ref(args)
    got = run_cli(args)
    pat = re.compile(rb"(?:DBG|INFO)\t(?:FMER|RMER|OLD|BESTOLP|RECR|"
                     rb"BUILD|MISM)\t.*")
    strip = re.compile(rb"^0x[0-9a-f]+:\d+\t")
    ref_lines = sorted(strip.sub(b"", ln) for ln in ref.stderr.splitlines()
                       if pat.search(ln))
    got_lines = sorted(ln for ln in got.stderr.splitlines()
                       if pat.search(ln))
    assert ref_lines == got_lines and len(ref_lines) > 1000


def test_cli_unaligned_qual_file(tmp_path):
    """-U collects NOALGN pairs WITH quality scores (args_fastq.c:78-79,
    panda_output_fail_qual)."""
    fail_ref = tmp_path / "ref_unaligned.txt"
    fail_got = tmp_path / "got_unaligned.txt"
    extra = ["-A", "flash"]  # flash rejects most pairs -> rich fail file
    ref = run_ref(BASE + extra + ["-U", str(fail_ref)])
    got = run_cli(BASE + extra + ["-U", str(fail_got)])
    assert fail_ref.read_bytes() != b""
    assert fail_got.read_bytes() == fail_ref.read_bytes()
    assert got.stdout == ref.stdout


def test_cli_log_bz2(tmp_path):
    """-G writes a BZip2-compressed log with the same STAT schema."""
    import bz2
    log_ref = tmp_path / "ref_log.bz2"
    log_got = tmp_path / "got_log.bz2"
    ref = run_ref(BASE + ["-G", str(log_ref)])
    got = run_cli(BASE + ["-G", str(log_got)])
    assert got.stdout == ref.stdout
    def stats_of(b):
        return [l.split(b"STAT", 1)[1]
                for l in bz2.decompress(b).splitlines()
                if b"STAT" in l and b"TIME" not in l
                and b"ELAPSED" not in l]
    ref_stats = stats_of(log_ref.read_bytes())
    got_stats = stats_of(log_got.read_bytes())
    assert ref_stats and got_stats == ref_stats


def test_cli_untagged_ids_require_B(tmp_path):
    """Empty-tag headers hit BADID under the default PRESENT policy and
    pass with -B (PANDA_TAG_OPTIONAL, args_fastq.c:62-64)."""
    u1 = tmp_path / "u1.fastq"
    u2 = tmp_path / "u2.fastq"
    for src, dst in ((F1, u1), (F2, u2)):
        data = open(src, "rb").read()
        dst.write_bytes(data.replace(b":N:0:ACGTAC\n", b":N:0:\n"))
    base = ["-f", str(u1), "-r", str(u2)]
    ref = run_ref(base)
    got = run_cli(base)
    assert got.stdout == ref.stdout
    assert got.returncode == ref.returncode
    ref_b = run_ref(base + ["-B"])
    got_b = run_cli(base + ["-B"])
    assert ref_b.stdout != ref.stdout  # -B must change the outcome
    assert got_b.stdout == ref_b.stdout, _diff_head(ref_b.stdout,
                                                    got_b.stdout)
    assert got_b.returncode == ref_b.returncode


def test_cli_per_thread_stat_blocks():
    """-T 3 emits one final STAT block per virtual assembler thread
    (pool.c:83-104); per-thread tallies sum to the -T 1 totals and
    stdout stays byte-identical."""
    ref = run_ref(BASE)
    got1 = run_cli(BASE + ["-T", "1"])
    got3 = run_cli(BASE + ["-T", "3"])
    assert got3.stdout == ref.stdout
    err = got3.stderr.decode()
    oks = [int(m) for m in re.findall(r"STAT\tOK\t(\d+)", err)]
    reads = [int(m) for m in re.findall(r"STAT\tREADS\t(\d+)", err)]
    assert len(oks) == 3  # one block per virtual thread
    ok1 = int(re.search(r"STAT\tOK\t(\d+)", got1.stderr.decode()).group(1))
    assert sum(oks) == ok1
    # final READS per thread (last 3 READS lines) sum to the total
    assert sum(reads[-3:]) == 200
    assert err.count("STAT\tOVERLAPS") == 3


def test_emit_stream_early_exit_drains_counters():
    """Breaking out of emit_stream(threaded=True) mid-iteration must
    still account every dispatched batch's counters (the finally-block
    drain)."""
    import numpy as np
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq

    pairs = list(fq.read_pairs(F1, F2, policy="PRESENT"))
    batches = [pairs[i:i + 20] for i in range(0, 200, 20)]
    asm = BatchAssembler(L=512)
    n_seen = 0
    for _, codes, payload in asm.emit_stream(iter(batches), depth=2,
                                             threaded=True):
        n_seen += len(codes)
        break  # early consumer exit
    # conservation: every batch that was READ (counted in _pre) was
    # also finalized despite the break — no silently-dropped tallies
    c = asm.counters
    assert c.count > n_seen  # batches beyond the first were in flight
    total = c.ok + c.lowq + c.noalgn + c.badread + c.nofp + c.norp
    assert total == c.count


def test_stderr_line_sequence_parity():
    """The full stderr log line SEQUENCE (reject lines, BESTOLP, the
    1000-read TIME/ELAPSED/READS blocks, final STAT counters) matches
    the reference's ordering exactly — not just the counter values
    (pool.c:76-80 cadence, proxy.c line formats). Volatile fields
    (timestamps, thread ptr prefixes, process noise) are masked."""
    import re

    def norm(raw):
        out = []
        for ln in raw.decode(errors="replace").splitlines():
            if re.match(r"^[EWI]\d{4} ", ln):  # absl/XLA process noise
                continue
            ln = re.sub(r"0x[0-9a-f]+:\d+\t", "", ln)
            ln = re.sub(r"STAT\tTIME\t.*", "STAT\tTIME\t<t>", ln)
            ln = re.sub(r"STAT\tELAPSED\t\d+", "STAT\tELAPSED\t<e>", ln)
            if ln.startswith(("INFO\tVER", "INFO\tUNAME", "ARG[",
                              "INFO\tENGINE")):
                continue
            out.append(ln)
        return out

    ref = run_ref(BASE)
    got = run_cli(["-T", "1"] + BASE)
    assert norm(got.stderr) == norm(ref.stderr)


def test_kmer_table_misindex_quirk_golden():
    """-k >= 3: the reference's kmerseen occupancy check indexes
    kmerseen[(KMER << 1) + j] (hardcoded for k=2) against stores at
    kmerseen[KMER*num_kmers + j] (assembler.c:94-99), so k-mers drop /
    overwrite through other k-mers' slots. Deterministic and reproduced
    literally (oracle.candidate_mask + psq_cand_mask faithful mode,
    routed for every row when num_kmers >= 3). Surfaces with -O beyond
    the read length, where the extra/missing candidates change
    winners. (-k 1 makes the same check read PAST the table — real
    out-of-bounds UB — and is intentionally NOT reproduced.)"""
    for k in ("3", "5"):
        extra = ["-O", "300", "-k", k, "-t", "0.45", "-l", "5"]
        ref = run_ref(BASE + extra)
        got = run_cli(["-T", "1"] + BASE + extra)
        assert ref.stdout, "reference produced no output"
        assert got.stdout == ref.stdout, k


def test_setter_guard_quirks_golden():
    """The reference args layer accepts -o 1 / -O 900 (and any primer
    string), but the assembler setters silently ignore values outside
    their guards (assembler_support.c:276-295: minoverlap needs
    (1, 900), maxoverlap [0, 900); primers need len < 450) — so those
    flags leave the defaults in place. Byte-level parity on each."""
    for extra in (["-o", "1"], ["-O", "900"], ["-o", "1", "-O", "700"]):
        ref = run_ref(BASE + extra)
        got = run_cli(["-T", "1"] + BASE + extra)
        assert ref.stdout, extra
        assert got.stdout == ref.stdout, extra
