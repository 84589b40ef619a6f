"""Golden tests: every filter module must reproduce the reference's
accept/reject set byte-for-byte (plugins are baked into the golden binary
by build_ref.sh's ltdl registry stub)."""

import io
import os
import re
import subprocess

import pytest

from tests.test_oracle_golden import (F1, F2, REF_BIN, _diff_head,
                                      _ensure_ref, ref_output)


def batch_output_mods(module_specs, cfg_kw=None):
    from pandaseq_tpu import filters, oracle, stats
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod

    logger = stats.LogProxy(io.BytesIO())
    mods = []
    for spec in module_specs:
        if callable(spec):
            mods.append(spec())
        else:
            mods.append(filters.load_module(spec, logger))
    cfg = oracle.OracleConfig()
    for k, v in (cfg_kw or {}).items():
        setattr(cfg, k, v)
    asm = BatchAssembler(cfg, L=512, modules=mods)
    pairs = []
    reader = fq.read_pairs(F1, F2, policy="PRESENT")
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
    return b"".join(chunks), asm, mods


def ref_stats(extra_args=()):
    _ensure_ref()
    log = subprocess.run([REF_BIN, "-T", "1", "-f", F1, "-r", F2,
                          *extra_args], capture_output=True).stderr.decode()
    return dict(re.findall(r"STAT\t([\w.]+)\t(\d+)$", log, re.M))


@pytest.mark.parametrize("ref_args,specs", [
    (["-C", "min_phred:20"], ["min_phred:20"]),
    (["-C", "min_overlapbits:40"], ["min_overlapbits:40"]),
    (["-C", "min_overlapbits"], ["min_overlapbits"]),
    (["-C", "completely_miss_the_point:0"],
     ["completely_miss_the_point:0"]),
    (["-C", "empty"], ["empty"]),
    (["-C", "validtag:ACGTAC"], ["validtag:ACGTAC"]),
    (["-C", "validtag:TTTTTT:GGGGGG"], ["validtag:TTTTTT:GGGGGG"]),
    (["-C", "pear_test:cutoff=0.5"], ["pear_test:cutoff=0.5"]),
    (["-C", "sample"], ["sample"]),
    (["-C", "other_primer:f:ACGTACGT"], ["other_primer:f:ACGTACGT"]),
    (["-C", "other_primer:r:ACGTACGT"], ["other_primer:r:ACGTACGT"]),
])
def test_module_bit_identical(ref_args, specs):
    ref = ref_output(ref_args)
    got, asm, mods = batch_output_mods(specs)
    assert got == ref, _diff_head(ref, got)
    stats = ref_stats(ref_args)
    assert asm.counters.ok == int(stats["OK"])
    name = specs[0].split(":")[0]
    if name in stats:
        assert mods[0].rejected == int(stats[name]), (name, stats)


def test_module_N_l_L():
    """-N / -l / -L are in-code modules (args_assembler.c:106-303)."""
    from pandaseq_tpu import filters
    ref = ref_output(["-N", "-l", "240", "-L", "470"])
    got, asm, mods = batch_output_mods(
        [filters.degenerates_module,
         lambda: filters.short_module(240),
         lambda: filters.long_module(470)])
    assert got == ref, _diff_head(ref, got)
    stats = ref_stats(["-N", "-l", "240", "-L", "470"])
    for mod, key in zip(mods, ("DEGENERATE", "SHORT", "LONG")):
        assert mod.rejected == int(stats.get(key, 0)), (key, stats)


def test_module_after_before():
    from pandaseq_tpu import seqid as seqid_mod
    with open(F1) as fh:
        headers = [line[1:].strip() for line in fh
                   if line.startswith("@M")]
    # the canonical colon-tag print form is NOT re-parseable (the
    # reference's CASAVA 1.7 branch wants the space-separated header);
    # markers must be full headers
    marker = headers[100]
    ref = ref_output(["-C", "after:%s" % marker])
    got, asm, _ = batch_output_mods(["after:%s" % marker])
    assert got == ref, _diff_head(ref, got)
    ref_b = ref_output(["-C", "before:%s" % marker])
    got_b, _, _ = batch_output_mods(["before:%s" % marker])
    assert got_b == ref_b, _diff_head(ref_b, got_b)
    assert len(got) < len(ref_output([]))
    assert len(got_b) < len(ref_output([]))


def test_module_filter_file(tmp_path):
    from pandaseq_tpu import seqid as seqid_mod
    with open(F1) as fh:
        headers = [line[1:].strip() for line in fh
                   if line.startswith("@M")]
    keep = headers[::3]
    fn = tmp_path / "ids.txt"
    fn.write_text("".join(h + "\n" for h in keep))
    ref = ref_output(["-C", "filter:%s" % fn])
    got, _, _ = batch_output_mods(["filter:%s" % fn])
    assert got == ref, _diff_head(ref, got)
    assert got  # non-empty


def test_module_overlap_stat():
    """overlap_stat histogram matches the reference's STAT EXAMINED."""
    _ensure_ref()
    log = subprocess.run([REF_BIN, "-T", "1", "-f", F1, "-r", F2, "-C",
                          "overlap_stat"], capture_output=True)
    m = re.search(rb"STAT\tEXAMINED ([\d ]+)", log.stderr)
    assert m is not None
    import io as _io
    from pandaseq_tpu import stats as stats_mod
    buf = _io.BytesIO()
    from pandaseq_tpu import filters
    logger = stats_mod.LogProxy(buf)
    got, asm, mods = batch_output_mods(
        [lambda: filters._open_overlap_stat(None, logger)])
    mods[0].destroy()
    m2 = re.search(rb"STAT\tEXAMINED ([\d ]+)", buf.getvalue())
    assert m2 is not None
    assert m2.group(1) == m.group(1)


def test_pear_test_negative_l_terminates():
    """Reference divergence (documented in PARITY.md): when
    oes <= -i (PEAR scoring, mismatches > overlap/2) the reference's
    `size_t l_i = ceil(...) - 1` underflows to ~1.8e19 and its inner
    loop effectively never terminates (plugin_pear_test.c:33-38). We
    treat l_i <= 0 as the empty sum: the product picks up a factor 0,
    the record is rejected, and both the scalar and the vectorized
    paths agree."""
    import numpy as np

    from pandaseq_tpu import filters, oracle, stats

    logger = stats.LogProxy(open(os.devnull, "wb"))
    mod = filters.load_module("pear_test", logger)

    res = oracle.OracleResult()
    res.overlap = 10
    res.overlap_mismatches = 9  # oes = 10 - 18 = -8 <= -i at i=10
    res.forward_length = 40
    res.reverse_length = 40
    assert mod.check(res) is False

    class _View:
        overlap = np.array([10])
        overlap_mismatches = np.array([9])
        forward_length = np.array([40])
        reverse_length = np.array([40])

    got = mod.check_batch(_View(), np.array([True]))
    assert got.tolist() == [False]


def test_load_module_from_file(tmp_path):
    """lt_dlopenext analogue: -C /path/to/module.py loads a user plugin
    file exporting api=3 + opener(args, logger) (the pandaxs story)."""
    from pandaseq_tpu import filters, stats

    src = tmp_path / "only_short.py"
    src.write_text(
        "from pandaseq_tpu.filters import Module\n"
        "api = 3\n"
        "def opener(args, logger):\n"
        "    lim = int(args or 100)\n"
        "    return Module('only_short',\n"
        "                  check=lambda r: r.sequence_length <= lim,\n"
        "                  args=args,\n"
        "                  check_batch=lambda v, s:\n"
        "                      v.sequence_length <= lim)\n")
    logger = stats.LogProxy(open(os.devnull, "wb"))
    mod = filters.load_module(str(src) + ":120", logger)
    assert mod.name == "only_short"

    class R:
        sequence_length = 100
    assert mod.check(R())
    R.sequence_length = 200
    assert not mod.check(R())

    # extension appended like lt_dlopenext; api mismatch rejected
    mod2 = filters.load_module(str(tmp_path / "only_short"), logger)
    assert mod2.check is not None
    bad = tmp_path / "badapi.py"
    bad.write_text("api = 2\n"
                   "def opener(a, l):\n"
                   "    return None\n")
    with pytest.raises(filters.ModuleError):
        filters.load_module(str(bad), logger)
