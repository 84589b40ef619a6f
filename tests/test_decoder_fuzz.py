"""Randomized decoder equivalence fuzz: the native C++ batch decoder
and the pure-Python reader must agree on every mutated stream — same
records decoded before the first error (ids, lengths, nt codes, quals)
and the same terminal error code. The golden malformed-stream scenarios
(test_malformed.py) pin the semantics against the reference binary;
this fuzz sweeps the space between them."""

import os
import random

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "tests", "data")


def _read_python(f1, f2):
    """(records, error_code) via the python reader."""
    from pandaseq_tpu.io import fastq as fq
    out = []
    err = None
    reader = fq.read_pairs(f1, f2, policy="PRESENT")
    try:
        for p in reader:
            out.append((str(p.sid), int(p.flen), int(p.rlen),
                        p.fwd_nt[:p.flen].tobytes(),
                        p.fwd_q[:p.flen].tobytes(),
                        p.rev_nt[:p.rlen].tobytes(),
                        p.rev_q[:p.rlen].tobytes()))
    except fq.StreamError as e:
        err = e.code
    return out, err


def _read_native(f1, f2):
    """(records, error_code) via the native batch decoder (raw-order
    views rebuilt from the reversed frames)."""
    from pandaseq_tpu.io import native
    out = []
    rdr = native.NativeBatchReader(f1, f2, batch=257, L=512)
    for b in rdr:
        raw = b.raw()
        for i in range(len(b.sids)):
            fl, rl = int(b.flen[i]), int(b.rlen[i])
            out.append((str(b.sids[i]), fl, rl,
                        raw[0][i, :fl].tobytes(),
                        raw[1][i, :fl].tobytes(),
                        raw[2][i, :rl].tobytes(),
                        raw[3][i, :rl].tobytes()))
    return out, rdr.error


def _mutate(data: bytes, rng: random.Random) -> bytes:
    kind = rng.randrange(5)
    if kind == 0:  # truncate at a random byte
        return data[:rng.randrange(1, len(data))]
    if kind == 1:  # corrupt one byte
        i = rng.randrange(len(data))
        return data[:i] + bytes([rng.randrange(32, 127)]) + data[i + 1:]
    if kind == 2:  # delete a line
        lines = data.split(b"\n")
        del lines[rng.randrange(len(lines) - 1)]
        return b"\n".join(lines)
    if kind == 3:  # duplicate a line
        lines = data.split(b"\n")
        i = rng.randrange(len(lines) - 1)
        lines.insert(i, lines[i])
        return b"\n".join(lines)
    # inject a bad character into a sequence line (line index 1 mod 4)
    lines = data.split(b"\n")
    idx = [i for i in range(len(lines)) if i % 4 == 1 and lines[i]]
    i = rng.choice(idx)
    line = lines[i]
    j = rng.randrange(len(line))
    lines[i] = line[:j] + b"@" + line[j + 1:]
    return b"\n".join(lines)


def test_decoder_fuzz_native_matches_python(tmp_path):
    from pandaseq_tpu.io import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    base1 = open(os.path.join(DATA, "synth_1.fastq"), "rb").read()
    base2 = open(os.path.join(DATA, "synth_2.fastq"), "rb").read()
    # keep the corpus small so the python reader stays fast
    base1 = b"\n".join(base1.split(b"\n")[:4 * 120]) + b"\n"
    base2 = b"\n".join(base2.split(b"\n")[:4 * 120]) + b"\n"
    rng = random.Random(1234)
    for it in range(40):
        d1, d2 = base1, base2
        if it:  # iteration 0 = unmutated sanity check
            if rng.random() < 0.7:
                d1 = _mutate(d1, rng)
            if rng.random() < 0.7:
                d2 = _mutate(d2, rng)
        f1 = tmp_path / ("f1_%d.fastq" % it)
        f2 = tmp_path / ("f2_%d.fastq" % it)
        f1.write_bytes(d1)
        f2.write_bytes(d2)
        py_recs, py_err = _read_python(str(f1), str(f2))
        nat_recs, nat_err = _read_native(str(f1), str(f2))
        assert nat_err == py_err, (it, nat_err, py_err)
        assert len(nat_recs) == len(py_recs), (
            it, len(nat_recs), len(py_recs), py_err)
        for a, b in zip(nat_recs, py_recs):
            assert a == b, (it, a[0], b[0])


def test_nodata_record_updates_persistent_qual_tails(tmp_path):
    """A NODATA record (empty forward read) still updates the
    persistent quality buffers before being skipped (the serial
    reference decodes quals in read_seq before the fl==0 skip,
    fastq.c:45-104,191) — so later short reads' stale qual TAILS carry
    the NODATA record's bytes. The parallel batch decoder staged no
    rows for NODATA records and diverged here."""
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    def rec(rid, s1, q1, s2, q2, o1, o2):
        h = "@M00000:7:000000000-TEST1:1:1101:%d:2000" % rid
        o1.write("%s 1:N:0:ACGTAC\n%s\n+\n%s\n" % (h, s1, q1))
        o2.write("%s 2:N:0:ACGTAC\n%s\n+\n%s\n" % (h, s2, q2))

    f1 = tmp_path / "a.fastq"
    f2 = tmp_path / "b.fastq"
    with open(f1, "w") as o1, open(f2, "w") as o2:
        rec(10000, "ACGT" * 20, "I" * 80, "TGCA" * 20, "H" * 80, o1, o2)
        rec(10001, "", "", "GATTACA" * 5, "5" * 35, o1, o2)  # NODATA
        rec(10002, "ACGTACGT", "I" * 8, "TTGGCCAA", "H" * 8, o1, o2)
    b = next(iter(native.NativeBatchReader(str(f1), str(f2), batch=16,
                                           L=512)))
    raw = b.raw()
    pairs = list(fq.read_pairs(str(f1), str(f2), policy="PRESENT"))
    assert len(b.sids) == len(pairs) == 2
    for i, p in enumerate(pairs):
        for nat, py in ((raw[1][i][:450], p.fwd_q),
                        (raw[3][i][:450], p.rev_q)):
            pyf = np.zeros(450, dtype=nat.dtype)
            pyf[:min(len(py), 450)] = np.asarray(py)[:450]
            assert (nat == pyf).all(), i


def test_skip_fuzz_matches_decode(tmp_path):
    """Skip-walk equivalence on adversarial streams: for every mutated
    corpus, interleaving psq_skip_batch with decode must land on the
    same batch boundaries, the same terminal error and bit-identical
    decoded batches as a decode-everything walk — including after
    truncations, deleted/duplicated lines and injected bad chars."""
    from pandaseq_tpu.io import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    base1 = open(os.path.join(DATA, "synth_1.fastq"), "rb").read()
    base2 = open(os.path.join(DATA, "synth_2.fastq"), "rb").read()
    base1 = b"\n".join(base1.split(b"\n")[:4 * 120]) + b"\n"
    base2 = b"\n".join(base2.split(b"\n")[:4 * 120]) + b"\n"
    rng = random.Random(987)
    B = 37  # odd batch so boundaries do not align with mutations
    for it in range(30):
        d1, d2 = base1, base2
        if it:
            if rng.random() < 0.7:
                d1 = _mutate(d1, rng)
            if rng.random() < 0.7:
                d2 = _mutate(d2, rng)
        f1 = tmp_path / ("s1_%d.fastq" % it)
        f2 = tmp_path / ("s2_%d.fastq" % it)
        f1.write_bytes(d1)
        f2.write_bytes(d2)
        ref = native.NativeBatchReader(str(f1), str(f2), batch=B, L=512)
        full = list(ref)
        walk = native.NativeBatchReader(str(f1), str(f2), batch=B,
                                        L=512)
        for k, fb in enumerate(full):
            if k % 2 == 0:  # skip even batches, decode odd
                n = walk.skip_batch()
                assert n == len(fb.sids), (it, k, n, len(fb.sids))
            else:
                gb = next(walk)
                assert list(gb.sids) == list(fb.sids), (it, k)
                for fld in ("fwd_nt", "fwd_q", "rev_nt", "rev_q",
                            "flen", "rlen"):
                    np.testing.assert_array_equal(
                        getattr(gb, fld), getattr(fb, fld),
                        err_msg="%d/%d %s" % (it, k, fld))
        # stream end + terminal error agree
        if len(full) % 2 == 0:
            assert walk.skip_batch() == 0, it
        else:
            try:
                next(walk)
                assert False, (it, "extra batch")
            except StopIteration:
                pass
        assert walk.error == ref.error, (it, walk.error, ref.error)
