"""Seq-id grammar tests.

The first six cases replicate the reference's only unit test
(check_parser.c:27-34) verbatim; the rest probe failure modes and the tag
policy (seqid.c:235,280).
"""

from pandaseq_tpu import seqid
from pandaseq_tpu.seqid import (FMT_CASAVA_1_4, FMT_CASAVA_1_7,
                                FMT_CASAVA_CONVERTED, FMT_SRA, SeqId,
                                TAG_ABSENT, TAG_OPTIONAL, TAG_PRESENT, parse)

REFERENCE_CASES = [
    ("M01271:10:000000000-A3WGH:1:1101:18786:6175 1:N:0:1", 1,
     FMT_CASAVA_1_7,
     SeqId("M01271", "10", "000000000-A3WGH", 1, 1101, 18786, 6175, "1")),
    ("ILLUMINA-BE9C3F:29:FC:3:1:2462:1120 1:N:0:GCTATA", 1, FMT_CASAVA_1_7,
     SeqId("ILLUMINA-BE9C3F", "29", "FC", 3, 1, 2462, 1120, "GCTATA")),
    ("M00958:47:000000000-A3GH7:1:1101:15028:1512 2:N:0:3", 2,
     FMT_CASAVA_1_7,
     SeqId("M00958", "47", "000000000-A3GH7", 1, 1101, 15028, 1512, "3")),
    ("1468:1:1:12675:1118#ATCACGA/1", 1, FMT_CASAVA_1_4,
     SeqId("1468", "", "", 1, 1, 12675, 1118, "ATCACGA")),
    ("1468:1:1:12675:1118#ATCACGA/2", 2, FMT_CASAVA_1_4,
     SeqId("1468", "", "", 1, 1, 12675, 1118, "ATCACGA")),
    ("MISEQ03:18:000000000-A1REG:1:1101:14774:1712#GATAGTGCCAC/1", 1,
     FMT_CASAVA_CONVERTED,
     SeqId("MISEQ03", "18", "000000000-A1REG", 1, 1101, 14774, 1712,
           "GATAGTGCCAC")),
]


def test_reference_cases():
    for s, dir_, fmt, want in REFERENCE_CASES:
        got_dir, got_id, got_fmt = parse(s, TAG_OPTIONAL)
        assert got_dir == dir_, s
        assert got_fmt == fmt, s
        assert got_id == want, s


def test_sra():
    d, sid, fmt = parse("SRR1234.5678 somejunk", TAG_OPTIONAL)
    assert d == 1 and fmt == FMT_SRA
    assert sid.instrument == "SRR1234"
    assert sid.lane == 5678


def test_tag_policy():
    no_tag = "1468:1:1:12675:1118/1"
    with_tag = "1468:1:1:12675:1118#AC/1"
    assert parse(no_tag, TAG_ABSENT)[0] == 1
    assert parse(no_tag, TAG_PRESENT)[0] == 0
    assert parse(with_tag, TAG_PRESENT)[0] == 1
    assert parse(with_tag, TAG_ABSENT)[0] == 0
    assert parse(with_tag, TAG_OPTIONAL)[0] == 1


def test_failures():
    assert parse("", TAG_OPTIONAL)[0] == 0
    assert parse("a:b:c", TAG_OPTIONAL)[0] == 0  # 1.7 path, too few fields
    assert parse("x:y:1:2:3:4/z", TAG_OPTIONAL)[0] == 0  # non-digit direction


def test_str_roundtrip():
    _, sid, _ = parse(REFERENCE_CASES[0][0], TAG_OPTIONAL)
    assert str(sid) == "M01271:10:000000000-A3WGH:1:1101:18786:6175:1"
