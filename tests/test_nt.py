import numpy as np

from pandaseq_tpu import nt
from pandaseq_tpu.tables import QUAL_SCORE


def test_basic_codes():
    assert nt.nt_from_ascii(np.frombuffer(b"ACGT", dtype=np.uint8)).tolist() \
        == [1, 2, 4, 8]
    # lowercase maps identically (ascii & 0x1F)
    assert nt.nt_from_ascii(np.frombuffer(b"acgt", dtype=np.uint8)).tolist() \
        == [1, 2, 4, 8]
    assert nt.nt_from_ascii(np.frombuffer(b"N", dtype=np.uint8))[0] == 15
    # U == T (nt.c:68)
    assert nt.nt_from_ascii(np.frombuffer(b"U", dtype=np.uint8))[0] == 8


def test_complement_decode():
    # decode-with-complement: A->T etc (nt.c:81-114)
    assert nt.nt_from_ascii_complement(
        np.frombuffer(b"ACGTN", dtype=np.uint8)).tolist() == [8, 4, 2, 1, 15]


def test_invalid_ascii_is_zero():
    codes = nt.nt_from_ascii(np.frombuffer(b"EFIJLOPQZ[", dtype=np.uint8))
    assert np.all(codes == 0)


def test_roundtrip_ascii():
    # every valid 4-bit code renders to its canonical IUPAC letter and
    # decodes back to itself
    for code in range(1, 16):
        ch = nt.nt_to_ascii(np.array([code], dtype=np.int8))
        back = nt.nt_from_ascii(ch)
        assert back[0] == (15 if chr(ch[0]) == "N" else code)


def test_degenerate_and_n():
    codes = np.arange(16)
    degn = nt.is_degenerate(codes)
    # exactly the single-bit codes are non-degenerate
    for c in range(16):
        assert degn[c] == (bin(c).count("1") != 1)
    assert nt.is_n(np.array([15]))[0]
    assert not nt.is_n(np.array([7]))[0]


def test_result_phred_matches_scalar_port():
    rng = np.random.default_rng(0)
    # exact table values, midpoints, below and above range
    ps = list(QUAL_SCORE) + [
        (QUAL_SCORE[i] + QUAL_SCORE[i + 1]) / 2 for i in range(46)
    ] + [-3.0, -2.0000001, 0.0, 1.0]
    ps += list(rng.uniform(-2.5, 0.1, size=500))
    got = nt.result_phred(np.array(ps))
    want = np.array([nt._result_phred_scalar(p) for p in ps], dtype=np.int8)
    np.testing.assert_array_equal(got, want)
