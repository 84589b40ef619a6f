import math

import numpy as np

from pandaseq_tpu import tables


def test_qual_score_endpoints():
    # p == 1 special case (mktable.c:69-71)
    assert tables.QUAL_SCORE[0] == -2.0
    # hand-computed: phred 20 -> p = 0.01 -> log(0.99) -> %g
    assert tables.QUAL_SCORE[20] == float("%g" % math.log(0.99))
    assert tables.QUAL_SCORE.shape == (47,)
    # monotonically increasing
    assert np.all(np.diff(tables.QUAL_SCORE) > 0)


def test_qual_score_err():
    # log(10^(-i/10)) rounded via %g
    for i in (0, 1, 10, 46):
        expect = float("%g" % math.log(10.0 ** (-i / 10.0)))
        assert tables.QUAL_SCORE_ERR[i] == expect
    assert tables.QUAL_SCORE_ERR[0] == 0.0


def test_constant_is_6_sig_digits():
    # The emitted #define is %g-formatted (tablebuilder.c:124): -1.38629,
    # NOT the full-precision log(0.25).
    assert tables.QUAL_NN_SIMPLE_BAYESIAN == -1.38629
    assert tables.QUAL_NN_SIMPLE_BAYESIAN != math.log(0.25)


def test_match_simple_bayesian_spot():
    # i=j=20: p=q=0.01 -> (0.99*0.99 + 0.01*0.01/3)
    v = 0.99 * 0.99 + 0.01 * 0.01 / 3
    assert tables.QUAL_MATCH_SIMPLE_BAYESIAN[20, 20] == float(
        "%g" % math.log(v))
    assert tables.QUAL_MATCH_SIMPLE_BAYESIAN.shape == (47, 47)


def test_mismatch_rdp_assembled_guard():
    # At p=q=1 (phred 0): min - pq/3 = 1 - 1/3 = 2/3; p+q-4pq/3 = 2/3;
    # value = 1 - 1 = 0 -> DBL_MIN -> log gives ~-708.396
    assert tables.QUAL_MISMATCH_ASSEMBLED_RDP_MLE[0, 0] == float(
        "%g" % math.log(2.2250738585072014e-308))


def test_all_tables_finite():
    for t in (tables.QUAL_SCORE, tables.QUAL_SCORE_ERR,
              tables.QUAL_MATCH_SIMPLE_BAYESIAN,
              tables.QUAL_MISMATCH_SIMPLE_BAYESIAN,
              tables.QUAL_MATCH_PEAR, tables.QUAL_MISMATCH_PEAR,
              tables.QUAL_MISMATCH_RDP_MLE,
              tables.QUAL_MISMATCH_ASSEMBLED_RDP_MLE,
              tables.QUAL_MATCH_UPARSE, tables.QUAL_MISMATCH_UPARSE):
        assert np.all(np.isfinite(t))


def test_phredclamp():
    assert tables.phredclamp(-5) == 0
    assert tables.phredclamp(47) == 46
    assert tables.phredclamp(33) == 33
