"""The single-upload concatenated plane must be a pure re-encoding:
assemble_shortlist_packed (one [B, 3L] int8 argument) equals the
three-argument assemble_shortlist bit-for-bit."""

import numpy as np

from pandaseq_tpu.ops import fused2
from pandaseq_tpu import tables


def _rand_batch(rng, B, L):
    nt_pack = rng.integers(0, 256, size=(B, L)).astype(np.uint8)
    # zero tails like the decoder does (left-aligned reversed frames)
    flen = rng.integers(30, L, size=B).astype(np.int32)
    rlen = rng.integers(30, L, size=B).astype(np.int32)
    for b in range(B):
        nt_pack[b, max(flen[b], rlen[b]):] = 0
    fr_q = rng.integers(0, 47, size=(B, L)).astype(np.int8)
    rr_q = rng.integers(0, 47, size=(B, L)).astype(np.int8)
    fo = np.zeros(B, np.int32)
    ro = np.zeros(B, np.int32)
    return nt_pack.view(np.int8), fr_q, rr_q, flen, rlen, fo, ro


def test_packed_lut_matches_unpacked():
    rng = np.random.default_rng(2)
    B, L = 16, 64
    nt_pack, fr_q, rr_q, flen, rlen, fo, ro = _rand_batch(rng, B, L)
    lut_m = np.log(np.clip(rng.random((47, 47)), 1e-3, 1)).astype(
        np.float64)
    lut_mm = np.log(np.clip(rng.random((47, 47)), 1e-3, 1)).astype(
        np.float64)
    kw = dict(L=L, O=L, algo_kind="rdp_mle", pmatch=0.0, pmismatch=0.0,
              nn_term=float(tables.QUAL_NN_SIMPLE_BAYESIAN),
              lut_match=lut_m, lut_mismatch=lut_mm)
    ref = np.asarray(fused2.assemble_shortlist(
        nt_pack, fr_q, rr_q, flen, rlen, fo, ro, **kw))
    plane = np.concatenate([nt_pack, fr_q, rr_q], axis=1)
    got = np.asarray(fused2.assemble_shortlist_packed(
        plane, flen, rlen, fo, ro, **kw))
    np.testing.assert_array_equal(got, ref)


def test_packed_pear_matches_unpacked():
    rng = np.random.default_rng(3)
    B, L = 12, 64
    nt_pack, fr_q, rr_q, flen, rlen, fo, ro = _rand_batch(rng, B, L)
    lut_m = np.log(np.clip(rng.random((47, 47)), 1e-3, 1)).astype(
        np.float64)
    lut_mm = np.log(np.clip(rng.random((47, 47)), 1e-3, 1)).astype(
        np.float64)
    kw = dict(L=L, O=L, algo_kind="pear", pmatch=0.0, pmismatch=0.0,
              nn_term=-1.25, lut_match=lut_m, lut_mismatch=lut_mm)
    ref = np.asarray(fused2.assemble_shortlist(
        nt_pack, fr_q, rr_q, flen, rlen, fo, ro, **kw))
    plane = np.concatenate([nt_pack, fr_q, rr_q], axis=1)
    got = np.asarray(fused2.assemble_shortlist_packed(
        plane, flen, rlen, fo, ro, **kw))
    np.testing.assert_array_equal(got, ref)
