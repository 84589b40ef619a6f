"""The counting implementations (gather / skew / conv) must agree
exactly on adversarial random frames (Ns, degenerate codes, ragged
lengths, k-mer collisions)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pandaseq_tpu.ops import align as A
from pandaseq_tpu.ops import fused as F

L, O, B = 256, 128, 24


def _random_frames(seed):
    rng = np.random.RandomState(seed)
    codes = np.array([1, 2, 4, 8, 15, 3, 7, 12], dtype=np.int32)
    flen = rng.randint(20, 129, size=B).astype(np.int32)
    rlen = rng.randint(20, 129, size=B).astype(np.int32)
    F_nt = np.zeros((B, L), dtype=np.int32)
    R_nt = np.zeros((B, L), dtype=np.int32)
    F_km = np.full((B, L), -1, dtype=np.int32)
    R_km = np.full((B, L), -2, dtype=np.int32)
    for b in range(B):
        F_nt[b, L - flen[b]:] = codes[rng.randint(0, len(codes), flen[b])]
        R_nt[b, :rlen[b]] = codes[rng.randint(0, len(codes), rlen[b])]
        # sparse k-mer values with planted collisions
        n_f = rng.randint(1, 10)
        pos_f = rng.choice(L - flen[b] + np.arange(flen[b]), size=n_f)
        F_km[b, pos_f] = rng.randint(0, 50, size=n_f)
        n_r = rng.randint(1, 10)
        pos_r = rng.choice(np.arange(rlen[b]), size=n_r)
        R_km[b, pos_r] = rng.randint(0, 50, size=n_r)
    return F_nt, R_nt, F_km, R_km, flen, rlen


def _gather_counts(F_nt, R_nt, F_km, R_km, flen, rlen):
    """Straight-line numpy reimplementation of the gather path."""
    m = np.zeros((B, O), np.int32)
    unk = np.zeros((B, O), np.int32)
    cand = np.zeros((B, O), bool)
    for b in range(B):
        for o in range(1, O + 1):
            for i in range(o):
                j = L - o + i
                if j < L - flen[b] or i >= rlen[b]:
                    fv = F_nt[b, j] if 0 <= j < L else 0
                    rv = R_nt[b, i]
                    # out-of-valid: pads are 0 so no counts; keep going
                if 0 <= j < L and F_km[b, j] == R_km[b, i]:
                    cand[b, o - 1] = True
                if i < o - flen[b] or i >= rlen[b]:
                    continue
                fv, rv = F_nt[b, j], R_nt[b, i]
                if fv == 15 or rv == 15:
                    unk[b, o - 1] += 1
                elif fv & rv:
                    m[b, o - 1] += 1
    return m, unk, cand


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_skew_matches_reference_loop(seed):
    F_nt, R_nt, F_km, R_km, flen, rlen = _random_frames(seed)
    em, eu, ec = _gather_counts(F_nt, R_nt, F_km, R_km, flen, rlen)
    m, unk, cand = F._counts_skew(
        jnp.asarray(F_nt), jnp.asarray(R_nt), jnp.asarray(F_km),
        jnp.asarray(R_km), jnp.asarray(flen), jnp.asarray(rlen), L, O)
    np.testing.assert_array_equal(np.asarray(m), em)
    np.testing.assert_array_equal(np.asarray(unk), eu)
    np.testing.assert_array_equal(np.asarray(cand), ec)


@pytest.mark.parametrize("seed", [3, 4])
def test_conv_matches_reference_loop(seed):
    F_nt, R_nt, F_km, R_km, flen, rlen = _random_frames(seed)
    em, eu, _ = _gather_counts(F_nt, R_nt, F_km, R_km, flen, rlen)
    m, unk = F._counts_conv(jnp.asarray(F_nt), jnp.asarray(R_nt),
                            jnp.asarray(flen), jnp.asarray(rlen), L, O)
    np.testing.assert_array_equal(np.asarray(m), em)
    np.testing.assert_array_equal(np.asarray(unk), eu)
