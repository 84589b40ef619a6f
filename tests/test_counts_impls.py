"""The v2 count kernel (plane_counts) must agree exactly with a
straight-line numpy loop on adversarial random frames (Ns, degenerate
codes, ragged lengths, k-mer collisions), both whole-plane and as
row-block partial sums (the op-axis sharding decomposition)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pandaseq_tpu.ops import fused2 as F2

L, O, B = 256, 128, 24


def _random_frames(seed):
    """Reversed-frame layout: fwd frame j' = raw base flen-1-j',
    rev frame i = raw base rlen-1-i, both left-aligned, pad nt 0."""
    rng = np.random.RandomState(seed)
    codes = np.array([1, 2, 4, 8, 15, 3, 7, 12], dtype=np.int32)
    flen = rng.randint(20, 129, size=B).astype(np.int32)
    rlen = rng.randint(20, 129, size=B).astype(np.int32)
    F_nt = np.zeros((B, L), dtype=np.int32)
    R_nt = np.zeros((B, L), dtype=np.int32)
    F_km = np.full((B, L), -1, dtype=np.int32)
    R_km = np.full((B, L), -2, dtype=np.int32)
    for b in range(B):
        F_nt[b, :flen[b]] = codes[rng.randint(0, len(codes), flen[b])]
        R_nt[b, :rlen[b]] = codes[rng.randint(0, len(codes), rlen[b])]
        # sparse k-mer values with planted collisions
        n_f = rng.randint(1, 10)
        F_km[b, rng.choice(np.arange(flen[b]), size=n_f)] = \
            rng.randint(0, 50, size=n_f)
        n_r = rng.randint(1, 10)
        R_km[b, rng.choice(np.arange(rlen[b]), size=n_r)] = \
            rng.randint(0, 50, size=n_r)
    return F_nt, R_nt, F_km, R_km, flen, rlen


def _loop_counts(F_nt, R_nt, F_km, R_km):
    """Reference loop: overlap o pairs frame rows (j', i) on the
    diagonal o = j' + i + 1; pad nt 0 contributes nothing."""
    m = np.zeros((B, O), np.int32)
    unk = np.zeros((B, O), np.int32)
    cand = np.zeros((B, O), np.int32)
    for b in range(B):
        for j in range(O):
            for i in range(O):
                o = j + i + 1
                if o > O:
                    continue
                fv, rv = F_nt[b, j], R_nt[b, i]
                if F_km[b, j] == R_km[b, i]:
                    cand[b, o - 1] += 1
                if fv == 0 or rv == 0:
                    continue
                if fv == 15 or rv == 15:
                    unk[b, o - 1] += 1
                elif fv & rv:
                    m[b, o - 1] += 1
    return m, unk, cand


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_plane_counts_matches_loop(seed):
    F_nt, R_nt, F_km, R_km, flen, rlen = _random_frames(seed)
    em, eu, ec = _loop_counts(F_nt, R_nt, F_km, R_km)
    m, unk, candc = F2.plane_counts(
        jnp.asarray(F_nt), jnp.asarray(R_nt), jnp.asarray(F_km),
        jnp.asarray(R_km), O)
    np.testing.assert_array_equal(np.asarray(m), em)
    np.testing.assert_array_equal(np.asarray(unk), eu)
    np.testing.assert_array_equal(np.asarray(candc), ec)


@pytest.mark.parametrize("blocks", [2, 4])
def test_plane_counts_row_blocks_sum_exactly(blocks):
    """Partial row-block sums (the op-axis decomposition) must
    reassemble the whole-plane counts bit-for-bit."""
    F_nt, R_nt, F_km, R_km, flen, rlen = _random_frames(7)
    full = F2.plane_counts(jnp.asarray(F_nt), jnp.asarray(R_nt),
                           jnp.asarray(F_km), jnp.asarray(R_km), O)
    Oj = O // blocks
    partial = [np.zeros((B, O), np.int32) for _ in range(3)]
    for k in range(blocks):
        got = F2.plane_counts(jnp.asarray(F_nt), jnp.asarray(R_nt),
                              jnp.asarray(F_km), jnp.asarray(R_km), O,
                              j0=k * Oj, Oj=Oj)
        for t in range(3):
            partial[t] += np.asarray(got[t])
    for t in range(3):
        np.testing.assert_array_equal(partial[t], np.asarray(full[t]))


def test_topk_tie_break_prefers_lower_index():
    """The shortlist relies on lax.top_k keeping the LOWER index on
    ties (the reference's ascending strict-> keeps the first max)."""
    import jax
    x = jnp.asarray([[1.0, 3.0, 3.0, 2.0, 3.0]])
    v, i = jax.lax.top_k(x, 3)
    np.testing.assert_array_equal(np.asarray(i)[0], [1, 2, 4])


def test_shortlist_contains_exact_winner_adversarial():
    """Near-tie scores: the exact f64 winner must appear in the
    shortlist whenever n_band <= SL (the kernel's contract)."""
    from pandaseq_tpu import oracle
    from pandaseq_tpu.assembler import BatchAssembler, make_batch

    rng = np.random.RandomState(11)
    onehot = np.array([1, 2, 4, 8], dtype=np.int8)

    class P:
        pass

    pairs = []
    n = 90
    for k in range(48):
        p = P()
        fwd = onehot[rng.randint(0, 4, size=n)]
        # plant several plausible overlaps to force near-ties
        rev = np.empty(n, dtype=np.int8)
        comp = {1: 8, 8: 1, 2: 4, 4: 2}
        ov = 30 + (k % 3)
        for i in range(n):
            rev[i] = comp[int(fwd[n - ov + i])] if i < ov \
                else onehot[rng.randint(0, 4)]
        p.fwd_nt = fwd
        p.rev_nt = rev[::-1].copy()  # raw rev read (will be flipped)
        p.fwd_q = rng.randint(2, 41, size=n).astype(np.int8)
        p.rev_q = rng.randint(2, 41, size=n).astype(np.int8)
        p.flen = n
        p.rlen = n
        p.sid = "t%d" % k
        pairs.append(p)

    asm = BatchAssembler(L=128)
    results = asm.assemble_batch(pairs)
    cfg = oracle.OracleConfig()
    for p, (code, res) in zip(pairs, results):
        ores, ocode = oracle.assemble(cfg, p)
        assert code == ocode, (p.sid, code, ocode)
        if code == "OK":
            assert res.overlap == ores.overlap
            assert res.quality == ores.quality
