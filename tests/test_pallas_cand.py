"""Pallas candidate-plane kernel: exact equality with the XLA twins.

The Pallas kernel (ops/pallas_cand.py) enumerates the same (stored j',
emitted i) k-mer pairs per diagonal as fused2.plane_cand
(assembler.c:84-118 candidate search), skipping only provably-zero
blocks. On CPU it runs in interpret mode (Mosaic lowering needs a
TPU); compiled-mode timing lives outside pytest (bench harness)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pandaseq_tpu.ops import fused2
from pandaseq_tpu.ops.pallas_cand import plane_cand_pallas


def _frames(rng, B, L, vocab=300, p_off=0.3):
    Fkm = rng.integers(0, vocab, (B, L)).astype(np.int32)
    Rkm = rng.integers(0, vocab, (B, L)).astype(np.int32)
    Fkm[rng.random((B, L)) < p_off] = -1   # not stored
    Rkm[rng.random((B, L)) < p_off] = -2   # not emitted
    return jnp.asarray(Fkm), jnp.asarray(Rkm)


def _dense(F, R, O):
    kq = (F[:, :O, None] == R[:, None, :O]).astype(jnp.int8)
    T3 = fused2._diag_t3(O, 0, O, jnp.int8)
    import jax
    return jax.lax.dot_general(
        kq, T3, (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.int32)


@pytest.mark.parametrize("B,L,O", [(4, 256, 256), (8, 320, 256)])
def test_pallas_equals_dense(B, L, O):
    rng = np.random.default_rng(0)
    F, R = _frames(rng, B, L)
    ref = np.asarray(_dense(F, R, O))
    got = np.asarray(plane_cand_pallas(F, R, O, bs=128, interpret=True))
    assert np.array_equal(ref, got)


def test_tri_equals_dense_various_nb():
    rng = np.random.default_rng(1)
    for B, L, O in ((4, 256, 256), (8, 128, 96), (4, 384, 384)):
        F, R = _frames(rng, B, L)
        ref = np.asarray(_dense(F, R, O))
        for nb in (1, 2, 4, 8):
            if O % nb:
                continue
            got = np.asarray(fused2._plane_cand_tri(F, R, O, nb=nb))
            assert np.array_equal(ref, got), (B, L, O, nb)


def test_env_opt_in_routes_pallas(monkeypatch):
    rng = np.random.default_rng(2)
    F, R = _frames(rng, 4, 256)
    ref = np.asarray(fused2.plane_cand(F, R, 256))
    monkeypatch.setenv("PANDASEQ_TPU_PALLAS", "interpret")
    got = np.asarray(fused2.plane_cand(F, R, 256))
    assert np.array_equal(ref, got)
