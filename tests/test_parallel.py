"""Multi-chip sharding on the virtual 8-device CPU mesh: the sharded
step must agree with the single-device fused fast path, counters must
psum correctly, and the driver entry points must run."""

import numpy as np
import pytest

import jax


def _example(B, L, seed=3):
    rng = np.random.RandomState(seed)
    onehot = np.array([1, 2, 4, 8], dtype=np.int8)
    fwd_nt = onehot[rng.randint(0, 4, size=(B, L))]
    rev_nt = onehot[rng.randint(0, 4, size=(B, L))]
    fwd_q = rng.randint(2, 41, size=(B, L)).astype(np.int8)
    rev_q = rng.randint(2, 41, size=(B, L)).astype(np.int8)
    flen = np.full(B, min(120, L), dtype=np.int32)
    rlen = np.full(B, min(120, L), dtype=np.int32)
    # overlap structure: make reverse's flipped prefix match forward tail
    for b in range(B // 2):
        ov = 40 + (b % 20)
        f = fwd_nt[b, :120]
        comp = np.array([0, 8, 4, 0, 2, 0, 0, 0, 1], dtype=np.int8)
        rev_nt[b, :ov] = comp[f[120 - ov:][::-1]]
    return fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("op", [2, 4])
def test_sharded_step_matches_single_device(op):
    """The dp×op-sharded PRODUCTION step (overlap-plane rows split over
    op, exact integer psum) must be bit-identical to the single-device
    kernel."""
    import math

    from pandaseq_tpu.ops.fused2 import assemble_shortlist
    from pandaseq_tpu.parallel import shard

    L = 128
    B = 32
    q = 0.36
    pmatch = math.log(0.25 * (1 - q) ** 2)
    pmismatch = math.log((3 * q - 2 * q * q) / 18)
    fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen = _example_rev(B, L)
    zeros = np.zeros(B, dtype=np.int32)
    args = (_pack(fwd_nt, rev_nt), fwd_q, rev_q, flen, rlen,
            zeros, zeros)
    mesh = shard.make_mesh(8, op=op)
    step = shard.make_sharded_step(mesh, L=L, pmatch=pmatch,
                                   pmismatch=pmismatch)
    sharded = np.asarray(step(*shard.shard_batch(mesh, args)))
    single = np.asarray(assemble_shortlist(
        *args, L=L, pmatch=pmatch, pmismatch=pmismatch))
    np.testing.assert_array_equal(sharded, single)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_pear_matches_single_device():
    from pandaseq_tpu.ops.fused2 import assemble_shortlist
    from pandaseq_tpu.parallel import shard
    from pandaseq_tpu.tables import QUAL_MATCH_PEAR, QUAL_MISMATCH_PEAR

    L = 128
    B = 16
    fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen = _example_rev(B, L, seed=9)
    zeros = np.zeros(B, dtype=np.int32)
    args = (_pack(fwd_nt, rev_nt), fwd_q, rev_q, flen, rlen,
            zeros, zeros)
    import math
    nn_term = -math.log(0.25)
    mesh = shard.make_mesh(8, op=2)
    step = shard.make_sharded_step(
        mesh, L=L, algo_kind="pear", nn_term=nn_term,
        lut_match=QUAL_MATCH_PEAR, lut_mismatch=QUAL_MISMATCH_PEAR)
    sharded = np.asarray(step(*shard.shard_batch(mesh, args)))
    single = np.asarray(assemble_shortlist(
        *args, L=L, algo_kind="pear", nn_term=nn_term,
        lut_match=QUAL_MATCH_PEAR, lut_mismatch=QUAL_MISMATCH_PEAR))
    SL = 8
    # f32 sums may differ in reduction order across op shards, which
    # can permute near-ties in the shortlist — but the shortlist SET
    # and the examined count must match (the host re-scores the
    # shortlist exactly anyway)
    np.testing.assert_array_equal(np.sort(sharded[:, :SL], axis=1),
                                  np.sort(single[:, :SL], axis=1))
    np.testing.assert_array_equal(sharded[:, 2 * SL + 1],
                                  single[:, 2 * SL + 1])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_candidate_step_matches_single_device():
    """The sparse LUT path's dp×op-sharded candidate step (partial
    k-mer plane rows psum'd over op) is bit-identical to the
    single-device assemble_candidates_nt — exact integers throughout."""
    from pandaseq_tpu.ops.fused2 import assemble_candidates_nt
    from pandaseq_tpu.parallel import shard

    L = 128
    B = 32
    fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen = _example_rev(B, L, seed=5)
    args = (_pack(fwd_nt, rev_nt), flen, rlen)
    mesh = shard.make_mesh(8, op=2)
    step = shard.make_sharded_cand_step(mesh, L=L)
    sharded = np.asarray(step(*shard.shard_batch(mesh, args)))
    single = np.asarray(assemble_candidates_nt(*args, L=L))
    np.testing.assert_array_equal(sharded, single)


def _pack(fwd_nt, rev_nt):
    return ((fwd_nt.astype(np.uint8) & 0x0F)
            | ((rev_nt.astype(np.uint8) & 0x0F) << 4)).view(np.int8)


def _example_rev(B, L, seed=3):
    """Reversed-frame batch with planted overlap structure."""
    fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen = _example(B, L, seed)
    # reverse within the read to the v2 frame layout
    for b in range(B):
        fwd_nt[b, :flen[b]] = fwd_nt[b, :flen[b]][::-1]
        fwd_q[b, :flen[b]] = fwd_q[b, :flen[b]][::-1]
        rev_nt[b, :rlen[b]] = rev_nt[b, :rlen[b]][::-1]
        rev_q[b, :rlen[b]] = rev_q[b, :rlen[b]][::-1]
        fwd_nt[b, flen[b]:] = 0
        rev_nt[b, rlen[b]:] = 0
    return fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    # the production fused step returns one packed int32 plane
    assert out.shape[0] == args[0].shape[0]
    assert out.dtype == jnp_int32()


def jnp_int32():
    import jax.numpy as jnp
    return jnp.int32


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_production_fused_sharded_over_dp():
    """The real fused pipeline, batch-sharded over 8 devices, must give
    byte-identical results to the single-device run."""
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod
    from pandaseq_tpu.parallel import shard
    from tests.test_oracle_golden import F1, F2, _ensure_ref

    _ensure_ref()
    pairs = []
    reader = fq.read_pairs(F1, F2, policy="PRESENT")
    for _ in range(64):
        pairs.append(next(reader))

    asm1 = BatchAssembler(L=512)
    single = asm1.assemble_batch(pairs)
    ref_bytes = b"".join(out_mod.format_fasta(r)
                         for c, r in single if c == "OK")

    from pandaseq_tpu.assembler import make_batch
    mesh = shard.make_mesh(8, op=1)
    asm2 = BatchAssembler(L=512)
    st, dev = shard.shard_fused_batch(mesh, asm2, make_batch(pairs, 512))
    # the fused result must actually be computed dp-sharded (the width
    # slicing in _dispatch must not silently pull inputs back to host)
    assert len(dev.sharding.device_set) == 8, dev.sharding
    sharded = asm2._finalize(st, dev)
    got_bytes = b"".join(out_mod.format_fasta(r)
                         for c, r in sharded if c == "OK")
    assert got_bytes == ref_bytes


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_assembler_mesh_option_bit_identical():
    """BatchAssembler(mesh=...) shards transparently, same output."""
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod
    from pandaseq_tpu.parallel import shard
    from tests.test_oracle_golden import F1, F2

    pairs = []
    reader = fq.read_pairs(F1, F2, policy="PRESENT")
    for _ in range(64):
        pairs.append(next(reader))

    def run(mesh):
        asm = BatchAssembler(L=512, mesh=mesh)
        return b"".join(out_mod.format_fasta(r)
                        for c, r in asm.assemble_batch(pairs)
                        if c == "OK")

    assert run(None) == run(shard.make_mesh(8, op=1))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("algo", ["simple_bayesian", "rdp_mle"])
def test_assembler_op_mesh_bit_identical(algo):
    """A 2-D (dp, op) mesh through the ENGINE: _dispatch_op routes the
    sparse candidate / shortlist work through the shard_map twins and
    output stays byte-identical (sparse path for both algorithm kinds,
    plus the -k 0 shortlist path below)."""
    from pandaseq_tpu import oracle
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod
    from pandaseq_tpu.parallel import shard
    from tests.test_oracle_golden import F1, F2

    pairs = []
    reader = fq.read_pairs(F1, F2, policy="PRESENT")
    for _ in range(64):
        pairs.append(next(reader))

    def run(mesh, num_kmers=2):
        cfg = oracle.OracleConfig(
            algorithm=oracle.make_algorithm(algo), num_kmers=num_kmers)
        asm = BatchAssembler(cfg, L=512, mesh=mesh)
        return b"".join(out_mod.format_fasta(r)
                        for c, r in asm.assemble_batch(pairs)
                        if c == "OK")

    mesh = shard.make_mesh(8, op=2)
    base = run(None)
    assert base == run(mesh)
    # -k 0 disables k-mer seeding -> the banded-shortlist device path
    # (_dispatch_op's make_sharded_step branch)
    assert run(None, num_kmers=0) == run(mesh, num_kmers=0)
