"""Algorithm registry, custom algorithms, and the k-mer iterator API."""

import numpy as np

from tests.test_oracle_golden import F1, F2


def test_registry_listing():
    from pandaseq_tpu import algorithms

    names = algorithms.list_algorithms()
    assert names == sorted(names)
    for n in ("simple_bayesian", "pear", "rdp_mle", "uparse", "ea_util",
              "flash", "stitch"):
        assert n in names


def test_custom_algorithm_end_to_end():
    from pandaseq_tpu import algorithms, oracle
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq

    class MatchFrac(algorithms.Algorithm):
        """Toy scorer: matches minus mismatches, like stitch w/o wrap."""
        name = "match_frac"

        def __init__(self, arg=None):
            self.w = float(arg) if arg else 1.0

        def overlap_probability(self, fwd_nt, fwd_q, flen, rev_nt,
                                rev_q, rlen, overlap):
            score = 0.0
            for i in range(overlap):
                fi = flen + i - overlap
                ri = rlen - i - 1
                if fi < 0 or ri < 0 or fi >= flen or ri >= rlen:
                    continue
                if (int(fwd_nt[fi]) & int(rev_nt[ri])) != 0:
                    score += self.w
                else:
                    score -= self.w
            return score / (flen + rlen) - 0.9  # keep near log-prob range

        def match_probability(self, match, a, b):
            from pandaseq_tpu.tables import QUAL_SCORE
            return float(QUAL_SCORE[max(a, b)])

    algorithms.register_algorithm("match_frac", MatchFrac)
    algo = algorithms.make_algorithm("match_frac", "2.0")
    assert algo.w == 2.0

    cfg = oracle.OracleConfig(algorithm=algorithms.make_algorithm(
        "match_frac"))
    asm = BatchAssembler(cfg, L=512)
    pairs = []
    reader = fq.read_pairs(F1, F2, policy="PRESENT")
    for _ in range(32):
        pairs.append(next(reader))
    batch_out = asm.assemble_batch(pairs)

    # cross-check every verdict/overlap against the pure oracle
    for p, (code, res) in zip(pairs, batch_out):
        ores, ocode = oracle.assemble(cfg, p)
        if ocode != "OK":
            assert code != "OK"
        else:
            assert code == "OK"
            assert res.overlap == ores.overlap
            assert res.quality == ores.quality


def test_kmer_iterator():
    from pandaseq_tpu import kmer_iter
    from pandaseq_tpu.nt import nt_from_ascii

    seq = nt_from_ascii(np.frombuffer(b"ACGTACGTACGTACGT", dtype=np.uint8))
    vals, poss = kmer_iter.kmers_of(seq)
    # first emission at the 9th base examined (position 8)
    assert poss[0] == 8
    assert len(vals) == 16 - 8
    # an N resets the window
    seqn = nt_from_ascii(np.frombuffer(b"ACGTNACGTACGTACGT",
                                       dtype=np.uint8))
    _, poss_n = kmer_iter.kmers_of(seqn)
    assert poss_n[0] == 13  # 9 bases after the N at index 4
    # reverse iteration visits descending positions
    _, rposs = kmer_iter.kmers_of(seq, reverse=True)
    assert rposs[0] == len(seq) - 1 - 8
    # generator protocol
    assert list(kmer_iter.iterate(seq))[:1] == [(int(vals[0]),
                                                 int(poss[0]))]
