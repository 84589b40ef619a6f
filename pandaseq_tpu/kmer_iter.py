"""Public k-mer iteration utilities (iter.c / pandaseq-iter.h).

The reference exposes a reusable iterator over the 8-mers of a sequence,
forward or reverse, skipping degenerate bases (an N resets the window,
misc.h:41-43; iter.c:91). This wraps the oracle's verified FOREACH_KMER
reimplementation with the panda_iterate_* / panda_iter_next surface.
"""

from __future__ import annotations

import numpy as np

from .oracle import KMER_LEN, kmer_emissions

__all__ = ["KMER_LEN", "kmers_of", "iterate"]


def kmers_of(nt, length: int | None = None, reverse: bool = False):
    """All emitted (kmer, position) pairs of a 4-bit-coded sequence as
    (values int64[], positions int64[]) arrays."""
    nt = np.asarray(nt)
    n = len(nt) if length is None else int(length)
    pairs = kmer_emissions(nt, n, reverse)
    if not pairs:
        return (np.empty(0, dtype=np.int64),) * 2
    vals, poss = zip(*pairs)
    return np.asarray(vals, dtype=np.int64), np.asarray(poss,
                                                        dtype=np.int64)


def iterate(nt, length: int | None = None, reverse: bool = False):
    """panda_iterate_nt / panda_iter_next as a generator of
    (kmer, posn) tuples (pandaseq-iter.h)."""
    nt = np.asarray(nt)
    n = len(nt) if length is None else int(length)
    yield from kmer_emissions(nt, n, reverse)
