"""Generate synthetic paired-end MiSeq-style FASTQ for regression testing.

Produces realistic overlapping pairs: a random amplicon per pair, the
forward read from its 5' end and the reverse read as the reverse complement
of its 3' end, with PHRED-dependent substitution errors, occasional Ns,
B-cliff tails (PHRED 2 runs), and varying read/amplicon lengths -- the same
regimes the reference's McBath regression dataset exercises.
"""

from __future__ import annotations

import argparse
import random

COMP = str.maketrans("ACGTN", "TGCAN")


def revcomp(s: str) -> str:
    return s.translate(COMP)[::-1]


def make_pair(rng: random.Random, read_len: int, amp_min: int, amp_max: int,
              fwd_primer: str = "", rev_primer: str = "",
              cliff_rate: float = 0.15, n_run_rate: float = 0.0,
              qual_offset: int = 33):
    amp_len = rng.randint(amp_min, amp_max)
    amplicon = (fwd_primer
                + "".join(rng.choice("ACGT")
                          for _ in range(amp_len - len(fwd_primer)
                                         - len(rev_primer)))
                + revcomp(rev_primer))
    fwd = amplicon[:read_len]
    rev = revcomp(amplicon)[:read_len]

    def corrupt(read: str, cliff_rate: float = 0.15,
                n_run_rate: float = 0.0, qual_offset: int = 33):
        quals = []
        bases = []
        # quality profile: high at 5', decaying; occasional B-cliff
        cliff = rng.random() < cliff_rate
        cliff_start = rng.randint(len(read) * 3 // 4, len(read)) if cliff \
            else len(read)
        # N runs: a burst of no-calls mid-read (failed cycles on real
        # MiSeq flowcells; the McBath regression pair has these)
        n_start = n_end = -1
        if rng.random() < n_run_rate:
            n_start = rng.randint(0, max(len(read) - 15, 1))
            n_end = n_start + rng.randint(3, 15)
        for i, b in enumerate(read):
            if i >= cliff_start:
                q = 2
            else:
                q = max(2, min(40, int(rng.gauss(38 - 14 * i / len(read), 4))))
            if n_start <= i < n_end:
                b = "N"
                q = 2
            else:
                p_err = 10.0 ** (-q / 10.0)
                if rng.random() < p_err:
                    if rng.random() < 0.1:
                        b = "N"
                        q = 2
                    else:
                        b = rng.choice([c for c in "ACGT" if c != b])
            bases.append(b)
            quals.append(q)
        return "".join(bases), "".join(chr(qual_offset + q) for q in quals)

    kw = dict(cliff_rate=cliff_rate, n_run_rate=n_run_rate,
              qual_offset=qual_offset)
    return corrupt(fwd, **kw), corrupt(rev, **kw)


def main_fast(args):
    """Vectorized generator for large benchmark sets (same statistical
    regimes, numpy RNG stream). Sets above _CHUNK pairs are produced in
    independent chunks (fresh per-chunk RNG seed), bounding peak memory
    at ~chunk * (amp_max + 13 * read_len) bytes — 10M-pair 2x300 sets
    (BASELINE config 5) fit comfortably."""
    import numpy as np
    _CHUNK = 250_000
    n_total = args.pairs
    rl = args.read_len
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = np.zeros(256, dtype=np.uint8)
    for a, b in zip(b"ACGTN", b"TGCAN"):
        comp[a] = b
    import os
    os.makedirs(os.path.dirname(args.out_prefix) or ".", exist_ok=True)
    fa = open(args.out_prefix + "_1.fastq", "wb")
    fb = open(args.out_prefix + "_2.fastq", "wb")
    pos = np.arange(rl)
    max_amp = args.amp_max
    tag = args.tag
    base_i = 0
    while base_i < n_total:
        n = min(_CHUNK, n_total - base_i)
        rng = np.random.RandomState(args.seed if base_i == 0
                                    else args.seed + 1000003
                                    + base_i // _CHUNK)
        amp_len = rng.randint(args.amp_min, args.amp_max + 1, size=n)
        amp = bases[rng.randint(0, 4, size=(n, max_amp))]
        for which, fh in ((0, fa), (1, fb)):
            if which == 0:
                reads = amp[:, :rl].copy()
            else:
                # reverse complement of the amplicon tail, ragged by
                # amp_len
                idx = amp_len[:, None] - 1 - pos[None, :]
                reads = comp[amp[np.arange(n)[:, None],
                                 np.clip(idx, 0, max_amp - 1)]]
            q = np.clip(rng.normal(38 - 14 * pos / rl, 4, size=(n, rl)),
                        2, 40).astype(np.int32)
            cliff = rng.random_sample(n) < 0.15
            cliff_start = rng.randint(rl * 3 // 4, rl + 1, size=n)
            q = np.where(cliff[:, None] & (pos[None, :] >=
                                           cliff_start[:, None]), 2, q)
            perr = 10.0 ** (-q / 10.0)
            err = rng.random_sample((n, rl)) < perr
            sub = bases[rng.randint(0, 4, size=(n, rl))]
            reads = np.where(err, sub, reads)
            qbytes = (q + 33).astype(np.uint8)
            out = []
            for i in range(n):
                gi = base_i + i
                out.append(
                    b"@M00000:7:000000000-TEST1:1:1101:%d:%d %d:N:0:%s\n"
                    % (10000 + gi, 2000 + gi, which + 1, tag.encode()))
                out.append(reads[i].tobytes())
                out.append(b"\n+\n")
                out.append(qbytes[i].tobytes())
                out.append(b"\n")
                if len(out) > 50000:
                    fh.write(b"".join(out))
                    out = []
            fh.write(b"".join(out))
        base_i += n
    fa.close()
    fb.close()
    print("wrote %d pairs to %s_[12].fastq (fast)"
          % (n_total, args.out_prefix))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=200)
    ap.add_argument("--read-len", type=int, default=250)
    ap.add_argument("--amp-min", type=int, default=300)
    ap.add_argument("--amp-max", type=int, default=460)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out-prefix", default="tests/data/synth")
    ap.add_argument("--tag", default="ACGTAC",
                    help="index tag in headers ('' for none)")
    ap.add_argument("--fwd-primer", default="",
                    help="primer prepended to the amplicon 5' end")
    ap.add_argument("--rev-primer", default="",
                    help="primer whose revcomp ends the amplicon")
    ap.add_argument("--fast", action="store_true",
                    help="vectorized generator for large sets")
    ap.add_argument("--cliff-rate", type=float, default=0.15,
                    help="per-read probability of a PHRED-2 B-cliff tail")
    ap.add_argument("--n-run-rate", type=float, default=0.0,
                    help="per-read probability of a mid-read N run")
    ap.add_argument("--qual-offset", type=int, default=33,
                    help="FASTQ quality encoding offset (64 = PHRED+64)")
    args = ap.parse_args()
    if args.fast:
        main_fast(args)
        return

    rng = random.Random(args.seed)
    import os
    os.makedirs(os.path.dirname(args.out_prefix) or ".", exist_ok=True)
    fa = open(args.out_prefix + "_1.fastq", "w")
    fb = open(args.out_prefix + "_2.fastq", "w")
    for n in range(args.pairs):
        (fs, fq), (rs, rq) = make_pair(rng, args.read_len, args.amp_min,
                                       args.amp_max, args.fwd_primer,
                                       args.rev_primer, args.cliff_rate,
                                       args.n_run_rate, args.qual_offset)
        ident = (f"M00000:7:000000000-TEST1:1:1101:{10000 + n}:{2000 + n}")
        fa.write(f"@{ident} 1:N:0:{args.tag}\n{fs}\n+\n{fq}\n")
        fb.write(f"@{ident} 2:N:0:{args.tag}\n{rs}\n+\n{rq}\n")
    fa.close()
    fb.close()
    print(f"wrote {args.pairs} pairs to {args.out_prefix}_[12].fastq")


if __name__ == "__main__":
    main()
