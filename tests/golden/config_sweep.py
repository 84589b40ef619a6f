"""Randomized CONFIG-space sweep: random flag combinations through
both CLIs, byte-comparing stdout against the reference binary.

This sweep found the maxoverlap=0 clamp divergence and the -k>=3
kmerseen misindex quirk. Usage:

    python tests/golden/config_sweep.py <seed> <n_configs>

-k 1 is excluded: the reference reads past its kmerseen table there
(out-of-bounds UB; see PARITY.md) and its output depends on the
binary's heap contents."""

import os, random, subprocess, sys
ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
REF = os.path.join(ROOT, "tests/ref_build/pandaseq-ref")
# optional argv[3]: plain-data prefix, argv[4]: primer-data prefix
_plain = sys.argv[3] if len(sys.argv) > 3 else "tests/data/synth"
_primed = sys.argv[4] if len(sys.argv) > 4 else "tests/data/primer"
F1 = os.path.join(ROOT, _plain + "_1.fastq")
F2 = os.path.join(ROOT, _plain + "_2.fastq")
P1 = os.path.join(ROOT, _primed + "_1.fastq")
P2 = os.path.join(ROOT, _primed + "_2.fastq")
FWD, REV = "GTGCCAGCMGCCGCGGTAA", "GGACTACHVGGGTWTCTAAT"
rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
ALGOS = ["simple_bayesian", "pear", "rdp_mle", "uparse", "ea_util",
         "flash", "stitch"]
fails = 0
for it in range(int(sys.argv[2]) if len(sys.argv) > 2 else 20):
    args = ["-T", "1"]
    use_primer_data = rng.random() < 0.4
    if rng.random() < 0.6:
        args += ["-A", rng.choice(ALGOS)]
    if rng.random() < 0.5:
        args += ["-o", str(rng.choice([1, 2, 5, 10, 35, 60, 900]))]
    if rng.random() < 0.5:
        args += ["-O", str(rng.choice([0, 40, 80, 150, 300, 700, 899, 900]))]
    if rng.random() < 0.4:
        args += ["-k", str(rng.choice([0, 2, 3, 5, 8]))]  # 1: ref UB
    if rng.random() < 0.3:
        args += ["-t", str(rng.choice([0.05, 0.2, 0.45, 0.6, 0.8, 0.9,
                                       0.99]))]
    if rng.random() < 0.2:
        args += ["-B"]
    if rng.random() < 0.3:
        args += ["-l", str(rng.choice([5, 50, 150]))]
    if rng.random() < 0.3:
        args += ["-L", str(rng.choice([120, 260, 440]))]
    if rng.random() < 0.2:
        args += ["-N"]
    if rng.random() < 0.5:  # filter-module chains
        mods = rng.sample(
            ["min_phred:%d" % rng.choice([5, 10, 20]),
             "min_overlapbits",
             "min_overlapbits:%d" % rng.choice([5, 10, 25]),
             "completely_miss_the_point:%d" % rng.choice([0, 2, 6]),
             "empty", "pear_test", "overlap_stat",
             # precheck-stage modules (batched precheck path)
             "validtag:%s" % rng.choice(["ACGTAC", "TTTTTT:GGGGGG"]),
             "other_primer:f:ACGTACGT", "other_primer:r:TGCATG"],
            k=rng.choice([1, 1, 2, 3]))
        for m in mods:
            args += ["-C", m]
    if use_primer_data:
        args += ["-p", FWD, "-q", REV]
        if rng.random() < 0.3:
            args += ["-a"]
        if rng.random() < 0.3:
            args += ["-D", str(rng.choice([0.001, 0.01, 0.1]))]
        files = ["-f", P1, "-r", P2]
    else:
        if rng.random() < 0.25:  # trim-count primers on plain data
            args += ["-p", str(rng.choice([1, 5, 20])),
                     "-q", str(rng.choice([1, 5, 20]))]
        files = ["-f", F1, "-r", F2]
    if "pear" in args and any("pear_test" in a for a in args):
        # the reference binary hangs on -A pear -C pear_test
        # (size_t underflow in the plugin; PARITY.md)
        print("skip [%s] (reference non-termination bug)"
              % " ".join(args), flush=True)
        continue
    try:
        ref = subprocess.run([REF] + args + files, capture_output=True,
                             timeout=120)
    except subprocess.TimeoutExpired:
        print("skip [%s] (reference timed out)" % " ".join(args),
              flush=True)
        continue
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    got = subprocess.run([sys.executable, "-m", "pandaseq_tpu.cli.main"]
                         + args + files, capture_output=True, cwd=ROOT,
                         env=env, timeout=600)
    tag = " ".join(args)
    if ref.stdout != got.stdout:
        fails += 1
        na = ref.stdout.count(b">") + ref.stdout.count(b"@M")
        nb = got.stdout.count(b">") + got.stdout.count(b"@M")
        print("DIFF [%s] ref=%d got=%d rc=%d/%d" % (tag, na, nb,
              ref.returncode, got.returncode), flush=True)
    else:
        print("ok   [%s] (%d bytes)" % (tag, len(ref.stdout)), flush=True)
print("sweep done, %d failures" % fails)
