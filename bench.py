"""Benchmark: read-pairs merged per second, TPU pipeline vs the C reference.

Prints ONE JSON line:
  {"metric": "read_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": R}

where the baseline is the unmodified C reference (pandaseq -T <ncpu>)
running on this machine's CPUs over the same synthetic MiSeq dataset.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(ROOT, "tests", "data")
B1 = os.path.join(DATA, "bench_1.fastq")
B2 = os.path.join(DATA, "bench_2.fastq")
REF_BIN = os.path.join(ROOT, "tests", "ref_build", "pandaseq-ref")
N_PAIRS = int(os.environ.get("BENCH_PAIRS", "20000"))
BATCH = int(os.environ.get("BENCH_BATCH", "1024"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def ensure_data():
    if not (os.path.exists(B1) and os.path.exists(B2)
            and sum(1 for _ in open(B1)) == 4 * N_PAIRS):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tests", "golden",
                                          "make_data.py"),
             "--pairs", str(N_PAIRS), "--seed", "7",
             "--out-prefix", os.path.join(DATA, "bench")],
            check=True, cwd=ROOT, stdout=subprocess.DEVNULL)


def bench_reference() -> float | None:
    """C reference pairs/s with one thread per CPU (its default)."""
    if not os.path.exists(REF_BIN):
        try:
            subprocess.run(["bash", os.path.join(ROOT, "tests", "golden",
                                                 "build_ref.sh")],
                           check=True, capture_output=True)
        except Exception as e:
            log(f"reference build failed: {e}")
            return None
    t0 = time.perf_counter()
    with open(os.devnull, "wb") as devnull:
        subprocess.run([REF_BIN, "-f", B1, "-r", B2], stdout=devnull,
                       stderr=subprocess.DEVNULL, check=False)
    dt = time.perf_counter() - t0
    log(f"reference: {N_PAIRS} pairs in {dt:.2f}s = {N_PAIRS/dt:.0f} pairs/s")
    return N_PAIRS / dt


def bench_tpu() -> float:
    """Full production pipeline: host decode -> device scoring/reconstruct
    -> host exact f64 finalization -> FASTA bytes."""
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod

    # decode once up-front so both timed phases are visible separately
    t0 = time.perf_counter()
    pairs = []
    reader = fq.read_pairs(B1, B2, policy="PRESENT")
    while True:
        try:
            pairs.append(next(reader))
        except (StopIteration, fq.StreamError):
            break
    t_decode = time.perf_counter() - t0
    log(f"decode: {len(pairs)} pairs in {t_decode:.2f}s")

    asm = BatchAssembler(L=512)
    # warm-up compile on the first batch
    asm.assemble_batch(pairs[:BATCH])

    asm = BatchAssembler(L=512)
    t0 = time.perf_counter()
    n_out = 0
    sink = bytearray()
    for i in range(0, len(pairs), BATCH):
        chunk = pairs[i:i + BATCH]
        for code, res in asm.assemble_batch(chunk):
            if code == "OK":
                sink += out_mod.format_fasta(res)
                n_out += 1
    t_asm = time.perf_counter() - t0
    total = t_decode + t_asm
    log(f"assemble+format: {len(pairs)} pairs in {t_asm:.2f}s "
        f"({asm.counters.ok} OK)")
    log(f"end-to-end: {len(pairs)/total:.0f} pairs/s")
    return len(pairs) / total


def main():
    ensure_data()
    ref_rate = bench_reference()
    tpu_rate = bench_tpu()
    vs = round(tpu_rate / ref_rate, 3) if ref_rate else None
    print(json.dumps({"metric": "read_pairs_per_sec",
                      "value": round(tpu_rate, 1),
                      "unit": "pairs/s",
                      "vs_baseline": vs}))


if __name__ == "__main__":
    main()
