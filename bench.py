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
BATCH = int(os.environ.get("BENCH_BATCH", "1024"))
# exact multiple of BATCH so no partial-batch shape compiles mid-timing
N_PAIRS = int(os.environ.get("BENCH_PAIRS", str(BATCH * 40)))
DEPTH = int(os.environ.get("BENCH_DEPTH", "6"))


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
    from pandaseq_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import fastq as fq
    from pandaseq_tpu.io import output as out_mod

    from pandaseq_tpu.io import native

    use_native = native.get_lib() is not None

    def batches():
        if use_native:
            yield from native.NativeBatchReader(B1, B2, policy="PRESENT",
                                                batch=BATCH, L=512)
            return
        reader = fq.read_pairs(B1, B2, policy="PRESENT")
        done = False
        while not done:
            chunk = []
            while len(chunk) < BATCH:
                try:
                    chunk.append(next(reader))
                except (StopIteration, fq.StreamError):
                    done = True
                    break
            if chunk:
                yield chunk

    log("decoder: %s" % ("native C++" if use_native else "python"))
    asm = BatchAssembler(L=512)
    # warm-up compile across every shape bucket (pipelined)
    for _ in asm.emit_stream(batches(), fmt="fasta", depth=DEPTH):
        pass

    asm = BatchAssembler(L=512)
    t0 = time.perf_counter()
    n_in = 0
    n_out = 0
    sink = bytearray()
    from pandaseq_tpu.io.prefetch import prefetch
    for _, codes, payload in asm.emit_stream(prefetch(batches(),
                                                      depth=DEPTH + 2),
                                             depth=DEPTH,
                                             threaded=True):
        sink += payload
        n_in += len(codes)
    n_out = asm.counters.ok
    total = time.perf_counter() - t0
    log(f"decode+assemble+format: {n_in} pairs in {total:.2f}s "
        f"({asm.counters.ok} OK)")
    log(f"end-to-end: {n_in/total:.0f} pairs/s")
    return n_in / total


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
