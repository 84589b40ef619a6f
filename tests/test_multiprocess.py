"""REAL multi-process distributed run (two OS processes coordinated by
jax.distributed over localhost) — stronger than the in-process virtual
mesh: it exercises per-host local meshes, cross-process Gloo psum of
the STAT counters, the PandaMux round-robin batch claims on one shared
stream (mux.c:132-161), and the replicated-array fetch path in
reduce_counters (both of the latter had real multi-process bugs the
virtual mesh could not catch)."""

import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "tests", "data")

_WORKER = r"""
import os, sys, json
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
out_dir = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
sys.path.insert(0, %(root)r)
from pandaseq_tpu.parallel import distributed as D
vec, hist = D.run_distributed(
    [(%(f1)r, %(f2)r)], out_dir=out_dir, batch=32)
print("RESULT " + json.dumps({"pid": pid,
                              "vec": [int(x) for x in vec],
                              "hist_sum": int(sum(hist.values()))}))
"""


def test_two_process_mux_and_psum(tmp_path):
    f1 = os.path.join(DATA, "synth_1.fastq")
    f2 = os.path.join(DATA, "synth_2.fastq")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % dict(root=ROOT, f1=f1, f2=f2))
    out_dir = tmp_path / "out"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port, str(out_dir)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=ROOT) for i in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    results = [json.loads(o.rsplit("RESULT ", 1)[1].splitlines()[0])
               for o in outs]
    # every host reports the same psum-reduced GLOBAL counters
    assert results[0]["vec"] == results[1]["vec"]
    assert results[0]["hist_sum"] == results[1]["hist_sum"]

    # both hosts actually worked the one shared stream, and the union
    # of their parts is exactly the single-process output
    parts = [(out_dir / ("part-%05d.fasta" % i)).read_bytes()
             for i in range(2)]
    assert all(len(p) > 0 for p in parts), [len(p) for p in parts]
    from pandaseq_tpu.parallel import distributed as D
    single_dir = tmp_path / "single"
    vec1, hist1 = D.run_distributed([(f1, f2)], out_dir=str(single_dir),
                                    batch=32)
    assert list(vec1) == results[0]["vec"]
    single = (single_dir / "part-00000.fasta").read_bytes()
    recs = []
    for p in parts:
        recs.extend(p.split(b">")[1:])
    assert sorted(recs) == sorted(single.split(b">")[1:])
