"""Host-only candidate search (no device dispatch) must be
byte-identical to the device sparse path: the native psq_cand_mask twin
is the same code that already fixes up hasN rows, so routing every row
through it (PANDASEQ_TPU_HOST=1 / auto on CPU backends) changes only
where the candidate plane is computed, never its contents.
"""

import os

import numpy as np
import pytest

from pandaseq_tpu import oracle
from pandaseq_tpu.assembler import BatchAssembler
from pandaseq_tpu.io import native

DATA = os.path.join(os.path.dirname(__file__), "data")


def _run(host_only, cfg=None, fmt="fasta"):
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    asm = BatchAssembler(cfg or oracle.OracleConfig(), L=512)
    asm._host_only = host_only

    def batches():
        yield from native.NativeBatchReader(
            os.path.join(DATA, "synth_1.fastq"),
            os.path.join(DATA, "synth_2.fastq"),
            policy="PRESENT", batch=1024, L=512)

    payload = bytearray()
    all_codes = []
    for _, codes, pay in asm.emit_stream(batches(), fmt=fmt, depth=2):
        payload += pay
        all_codes.extend(codes)
    return bytes(payload), all_codes, asm.counters


@pytest.mark.parametrize("algo", ["simple_bayesian", "rdp_mle", "pear"])
def test_host_mode_matches_device(algo):
    cfg = oracle.OracleConfig(algorithm=oracle.make_algorithm(algo))
    pd, cd, ctrd = _run(False, cfg)
    ph, ch, ctrh = _run(True, cfg)
    assert pd == ph
    assert cd == ch
    assert ctrd.ok == ctrh.ok and ctrd.lowq == ctrh.lowq \
        and ctrd.noalgn == ctrh.noalgn


def test_host_mode_fastq_payload():
    pd, _, _ = _run(False, fmt="fastq")
    ph, _, _ = _run(True, fmt="fastq")
    assert pd == ph


def test_auto_detection_env_override(monkeypatch):
    # env pinned to "0" by conftest -> device path
    asm = BatchAssembler(L=512)
    assert asm._host_only is None  # decided lazily at first dispatch
    monkeypatch.setenv("PANDASEQ_TPU_HOST", "1")
    b = next(iter(native.NativeBatchReader(
        os.path.join(DATA, "synth_1.fastq"),
        os.path.join(DATA, "synth_2.fastq"),
        policy="PRESENT", batch=256, L=512)))
    st = asm._pre(b)
    plane = asm._dispatch(st)
    assert asm._host_only is True
    assert isinstance(plane, np.ndarray)  # no device array: host mode
    assert len(st["hasN_rows"]) == st["B"]
