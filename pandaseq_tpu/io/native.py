"""ctypes bindings for the native C++ paired-FASTQ decoder
(native/psq_io.cpp), with lazy on-demand compilation.

Yields `assembler.Batch` objects (already padded [B, L] tensors) so the
hot path never materializes per-read Python objects; per-pair views are
created lazily only for module prechecks / oracle fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(os.path.dirname(_HERE), "native", "psq_io.cpp")
_SO = os.path.join(os.path.dirname(_HERE), "native", "_psq_io.so")

MAX_LEN = 450

ERROR_CODES = {0: None, 1: "EOF", 2: "BADID", 3: "NOTPAIRED", 4: "BADNT",
               5: "BADSEQ", 6: "READLEN", 7: "NOQUAL"}

_lib = None


def _find_bz2():
    for p in ("/usr/lib/x86_64-linux-gnu/libbz2.so.1", "/usr/lib/libbz2.so",
              "/usr/lib64/libbz2.so.1"):
        if os.path.exists(p):
            return p
    return "-lbz2"


def build(force: bool = False) -> str | None:
    """Compile the native decoder if needed; returns .so path or None."""
    if not os.path.exists(_SRC):
        return None
    if (not force and os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO,
           _SRC, "-lz", _find_bz2()]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return _SO


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.psq_open_pair.restype = ctypes.c_void_p
    lib.psq_open_pair.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int, ctypes.c_int,
                                  ctypes.c_char_p]
    lib.psq_next_batch.restype = ctypes.c_long
    lib.psq_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p]
    lib.psq_stream_flags.restype = ctypes.c_int
    lib.psq_stream_flags.argtypes = [ctypes.c_void_p]
    lib.psq_close.argtypes = [ctypes.c_void_p]
    lib.psq_quality.restype = None
    lib.psq_quality.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                ctypes.c_long, ctypes.c_void_p,
                                ctypes.c_void_p, ctypes.c_void_p]
    lib.psq_primer_align.restype = None
    lib.psq_primer_align.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p, ctypes.c_long,
                                     ctypes.c_long, ctypes.c_void_p,
                                     ctypes.c_long, ctypes.c_void_p]
    _lib = lib
    return lib


def primer_align(nt, probs, notprobs, primer):
    """Native ascending-order primer alignment sums; None w/o the lib."""
    lib = get_lib()
    if lib is None:
        return None
    nt = np.ascontiguousarray(nt, dtype=np.int8)
    probs = np.ascontiguousarray(probs, dtype=np.float64)
    notprobs = np.ascontiguousarray(notprobs, dtype=np.float64)
    primer = np.ascontiguousarray(primer, dtype=np.int8)
    B, S = nt.shape
    A = np.empty((B, S), dtype=np.float64)
    lib.psq_primer_align(nt.ctypes.data, probs.ctypes.data,
                         notprobs.ctypes.data, B, S, primer.ctypes.data,
                         len(primer), A.ctypes.data)
    return A


def quality(seq: np.ndarray, ptbl: np.ndarray,
            seq_len: np.ndarray) -> np.ndarray | None:
    """Exact mean quality via the native single-pass kernel; None when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    seq = np.ascontiguousarray(seq, dtype=np.int32)
    seq_len32 = np.ascontiguousarray(seq_len, dtype=np.int32)
    B, L2 = seq.shape
    out = np.empty(B, dtype=np.float64)
    lib.psq_quality(seq.ctypes.data, B, L2, ptbl.ctypes.data,
                    seq_len32.ctypes.data, out.ctypes.data)
    return out


class IdStr(str):
    """Canonical id string that quacks like SeqId where modules need it."""

    __slots__ = ()

    @property
    def tag(self):
        return self.rsplit(":", 1)[1]


class _PairView:
    """Lazy per-pair view over batch rows (for prechecks / oracle
    fallback / fail output)."""

    __slots__ = ("_b", "_i")

    def __init__(self, b, i):
        self._b = b
        self._i = i

    @property
    def sid(self):
        return self._b.sids[self._i]

    @property
    def fwd_nt(self):
        return self._b.fwd_nt[self._i]

    @property
    def fwd_q(self):
        return self._b.fwd_q[self._i]

    @property
    def rev_nt(self):
        return self._b.rev_nt[self._i]

    @property
    def rev_q(self):
        return self._b.rev_q[self._i]

    @property
    def flen(self):
        return int(self._b.flen[self._i])

    @property
    def rlen(self):
        return int(self._b.rlen[self._i])


class _LazyViews:
    __slots__ = ("_b",)

    def __init__(self, b):
        self._b = b

    def __getitem__(self, i):
        return _PairView(self._b, i)

    def __len__(self):
        return len(self._b.sids)

    def __iter__(self):
        for i in range(len(self)):
            yield _PairView(self._b, i)


POLICY_MAP = {"OPTIONAL": 0, "ABSENT": 1, "PRESENT": 2}
ID_STRIDE = 416


class NativeBatchReader:
    """Streams `assembler.Batch` objects of up to `batch` pairs."""

    def __init__(self, fwd_path: str, rev_path: str, qualmin: int = 33,
                 policy: str = "PRESENT", batch: int = 1024, L: int = 512,
                 index_path: str | None = None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native decoder unavailable")
        self.lib = lib
        self.batch = batch
        self.L = L
        self.error = None
        self.seen_under_64 = False
        self.non_empty = False
        if index_path is not None:
            policy = "OPTIONAL"  # index mode forces it (fastq.c:231)
        self.h = lib.psq_open_pair(fwd_path.encode(), rev_path.encode(),
                                   qualmin, POLICY_MAP[policy],
                                   index_path.encode() if index_path
                                   else None)
        if not self.h:
            raise OSError("cannot open %s / %s" % (fwd_path, rev_path))

    def __iter__(self):
        return self

    def __next__(self):
        from ..assembler import Batch
        if self.h is None:
            raise StopIteration
        B, L = self.batch, self.L
        fwd_nt = np.zeros((B, L), dtype=np.int8)
        fwd_q = np.zeros((B, L), dtype=np.int8)
        rev_nt = np.zeros((B, L), dtype=np.int8)
        rev_q = np.zeros((B, L), dtype=np.int8)
        flen = np.zeros(B, dtype=np.int32)
        rlen = np.zeros(B, dtype=np.int32)
        ids = np.zeros((B, ID_STRIDE), dtype=np.uint8)
        err = ctypes.c_int32(0)
        n = self.lib.psq_next_batch(
            self.h, B, L,
            fwd_nt.ctypes.data, fwd_q.ctypes.data, rev_nt.ctypes.data,
            rev_q.ctypes.data, flen.ctypes.data, rlen.ctypes.data,
            ids.ctypes.data, ID_STRIDE, ctypes.byref(err))
        flags = self.lib.psq_stream_flags(self.h)
        self.seen_under_64 = bool(flags & 1)
        self.non_empty = bool(flags & 2)
        if err.value:
            self.error = ERROR_CODES.get(err.value, "UNKNOWN")
        if n == 0:
            self.close()
            raise StopIteration
        if n < B:
            fwd_nt, fwd_q = fwd_nt[:n], fwd_q[:n]
            rev_nt, rev_q = rev_nt[:n], rev_q[:n]
            flen, rlen = flen[:n], rlen[:n]
            ids = ids[:n]
        sids = [IdStr(bytes(row).split(b"\0", 1)[0].decode())
                for row in ids]
        b = Batch(sids, fwd_nt, fwd_q, rev_nt, rev_q, flen, rlen, None)
        b.pairs = _LazyViews(b)
        return b

    def close(self):
        if self.h is not None:
            self.lib.psq_close(self.h)
            self.h = None
