"""fmt_f6 (the native fixed-6-decimal quality formatter, output.c:85-126
";%f" suffix) must be byte-identical to printf "%f" over [0, 1] —
including half-ulp ties (nearest-even), subnormals, and the k/1e6
lattice where rounding decisions flip."""

import ctypes

import numpy as np
import pytest

from pandaseq_tpu.io import native


def _hook():
    so = native.build()
    if so is None:
        pytest.skip("native library unavailable")
    lib = ctypes.CDLL(so)
    lib.psq_fmt_f6_test.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                    ctypes.c_void_p, ctypes.c_long]
    return lib


def test_fmt_f6_matches_printf():
    lib = _hook()
    rng = np.random.RandomState(7)
    parts = [
        rng.uniform(0, 1, 50_000),
        np.exp(-rng.exponential(0.5, 50_000)),  # the actual value shape
        10.0 ** rng.uniform(-320, 0, 20_000),   # down into subnormals
        rng.randint(0, 1000001, 20_000).astype(np.float64) / 1e6,
        (rng.randint(0, 2000001, 20_000).astype(np.float64) + 0.5) / 1e6,
        np.array([0.0, 1.0, 5e-324, 1e-6, 0.4999995, 0.5000005,
                  0.9999995]),
    ]
    v = np.clip(np.concatenate(parts), 0.0, 1.0)
    out = np.zeros((len(v), 16), dtype=np.uint8)
    lib.psq_fmt_f6_test(v.ctypes.data, len(v), out.ctypes.data, 16)
    for i in range(len(v)):
        got = out[i].tobytes().split(b"\0")[0].decode()
        assert got == "%f" % v[i], (v[i].item(), got)
