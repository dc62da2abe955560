"""BGZF writer tests: native multithreaded path vs pure Python, round trips."""

import gzip
import io
import time

import numpy as np

from lariat_tpu.io import bgzf


def _roundtrip(data, use_native):
    buf = io.BytesIO()
    w = bgzf.BGZFWriter(buf, level=2)
    if not use_native:
        w._native = None
    w.write(data)
    w.close()
    buf.seek(0)
    return gzip.open(buf).read(), buf.getvalue()


def test_bgzf_roundtrip_both_paths():
    rng = np.random.default_rng(9)
    data = rng.integers(0, 255, 10_000_000, dtype=np.uint8).tobytes()[:9_999_123]
    out_py, raw_py = _roundtrip(data, use_native=False)
    out_nat, raw_nat = _roundtrip(data, use_native=True)
    assert out_py == data
    assert out_nat == data
    # both end with the standard EOF marker
    assert raw_py.endswith(bgzf.BGZF_EOF)
    assert raw_nat.endswith(bgzf.BGZF_EOF)


def test_bgzf_native_available(tmp_path):
    assert bgzf._get_native() is not None, "native bgzf should build here"
    # highly compressible data round-trips through the native path too
    data = b"ACGT" * (4 << 20)
    out, raw = _roundtrip(data, use_native=True)
    assert out == data
