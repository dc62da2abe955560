"""Native (C++) ksw kernels vs the numpy reference implementations.

The public ksw functions dispatch to native/ksw.cpp when built; these tests
compare that path against the numpy code forced via LARIAT_NO_NATIVE_KSW.
"""

import dataclasses
import importlib.util
import os
import sys

import numpy as np
import pytest

from lariat_tpu.align import ksw as ksw_default


def _load_numpy_only():
    """A second module instance with native dispatch disabled."""
    os.environ["LARIAT_NO_NATIVE_KSW"] = "1"
    try:
        spec = importlib.util.spec_from_file_location(
            "ksw_numpy_only", os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "lariat_tpu", "align", "ksw.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ksw_numpy_only"] = mod
        spec.loader.exec_module(mod)
        assert mod._get_native() is None
        return mod
    finally:
        del os.environ["LARIAT_NO_NATIVE_KSW"]


ksw_np = _load_numpy_only()
MAT = ksw_default.fill_score_matrix(1, 4)


def _mutate(rng, seq, n_sub, n_indel):
    seq = list(seq)
    for _ in range(n_sub):
        p = rng.integers(0, len(seq))
        seq[p] = (seq[p] + rng.integers(1, 4)) % 4
    for _ in range(n_indel):
        p = int(rng.integers(0, len(seq)))
        if rng.random() < 0.5:
            seq.insert(p, int(rng.integers(0, 4)))
        else:
            del seq[p]
    return np.array(seq, dtype=np.int64)


@pytest.mark.skipif(ksw_default._get_native() is None,
                    reason="native library unavailable")
@pytest.mark.parametrize("seed", range(6))
def test_native_matches_numpy(seed):
    rng = np.random.default_rng(seed * 31 + 7)
    for _ in range(25):
        qlen = int(rng.integers(5, 160))
        ref = rng.integers(0, 5, 500).astype(np.int64)  # incl. N=4
        q = _mutate(rng, ref[:qlen], int(rng.integers(0, 6)),
                    int(rng.integers(0, 3)))
        t = ref[:int(rng.integers(max(1, qlen // 2), 400))]
        w = int(rng.integers(5, 120))
        h0 = int(rng.integers(1, 60))
        a = ksw_default.extend(q, t, MAT, 6, 1, 6, 1, w, 5, 100, h0)
        b = ksw_np.extend(q, t, MAT, 6, 1, 6, 1, w, 5, 100, h0)
        assert dataclasses.astuple(a) == dataclasses.astuple(b)
        t2 = ref[:qlen + int(rng.integers(-4, 5))]
        if len(t2) >= 1:
            # traceback defined only for w >= |qlen - tlen| (engine invariant)
            wg = max(int(rng.integers(3, 40)), abs(len(q) - len(t2)))
            sa, ca = ksw_default.global_align(q, t2, MAT, 6, 1, 6, 1, wg)
            sb, cb = ksw_np.global_align(q, t2, MAT, 6, 1, 6, 1, wg)
            assert sa == sb and list(ca) == list(cb)
        la = ksw_default.local_align(q, t, MAT, 6, 1, 6, 1, 19)
        lb = ksw_np.local_align(q, t, MAT, 6, 1, 6, 1, 19)
        assert dataclasses.astuple(la) == dataclasses.astuple(lb)


@pytest.mark.skipif(ksw_default._get_native() is None,
                    reason="native library unavailable")
def test_irregular_matrix_falls_back():
    """A non-bwa-structured matrix must take the numpy path, not native."""
    mat = ksw_default.fill_score_matrix(2, 3)
    mat[0, 1] = 5  # break the regular structure
    rng = np.random.default_rng(3)
    q = rng.integers(0, 4, 40).astype(np.int64)
    t = rng.integers(0, 4, 60).astype(np.int64)
    got = ksw_default.extend(q, t, mat, 6, 1, 6, 1, 20, 5, 100, 10)
    want = ksw_np.extend(q, t, mat, 6, 1, 6, 1, 20, 5, 100, 10)
    assert dataclasses.astuple(got) == dataclasses.astuple(want)


def test_gorand_batch_matches_scalar():
    from lariat_tpu.utils.gorand import GoRand
    seeds = [1, -5, 0, 89482311, 2**62 + 12345, -(2**61), 7,
             123456789012345]
    for s, b in zip(seeds, GoRand.batch(seeds)):
        a = GoRand(s)
        assert a.vec == b.vec
        for _ in range(4):
            assert a.uint64() == b.uint64()
