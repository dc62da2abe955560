"""Pallas SW-extend kernel vs the XLA batched version (interpret mode on CPU)."""

import numpy as np
import pytest

from lariat_tpu.align import ksw
from lariat_tpu.ops import sw_batch, sw_extend_pallas

MAT = np.asarray(ksw.fill_score_matrix(1, 4))


@pytest.mark.parametrize("seed", range(2))
def test_pallas_extend_matches_batch(seed):
    rng = np.random.default_rng(seed + 300)
    B, Lq, Lt = 12, 96, 160
    qa = rng.integers(0, 4, (B, Lq)).astype(np.int32)
    ta = np.zeros((B, Lt), np.int32)
    qlen = rng.integers(0, Lq + 1, B).astype(np.int32)
    tlen = rng.integers(0, Lt + 1, B).astype(np.int32)
    for i in range(B):
        n = min(int(qlen[i]), int(tlen[i]))
        ta[i, :n] = qa[i, :n]
        extra = int(tlen[i]) - n
        if extra > 0:
            ta[i, n:n + extra] = rng.integers(0, 4, extra)
        for _ in range(int(rng.integers(0, 4))):
            if tlen[i]:
                p = int(rng.integers(0, tlen[i]))
                ta[i, p] = (ta[i, p] + 1) % 4
    h0 = rng.integers(10, 60, B).astype(np.int32)
    w = np.full(B, 40, np.int32)
    want = sw_batch.extend_batch(qa, qlen, ta, tlen, MAT, w, h0)
    got = sw_extend_pallas.extend_batch_pallas(qa, qlen, ta, tlen, MAT, w, h0,
                                               tile_b=8, interpret=True)
    for f in want._fields:
        np.testing.assert_array_equal(np.asarray(getattr(got, f)),
                                      np.asarray(getattr(want, f)), f)


@pytest.mark.parametrize("seed", [11, 12])
def test_pallas_extend_v2_matches_batch(seed):
    """Grid v2 kernel == XLA batch, bit-for-bit (interpret mode)."""
    rng = np.random.default_rng(seed)
    B = int(rng.integers(3, 10))
    Lq = int(rng.integers(8, 60))
    Lt = int(rng.integers(8, 100))
    qa = rng.integers(0, 5, (B, Lq)).astype(np.int64)
    ta = rng.integers(0, 5, (B, Lt)).astype(np.int64)
    qlen = rng.integers(0, Lq + 1, B).astype(np.int64)
    tlen = rng.integers(0, Lt + 1, B).astype(np.int64)
    w = rng.integers(5, 120, B).astype(np.int64)
    h0 = rng.integers(1, 100, B).astype(np.int64)
    want = sw_batch.extend_batch(qa, qlen, ta, tlen, MAT, w, h0)
    got = sw_extend_pallas.extend_batch_pallas_v2(
        qa, qlen, ta, tlen, MAT, w, h0, tile_b=8, interpret=True)
    for f in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
        np.testing.assert_array_equal(
            np.asarray(getattr(want, f)), np.asarray(getattr(got, f)),
            err_msg=f)
