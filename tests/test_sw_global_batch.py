"""Batched global alignment vs scalar host reference: scores and cigars."""

import numpy as np
import pytest

from lariat_tpu.align import ksw
from lariat_tpu.ops import sw_global_batch

MAT = ksw.fill_score_matrix(1, 4)


@pytest.mark.parametrize("seed", range(4))
def test_global_batch_equals_host(seed):
    rng = np.random.default_rng(seed + 50)
    tasks = []
    for _ in range(24):
        qlen = int(rng.integers(5, 110))
        ref = rng.integers(0, 4, 200)
        q = ref[:qlen].copy()
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, qlen))
            q[p] = (q[p] + rng.integers(1, 4)) % 4
        t = ref[:qlen + int(rng.integers(-4, 5))].copy()
        if len(t) < 1:
            t = ref[:1].copy()
        w = int(rng.choice([10, 25, 100]))
        tasks.append((q, t, w))
    B = len(tasks)
    Lq = max(len(q) for q, _, _ in tasks)
    Lt = max(len(t) for _, t, _ in tasks)
    n_col = max(min(len(q), 2 * w + 1) for q, _, w in tasks)
    qa = np.zeros((B, Lq), np.int32)
    ta = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    wv = np.zeros(B, np.int32)
    for i, (q, t, w) in enumerate(tasks):
        qa[i, :len(q)] = q
        ta[i, :len(t)] = t
        qlen[i], tlen[i], wv[i] = len(q), len(t), w
    res = sw_global_batch.global_batch(qa, qlen, ta, tlen, np.asarray(MAT),
                                       wv, n_col)
    z = np.asarray(res.z)
    begs = np.asarray(res.beg)
    for i, (q, t, w) in enumerate(tasks):
        want_score, want_cigar = ksw.global_align(
            q.astype(np.int64), t.astype(np.int64), MAT, 6, 1, 6, 1, w)
        assert int(res.score[i]) == want_score, (seed, i)
        got_cigar = sw_global_batch.traceback(z[i], begs[i], len(q), len(t), w)
        assert got_cigar == want_cigar, (seed, i)
