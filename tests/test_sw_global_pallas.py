"""Pallas banded-global kernel vs the scalar host reference."""

import numpy as np
import pytest

from lariat_tpu.align import ksw
from lariat_tpu.ops import sw_global_pallas

MAT = np.asarray(ksw.fill_score_matrix(1, 4))


@pytest.mark.parametrize("seed", range(2))
def test_global_pallas_matches_host(seed):
    rng = np.random.default_rng(seed + 70)
    B, Lq, Lt = 10, 96, 112
    qa = np.zeros((B, Lq), np.int32)
    ta = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    wv = np.zeros(B, np.int32)
    cases = []
    for i in range(B):
        ql = int(rng.integers(10, Lq + 1))
        ref = rng.integers(0, 4, Lt + 8)
        q = ref[:ql].copy()
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, ql))
            q[p] = (q[p] + 1) % 4
        tl = max(1, ql + int(rng.integers(-4, 5)))
        t = ref[:tl].copy()
        w = int(rng.choice([10, 25, 100]))
        qa[i, :ql] = q
        ta[i, :tl] = t
        qlen[i], tlen[i], wv[i] = ql, tl, w
        cases.append((q, t, w))
    res = sw_global_pallas.global_batch_pallas(
        qa, qlen, ta, tlen, MAT, wv, tile_b=8, interpret=True)
    z = np.asarray(res.z)
    for i, (q, t, w) in enumerate(cases):
        want_score, want_cigar = ksw.global_align(
            q.astype(np.int64), t.astype(np.int64), MAT, 6, 1, 6, 1, w)
        assert int(res.score[i]) == want_score, (seed, i)
        got = sw_global_pallas.traceback_unpacked(z[i], len(q), len(t), w)
        assert got == want_cigar, (seed, i)


@pytest.mark.parametrize("seed", range(2))
def test_traceback_ops_fused_packed_matches_raw(seed):
    """The 4-ops/byte fused download path == the raw uint8 path (and the
    host reference cigars)."""
    rng = np.random.default_rng(seed + 170)
    B, Lq, Lt = 10, 96, 112
    qa = np.zeros((B, Lq), np.int32)
    ta = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    wv = np.zeros(B, np.int32)
    cases = []
    for i in range(B):
        ql = int(rng.integers(10, Lq + 1))
        ref = rng.integers(0, 4, Lt + 8)
        q = ref[:ql].copy()
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, ql))
            q[p] = (q[p] + 1) % 4
        tl = max(1, ql + int(rng.integers(-6, 7)))
        t = ref[:tl].copy()
        w = int(rng.choice([10, 25]))
        qa[i, :ql] = q
        ta[i, :tl] = t
        qlen[i], tlen[i], wv[i] = ql, tl, w
        cases.append((q, t, w))
    res = sw_global_pallas.global_batch_pallas_packed(
        qa, qlen, ta, tlen, MAT, wv, tile_b=8, interpret=True)
    S = ((Lq + Lt + 3) // 4) * 4
    blob = np.asarray(sw_global_pallas.traceback_ops_fused(
        res.z, qlen, tlen, wv, res.score, S=S))
    packed, score, i_fin, k_fin = sw_global_pallas.split_traceback_blob(
        blob, S)
    got = sw_global_pallas.cigars_from_ops_packed(packed, i_fin, k_fin, S)
    assert got is not None, "native packed finisher missing"
    cig_mat, nops = got
    # raw path for comparison
    ops_buf, i2, k2 = sw_global_pallas.traceback_ops_device(
        res.z, qlen, tlen, wv, S=S)
    raw = sw_global_pallas.cigars_from_ops_raw(
        np.asarray(ops_buf), np.asarray(i2), np.asarray(k2))
    assert raw is not None
    cig_raw, nops_raw = raw
    np.testing.assert_array_equal(nops[:B], nops_raw[:B])
    for i, (q, t, w) in enumerate(cases):
        n = int(nops[i])
        pairs = list(zip(cig_mat[i, 0:2 * n:2].tolist(),
                         cig_mat[i, 1:2 * n:2].tolist()))
        want_score, want_cigar = ksw.global_align(
            q.astype(np.int64), t.astype(np.int64), MAT, 6, 1, 6, 1, w)
        assert int(score[i]) == want_score, (seed, i)
        assert pairs == want_cigar, (seed, i)
