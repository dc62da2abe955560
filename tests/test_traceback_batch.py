"""Batched C++ traceback walkers vs per-task Python walks."""

import numpy as np

def test_traceback_batch_parity():
    from lariat_tpu.align import ksw
    from lariat_tpu.ops import sw_global_batch
    MAT = ksw.fill_score_matrix(1, 4)
    rng = np.random.default_rng(5)
    tasks = []
    for _ in range(40):
        qlen = int(rng.integers(5, 110))
        ref = rng.integers(0, 4, 200)
        q = ref[:qlen].copy()
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, qlen)); q[p] = (q[p] + rng.integers(1, 4)) % 4
        t = ref[:qlen + int(rng.integers(-4, 5))].copy()
        if len(t) < 1: t = ref[:1].copy()
        w = max(int(rng.choice([10, 25, 100])), abs(len(q) - len(t)))
        tasks.append((q, t, w))
    B = len(tasks)
    Lq = max(len(q) for q, _, _ in tasks); Lt = max(len(t) for _, t, _ in tasks)
    n_col = max(min(len(q), 2 * w + 1) for q, _, w in tasks)
    qa = np.zeros((B, Lq), np.int32); ta = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32); tlen = np.zeros(B, np.int32); wv = np.zeros(B, np.int32)
    for i, (q, t, w) in enumerate(tasks):
        qa[i, :len(q)] = q; ta[i, :len(t)] = t
        qlen[i], tlen[i], wv[i] = len(q), len(t), w
    res = sw_global_batch.global_batch(qa, qlen, ta, tlen, np.asarray(MAT), wv, n_col)
    z = np.asarray(res.z); begs = np.asarray(res.beg)
    got = sw_global_batch.traceback_batch(z, begs, qlen, tlen, wv)
    for i, (q, t, w) in enumerate(tasks):
        want = sw_global_batch.traceback(z[i], begs[i], len(q), len(t), w)
        assert got[i] == want, (i, got[i], want)
    # pallas interpret path
    from lariat_tpu.ops import sw_global_pallas
    res2 = sw_global_pallas.global_batch_pallas(qa, qlen, ta, tlen, np.asarray(MAT),
                                                wv, interpret=True)
    z2 = np.asarray(res2.z)
    got2 = sw_global_pallas.traceback_unpacked_batch(z2, qlen, tlen, wv)
    for i, (q, t, w) in enumerate(tasks):
        want2 = sw_global_pallas.traceback_unpacked(z2[i], len(q), len(t), w)
        assert got2[i] == want2, i


def test_pallas_packed_band_matches_unpacked():
    """Device band packing + packed walker == unpacked walker (interpret)."""
    from lariat_tpu.align import ksw
    from lariat_tpu.ops import sw_global_batch, sw_global_pallas
    MAT = ksw.fill_score_matrix(1, 4)
    rng = np.random.default_rng(9)
    B, Lq, Lt = 8, 96, 96
    qa = rng.integers(0, 4, (B, Lq)).astype(np.int32)
    ta = qa.copy()
    for b in range(B):
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, Lq))
            ta[b, p] = (ta[b, p] + 1) % 4
    qlen = np.full(B, Lq, np.int32)
    tlen = np.full(B, Lt, np.int32)
    wv = rng.integers(8, 30, B).astype(np.int32)
    res_u = sw_global_pallas.global_batch_pallas(
        qa, qlen, ta, tlen, np.asarray(MAT), wv, interpret=True, tile_b=8)
    res_p = sw_global_pallas.global_batch_pallas_packed(
        qa, qlen, ta, tlen, np.asarray(MAT), wv, interpret=True, tile_b=8)
    assert np.array_equal(np.asarray(res_u.score), np.asarray(res_p.score))
    want = sw_global_pallas.traceback_unpacked_batch(
        np.asarray(res_u.z), qlen, tlen, wv)
    got = sw_global_batch.traceback_batch(
        np.asarray(res_p.z), np.asarray(res_p.beg), qlen, tlen, wv)
    assert got == want


def test_device_traceback_matches_host_walk():
    """traceback_ops_device + cigars_from_ops == packed host walker."""
    from lariat_tpu.align import ksw
    from lariat_tpu.ops import sw_global_batch, sw_global_pallas
    MAT = ksw.fill_score_matrix(1, 4)
    rng = np.random.default_rng(13)
    B, Lq, Lt = 12, 80, 88
    qa = rng.integers(0, 4, (B, Lq)).astype(np.int32)
    ta = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    wv = np.zeros(B, np.int32)
    for b in range(B):
        ql = int(rng.integers(10, Lq))
        tl = max(1, ql + int(rng.integers(-4, 5)))
        ta[b, :tl] = np.resize(qa[b, :ql], tl)
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, tl))
            ta[b, p] = (ta[b, p] + 1) % 4
        qlen[b], tlen[b] = ql, tl
        wv[b] = max(int(rng.integers(5, 30)), abs(ql - tl))
    # pad entry exercising the inactive lane path
    qlen[-1] = 0
    tlen[-1] = 0
    wv[-1] = 1
    res = sw_global_pallas.global_batch_pallas_packed(
        qa, qlen, ta, tlen, np.asarray(MAT), wv, interpret=True, tile_b=8)
    ops_buf, i_fin, k_fin = sw_global_pallas.traceback_ops_device(
        res.z, qlen, tlen, wv, S=Lq + Lt)
    got = sw_global_pallas.cigars_from_ops(
        np.asarray(ops_buf), np.asarray(i_fin), np.asarray(k_fin))
    want = sw_global_batch.traceback_batch(
        np.asarray(res.z), np.asarray(res.beg), qlen, tlen, wv)
    for b in range(B - 1):
        assert got[b] == want[b], b
