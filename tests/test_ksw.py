"""DP kernel tests: vectorized ksw vs brute-force scalar implementations."""

import numpy as np
import pytest

from lariat_tpu.align import ksw

MAT = ksw.fill_score_matrix(1, 4)
O_DEL = E_DEL = O_INS = E_INS = None  # set below
O_DEL, E_DEL, O_INS, E_INS = 6, 1, 6, 1


def brute_extend(query, target, mat, o_del, e_del, o_ins, e_ins, w,
                 end_bonus, zdrop, h0):
    """Direct transcription of the scalar ksw_extend2 control flow."""
    qlen, tlen = len(query), len(target)
    if qlen == 0:
        return ksw.ExtendResult(h0, 0, 0, 0, h0, 0)
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    max_sc = int(mat.max())
    max_ins = max(int((qlen * max_sc + end_bonus - o_ins) / e_ins + 1.0), 1)
    max_del = max(int((qlen * max_sc + end_bonus - o_del) / e_del + 1.0), 1)
    w = min(w, max_ins, max_del)
    eh_h = [0] * (qlen + 2)
    eh_e = [0] * (qlen + 2)
    eh_h[0] = h0
    eh_h[1] = h0 - oe_ins if h0 > oe_ins else 0
    j = 2
    while j <= qlen and eh_h[j - 1] > e_ins:
        eh_h[j] = eh_h[j - 1] - e_ins
        j += 1
    max_score, max_i, max_j, max_ie, gscore, max_off = h0, -1, -1, -1, -1, 0
    for i in range(tlen):
        f = 0
        m = 0
        mj = -1
        beg = i - w if i > w else 0
        end = min(i + w + 1, qlen)
        if beg == 0:
            h1 = h0 - (o_del + e_del * (i + 1))
            h1 = max(h1, 0)
        else:
            h1 = 0
        for jj in range(beg, end):
            M, e = eh_h[jj], eh_e[jj]
            eh_h[jj] = h1
            M = M + int(mat[target[i], query[jj]]) if M else 0
            h = max(M, e, f)
            h1 = h
            if m <= h:
                mj = jj
                m = h
            t = max(M - oe_del, 0)
            e = max(e - e_del, t)
            eh_e[jj] = e
            t = max(M - oe_ins, 0)
            f = max(f - e_ins, t)
        eh_h[end] = h1
        eh_e[end] = 0
        if end == qlen and gscore < h1:
            max_ie, gscore = i, h1
        if m == 0:
            break
        if m > max_score:
            max_score, max_i, max_j = m, i, mj
            max_off = max(max_off, abs(mj - i))
        elif zdrop > 0:
            if i - max_i > mj - max_j:
                if max_score - m - ((i - max_i) - (mj - max_j)) * e_del > zdrop:
                    break
            else:
                if max_score - m - ((mj - max_j) - (i - max_i)) * e_ins > zdrop:
                    break
    return ksw.ExtendResult(max_score, max_j + 1, max_i + 1, max_ie + 1,
                            gscore, max_off)


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


@pytest.mark.parametrize("seed", range(8))
def test_extend_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    qlen = int(rng.integers(5, 120))
    ref = rng.integers(0, 4, 400).astype(np.int64)
    query = _mutate(rng, ref[:qlen], int(rng.integers(0, 4)),
                    int(rng.integers(0, 2)))
    target = ref[:int(rng.integers(qlen // 2, 300))]
    for h0 in (19, 40):
        got = ksw.extend(query, target, MAT, O_DEL, E_DEL, O_INS, E_INS,
                         100, 5, 100, h0)
        want = brute_extend(query, target, MAT, O_DEL, E_DEL, O_INS, E_INS,
                            100, 5, 100, h0)
        assert got == want, (seed, h0)


def brute_global(query, target, mat, o_del, e_del, o_ins, e_ins, w):
    """Plain banded Needleman-Wunsch scoring DP for cross-checking the score."""
    qlen, tlen = len(query), len(target)
    NEG = ksw.MINUS_INF
    H = np.full((tlen + 1, qlen + 1), NEG, dtype=np.int64)
    Ee = np.full((tlen + 1, qlen + 1), NEG, dtype=np.int64)
    Ff = np.full((tlen + 1, qlen + 1), NEG, dtype=np.int64)
    H[0, 0] = 0
    for j in range(1, min(qlen, w) + 1):
        H[0, j] = -(o_ins + e_ins * j)
    for i in range(1, tlen + 1):
        if i - 1 <= w:
            H[i, 0] = -(o_del + e_del * i)
        for j in range(max(1, i - w), min(qlen, i + w) + 1):
            m = H[i - 1, j - 1] + int(mat[target[i - 1], query[j - 1]])
            Ee[i, j] = max(Ee[i - 1, j] - e_del, H[i - 1, j] - o_del - e_del)
            Ff[i, j] = max(Ff[i, j - 1] - e_ins, H[i, j - 1] - o_ins - e_ins)
            H[i, j] = max(m, Ee[i, j], Ff[i, j])
    return int(H[tlen, qlen])


@pytest.mark.parametrize("seed", range(8))
def test_global_score_and_cigar(seed):
    rng = np.random.default_rng(seed + 100)
    qlen = int(rng.integers(10, 100))
    ref = rng.integers(0, 4, 200).astype(np.int64)
    query = _mutate(rng, ref[:qlen], int(rng.integers(0, 4)),
                    int(rng.integers(0, 3)))
    target = ref[:qlen + int(rng.integers(-3, 4))]
    if len(target) < 1:
        return
    w = 20
    score, cigar = ksw.global_align(query, target, MAT,
                                    O_DEL, E_DEL, O_INS, E_INS, w)
    # cigar must consume the full query (M/I) and target (M/D)
    qc = sum(l for op, l in cigar if op in (0, 1))
    tc = sum(l for op, l in cigar if op in (0, 2))
    assert qc == len(query) and tc == len(target)
    # score from cigar walk must equal reported score
    s, x, y = 0, 0, 0
    for op, l in cigar:
        if op == 0:
            for k in range(l):
                s += int(MAT[target[y + k], query[x + k]])
            x, y = x + l, y + l
        elif op == 1:
            s -= O_INS + E_INS * l
            x += l
        else:
            s -= O_DEL + E_DEL * l
            y += l
    assert s == score
    # independent scoring DP agrees (bwa band edge semantics differ slightly
    # at the band boundary; use generous band so both are interior)
    assert score == brute_global(query, target, MAT,
                                 O_DEL, E_DEL, O_INS, E_INS, w)


def brute_local(query, target, mat, o_del, e_del, o_ins, e_ins):
    qlen, tlen = len(query), len(target)
    H = np.zeros((tlen + 1, qlen + 1), dtype=np.int64)
    E = np.zeros((tlen + 1, qlen + 1), dtype=np.int64)
    F = np.zeros((tlen + 1, qlen + 1), dtype=np.int64)
    best, ti, qi = 0, -1, -1
    for i in range(1, tlen + 1):
        for j in range(1, qlen + 1):
            E[i, j] = max(E[i - 1, j] - e_del, H[i - 1, j] - o_del - e_del, 0)
            F[i, j] = max(F[i, j - 1] - e_ins, H[i, j - 1] - o_ins - e_ins, 0)
            H[i, j] = max(0, H[i - 1, j - 1] + int(mat[target[i - 1], query[j - 1]]),
                          E[i, j], F[i, j])
            if H[i, j] > best:
                best, ti, qi = int(H[i, j]), i - 1, j - 1
    return best, ti, qi


@pytest.mark.parametrize("seed", range(8))
def test_local_matches_bruteforce(seed):
    rng = np.random.default_rng(seed + 200)
    qlen = int(rng.integers(20, 100))
    ref = rng.integers(0, 4, 500).astype(np.int64)
    off = int(rng.integers(0, 300))
    query = _mutate(rng, ref[off:off + qlen], int(rng.integers(0, 5)),
                    int(rng.integers(0, 2)))
    target = ref[:400]
    got = ksw.local_align(query, target, MAT, O_DEL, E_DEL, O_INS, E_INS, 19)
    best, ti, qi = brute_local(query, target, MAT, O_DEL, E_DEL, O_INS, E_INS)
    assert got.score == best
    if best >= 19:
        assert got.te == ti
        # start coords: alignment [qb..qe]x[tb..te] must rescore to best
        sub = ksw.local_align(query[got.qb:got.qe + 1],
                              target[got.tb:got.te + 1], MAT,
                              O_DEL, E_DEL, O_INS, E_INS, 19)
        assert sub.score == best


def test_global_long_insertion_traceback():
    """Multi-base insertions exercise the F-extend direction bits (value 2
    at bits 4-5); a mis-encoded bit walks the insertion as a deletion."""
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 4, 60).astype(np.int64)
    # query = target with a 6-base insertion in the middle
    ins = rng.integers(0, 4, 6).astype(np.int64)
    query = np.concatenate([ref[:30], ins, ref[30:]])
    score, cigar = ksw.global_align(query, ref, MAT, O_DEL, E_DEL,
                                    O_INS, E_INS, 20)
    qc = sum(l for op, l in cigar if op in (0, 1))
    tc = sum(l for op, l in cigar if op in (0, 2))
    assert qc == len(query) and tc == len(ref)
    assert (1, 6) in cigar, cigar  # the 6I must appear as an insertion
    # score from cigar equals reported score
    s, x, y = 0, 0, 0
    for op, l in cigar:
        if op == 0:
            for k in range(l):
                s += int(MAT[ref[y + k], query[x + k]])
            x, y = x + l, y + l
        elif op == 1:
            s -= O_INS + E_INS * l
            x += l
        else:
            s -= O_DEL + E_DEL * l
            y += l
    assert s == score


@pytest.mark.parametrize("seed", range(6))
def test_local_native_u8_vs_python(seed):
    """Native striped local SW (uint8 16-lane path for match=1 scoring,
    int16 8-lane for match=2) must match the pure-Python scalar core on
    every output field, including score2/te2 column bookkeeping and the
    first-max qe tie rule. Covers native/ksw.cpp local_core_sse_u8."""
    import dataclasses

    native = ksw._get_native()
    if native is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(seed + 900)
    mat2 = ksw.fill_score_matrix(2, 3)
    for it in range(40):
        qlen = int(rng.integers(2, 180))
        glen = int(rng.integers(qlen, 620))
        refseq = rng.integers(0, 5, glen + 210).astype(np.int64)
        off = int(rng.integers(0, max(1, glen - qlen)))
        q = _mutate(rng, refseq[off:off + qlen].copy(),
                    int(rng.integers(0, 6)), int(rng.integers(0, 3)))
        t = refseq[:glen]
        mat = MAT if it % 2 else mat2
        minsc = int(rng.choice([1, 19, 40]))
        score, te, qe, score2, te2 = ksw._local_core(
            q, t, mat, O_DEL, E_DEL, O_INS, E_INS, minsc, 1 << 30)
        if te < 0 or score < minsc:
            ref_res = ksw.LocalResult(score, -1, -1, -1, -1, score2, te2)
        else:
            rq = q[:qe + 1][::-1].copy()
            rt = t[:te + 1][::-1].copy()
            _, te_r, qe_r, _, _ = ksw._local_core(
                rq, rt, mat, O_DEL, E_DEL, O_INS, E_INS, 1 << 30, score)
            ref_res = ksw.LocalResult(score, qe - qe_r, qe, te - te_r, te,
                                      score2, te2)
        nat_res = ksw.local_align_batch_native(
            [(q, t)], mat, O_DEL, E_DEL, O_INS, E_INS, minsc)[0]
        assert dataclasses.astuple(ref_res) == dataclasses.astuple(nat_res)


def test_local_batch16_grouping_vs_single(seed=0):
    """ksw_local_batch's 16-lane same-shape forward grouping (plus scalar
    tail and odd-shape fallback) must equal per-task local_align on every
    field. Covers native/ksw.cpp local_fwd16_u8 + local_finish_from_fwd."""
    import dataclasses

    if ksw._get_native() is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(321)
    tasks = []
    tl = 412
    for i in range(41):  # two full octade groups + scalar tail
        t = rng.integers(0, 5 if i % 6 == 0 else 4, tl).astype(np.int64)
        off = int(rng.integers(0, tl - 160))
        q = t[off:off + 151].copy()
        nm = int(rng.integers(0, 8))
        ix = rng.integers(0, 151, nm)
        q[ix] = (q[ix] + rng.integers(1, 4, nm)) % 4
        if i % 9 == 0:
            q = rng.integers(0, 4, 151).astype(np.int64)  # no alignment
        tasks.append((q, t))
    for ql, tl2 in ((2, 3), (77, 300), (151, 200)):  # odd shapes
        tasks.append((rng.integers(0, 4, ql).astype(np.int64),
                      rng.integers(0, 4, tl2).astype(np.int64)))
    got = ksw.local_align_batch_native(tasks, MAT, O_DEL, E_DEL, O_INS,
                                       E_INS, 19)
    for (q, t), g in zip(tasks, got):
        want = ksw.local_align(q, t, MAT, O_DEL, E_DEL, O_INS, E_INS, 19)
        assert dataclasses.astuple(want) == dataclasses.astuple(g)
