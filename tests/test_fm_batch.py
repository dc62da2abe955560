"""Batched device FM-index ops vs host FMIndex."""

import numpy as np
import pytest

from lariat_tpu.index import fmindex
from lariat_tpu.ops import fm_batch
from lariat_tpu.align import seeding


@pytest.fixture(scope="module")
def phix_pair(request):
    inputs = request.getfixturevalue("reference_inputs")
    fm = fmindex.load_bwa_index(str(inputs / "phix" / "PhiX.fa"))
    return fm, fm_batch.DeviceFMIndex.from_host(fm)


def test_occ4_batch(phix_pair):
    fm, fmd = phix_pair
    rng = np.random.default_rng(4)
    ks = np.concatenate([rng.integers(-1, fm.seq_len + 1, 64),
                         [-1, 0, fm.primary, fm.seq_len]]).astype(np.int64)
    got = np.asarray(fm_batch.occ4_batch(fmd, ks))
    for i, k in enumerate(ks):
        np.testing.assert_array_equal(got[i], fm.occ4(int(k)), str(k))


def test_bwt_extend_batch(phix_pair):
    fm, fmd = phix_pair
    rng = np.random.default_rng(5)
    x0s, x1s, ss = [], [], []
    cases = []
    for _ in range(20):
        c = int(rng.integers(0, 4))
        ik = seeding.set_intv(fm, c)
        # extend a few steps on the host to get varied intervals
        for _ in range(int(rng.integers(0, 3))):
            ok = seeding.bwt_extend(fm, ik, is_back=bool(rng.integers(0, 2)))
            pick = max(range(4), key=lambda j: ok[j][2])
            if ok[pick][2] <= 0:
                break
            ik = ok[pick]
        cases.append(ik)
        x0s.append(ik[0]); x1s.append(ik[1]); ss.append(ik[2])
    for is_back in (False, True):
        o0, o1, os_ = fm_batch.bwt_extend_batch(
            fmd, np.array(x0s, np.int64), np.array(x1s, np.int64),
            np.array(ss, np.int64), is_back)
        o0, o1, os_ = map(np.asarray, (o0, o1, os_))
        for i, ik in enumerate(cases):
            want = seeding.bwt_extend(fm, ik, is_back)
            for c in range(4):
                assert (int(o0[i, c]), int(o1[i, c]), int(os_[i, c])) == want[c]


def test_exact_match_batch(phix_pair):
    fm, fmd = phix_pair
    text = np.concatenate([
        fmindex.unpack_2bit(fm.pac, fm.l_pac),
        (3 - fmindex.unpack_2bit(fm.pac, fm.l_pac))[::-1]])
    rng = np.random.default_rng(6)
    B, L = 16, 40
    reads = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    starts = []
    for i in range(B):
        ln = int(rng.integers(20, L + 1))
        st = int(rng.integers(0, fm.l_pac - L))
        reads[i, :ln] = text[st:st + ln]
        lens[i] = ln
        starts.append((st, ln))
    k, l = fm_batch.exact_match_batch(fmd, reads, lens)
    k, l = np.asarray(k), np.asarray(l)
    for i, (st, ln) in enumerate(starts):
        # host reference interval
        hk, hl = 0, fm.seq_len
        for c in reads[i, :ln][::-1]:
            hk, hl = fm.backward_ext(hk, hl, int(c))
        assert (int(k[i]), int(l[i])) == (hk, hl)
        hits = [fm.sa_lookup(r) for r in range(hk, hl + 1)]
        assert st in hits
