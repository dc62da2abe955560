"""SMEM seeding tests against brute-force string search on PhiX."""

import numpy as np
import pytest

from lariat_tpu.align import seeding
from lariat_tpu.config import AlignerConfig
from lariat_tpu.index import fmindex


@pytest.fixture(scope="module")
def phix(request):
    inputs = request.getfixturevalue("reference_inputs")
    return fmindex.load_bwa_index(str(inputs / "phix" / "PhiX.fa"))


def _text(fm):
    fwd = fmindex.unpack_2bit(fm.pac, fm.l_pac)
    return np.concatenate([fwd, (3 - fwd)[::-1]])


def _count_occurrences(text, pat):
    if len(pat) == 0:
        return 0
    tb = text.tobytes()
    pb = pat.astype(np.uint8).tobytes()
    n = start = 0
    while True:
        i = tb.find(pb, start)
        if i < 0:
            return n
        n += 1
        start = i + 1


def test_single_base_interval(phix):
    text = _text(phix)
    for c in range(4):
        x0, x1, s = seeding.set_intv(phix, c)
        assert s == int(np.count_nonzero(text == c))


def test_backward_ext_equals_occurrence_count(phix):
    text = _text(phix)
    rng = np.random.default_rng(2)
    for _ in range(10):
        start = int(rng.integers(0, phix.l_pac - 40))
        pat = text[start:start + 25]
        k, l = 0, phix.seq_len
        for c in pat[::-1]:
            k, l = phix.backward_ext(k, l, int(c))
        assert l - k + 1 == _count_occurrences(text, pat)


def test_smem_properties(phix):
    text = _text(phix)
    rng = np.random.default_rng(3)
    fwd = text[:phix.l_pac]
    for trial in range(6):
        start = int(rng.integers(0, phix.l_pac - 80))
        read = fwd[start:start + 70].copy()
        # sprinkle mutations
        for _ in range(trial % 3):
            p = int(rng.integers(0, len(read)))
            read[p] = (read[p] + 1) % 4
        x = 0
        covered = set()
        while x < len(read):
            nx, mems = seeding.smem1a(phix, read, x, 1, 0)
            for m in mems:
                pat = read[m.qb:m.qe]
                occ = _count_occurrences(text, pat)
                assert m.s == occ, (trial, m)
                assert m.qb <= x < m.qe
                # maximality: extending in either direction reduces occurrences
                if m.qb > 0:
                    assert _count_occurrences(text, read[m.qb - 1:m.qe]) < occ
                if m.qe < len(read):
                    assert _count_occurrences(text, read[m.qb:m.qe + 1]) < occ
                # SA rows dereference to real occurrences of the pattern
                row = m.x0
                p = phix.sa_lookup(row)
                np.testing.assert_array_equal(text[p:p + (m.qe - m.qb)], pat)
                covered.add((m.qb, m.qe))
            assert nx > x
            x = nx
        assert covered


def test_collect_intv_finds_long_seed(phix):
    text = _text(phix)
    read = text[200:200 + 70]
    mems = seeding.collect_intv(phix, read, AlignerConfig())
    # a unique 70-mer: one SMEM spanning the whole read
    spans = [(m.qb, m.qe, m.s) for m in mems]
    assert (0, 70, 1) in spans
    # third-round seeding may add more; all must be >= min_seed_len
    assert all(m.qe - m.qb >= 19 for m in mems)
