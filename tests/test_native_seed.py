"""Native C++ seeding/SA vs the Python reference implementations."""

import numpy as np
import pytest

from lariat_tpu.align import seeding
from lariat_tpu.config import AlignerConfig
from lariat_tpu.index import fmindex, native_ops


@pytest.fixture(scope="module")
def phix(request):
    inputs = request.getfixturevalue("reference_inputs")
    return fmindex.load_bwa_index(str(inputs / "phix" / "PhiX.fa"))


def test_native_seeds_match_python(phix):
    rng = np.random.default_rng(51)
    text = np.concatenate([
        fmindex.unpack_2bit(phix.pac, phix.l_pac),
        (3 - fmindex.unpack_2bit(phix.pac, phix.l_pac))[::-1]])
    opt = AlignerConfig()
    reads = []
    for t in range(12):
        ln = int(rng.integers(40, 151))
        start = int(rng.integers(0, phix.l_pac - ln))
        r = text[start:start + ln].copy()
        for _ in range(t % 4):
            p = int(rng.integers(0, ln))
            r[p] = (r[p] + 1) % 4
        if t % 5 == 0 and ln > 30:
            r[ln // 2] = 4  # an N
        reads.append(r)
    native = native_ops.collect_seeds_batch(phix, reads, opt)
    assert native is not None
    for r, nat in zip(reads, native):
        py = seeding.collect_intv(phix, r, opt)
        got = [tuple(int(v) for v in row) for row in nat]
        want = [(m.x0, m.x1, m.s, m.qb, m.qe) for m in py]
        assert got == want, r


def test_native_sa_lookup_matches(phix):
    rng = np.random.default_rng(52)
    rows = rng.integers(1, phix.seq_len + 1, 200).astype(np.int64)
    got = native_ops.sa_lookup_batch(phix, rows)
    assert got is not None
    for r, g in zip(rows, got):
        assert int(g) == phix.sa_lookup(int(r)), r
