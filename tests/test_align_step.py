"""Device align-step: seed -> SA -> fetch -> extend, fwd and rev strands."""

import numpy as np
import pytest

from lariat_tpu.align import ksw
from lariat_tpu.index import fmindex
from lariat_tpu.parallel.align_step import DeviceGenome, align_step

from test_rfa import dup_genome  # noqa: F401


@pytest.fixture(scope="module")
def device_genome(dup_genome):  # noqa: F811
    fm, genome = dup_genome
    return DeviceGenome.from_host(fm), genome


def test_align_step_forward_and_reverse(device_genome):
    g, genome = device_genome
    rng = np.random.default_rng(21)
    codes = fmindex.NT4_TABLE[np.frombuffer(genome, dtype=np.uint8)]
    B, L = 16, 100
    reads = np.full((B, L), 4, np.uint8)
    lens = np.full(B, L, np.int32)
    truth = []
    for i in range(B):
        pos = int(rng.integers(0, len(genome) - L))
        seg = codes[pos:pos + L].copy()
        rev = bool(rng.integers(0, 2))
        if rev:
            seg = (3 - seg)[::-1]
        # one mutation away from the seed suffix (first 40 bases)
        p = int(rng.integers(0, 40))
        seg = seg.copy()
        seg[p] = (seg[p] + 1) % 4
        reads[i] = seg
        truth.append((pos, rev))
    mat = np.asarray(ksw.fill_score_matrix(1, 4))
    res = align_step(g, reads, lens, mat)
    for i, (pos, rev) in enumerate(truth):
        assert bool(res.mapped[i])
        assert int(res.pos[i]) == pos, (i, int(res.pos[i]), pos, rev)
        assert bool(res.is_rev[i]) == rev
        assert int(res.score[i]) > 40
