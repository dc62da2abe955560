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


def test_align_step_smem_maps_reads(device_genome):
    """Real-SMEM device step: mapped positions must match the planted truth."""
    import jax.numpy as jnp
    from lariat_tpu.parallel.align_step import align_step_smem
    g, genome = device_genome
    codes = fmindex.NT4_TABLE[np.frombuffer(genome, dtype=np.uint8)]
    rng = np.random.default_rng(17)
    B, L = 32, 100
    reads = np.zeros((B, L), np.uint8)
    truth = np.zeros(B, np.int64)
    rev = np.zeros(B, bool)
    for i in range(B):
        pos = int(rng.integers(0, len(codes) - L))
        seg = codes[pos:pos + L].copy()
        if i % 3 == 0:
            seg = (3 - seg)[::-1]
            rev[i] = True
        p = int(rng.integers(0, L))
        seg[p] = (seg[p] + 1) % 4
        reads[i] = seg
        truth[i] = pos
    mat = np.asarray(ksw.fill_score_matrix(1, 4))
    res = align_step_smem(g, jnp.asarray(reads),
                          jnp.asarray(np.full(B, L, np.int32)),
                          jnp.asarray(mat))
    mapped = np.asarray(res.mapped)
    pos = np.asarray(res.pos)
    isrev = np.asarray(res.is_rev)
    assert mapped.sum() >= B - 2
    ok = 0
    for i in range(B):
        if mapped[i] and abs(int(pos[i]) - truth[i]) <= 2 \
                and bool(isrev[i]) == bool(rev[i]):
            ok += 1
    assert ok >= mapped.sum() - 2, (pos[:8], truth[:8])
