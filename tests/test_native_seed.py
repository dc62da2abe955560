"""Native C++ seeding/SA vs the Python reference implementations."""

import numpy as np
import pytest

from lariat_tpu.align import seeding
from lariat_tpu.config import AlignerConfig
from lariat_tpu.index import fmindex, native_ops

from test_rfa import dup_genome  # noqa: F401


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


def test_fused_seeds_rbegs_matches_separate(dup_genome):  # noqa: F811
    """fm_collect_seeds_rbegs_batch == collect_seeds + enumerate + sa."""
    import numpy as np
    from lariat_tpu.align.chaining import enumerate_occurrences
    from lariat_tpu.align.engine import AlignmentEngine, encode_read
    from lariat_tpu.align.seeding import Intv
    from lariat_tpu.index import native_ops

    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    rng = np.random.default_rng(8)
    qs = []
    for _ in range(30):
        ln = int(rng.integers(25, 152))
        pos = int(rng.integers(0, len(genome) - ln))
        q = bytearray(genome[pos:pos + ln])
        for _ in range(int(rng.integers(0, 5))):
            q[int(rng.integers(0, len(q)))] = b"ACGT"[int(rng.integers(0, 4))]
        qs.append(encode_read(bytes(q)))
    fused = native_ops.collect_seeds_rbegs_batch(fm, qs, engine.opt)
    if fused is None:
        import pytest
        pytest.skip("native library unavailable")
    mems_f, rbegs_f = fused
    mems_s = native_ops.collect_seeds_batch(fm, qs, engine.opt)
    for i, arr in enumerate(mems_s):
        assert np.array_equal(mems_f[i], arr), i
        occs = enumerate_occurrences([Intv(*r) for r in arr.tolist()],
                                     engine.opt)
        rows = np.array([row for _, row in occs], dtype=np.int64)
        want = (native_ops.sa_lookup_batch(fm, rows) if len(rows)
                else np.zeros(0, np.int64))
        assert np.array_equal(rbegs_f[i], want), i


def test_interleaved_sa_lookup_threaded(phix):
    """Chunked multi-thread interleaved walker == scalar sa_lookup."""
    rng = np.random.default_rng(53)
    rows = rng.integers(1, phix.seq_len + 1, 3000).astype(np.int64)
    old = native_ops.N_THREADS
    try:
        native_ops.N_THREADS = 3
        got = native_ops.sa_lookup_batch(phix, rows)
    finally:
        native_ops.N_THREADS = old
    assert got is not None
    want = np.array([phix.sa_lookup(int(r)) for r in rows], np.int64)
    assert np.array_equal(got, want)


def test_ensure_native_hot_parity(phix):
    """Hugepage-migrated arrays leave every native result unchanged.

    The size gate keeps this path off for test fixtures, so force it."""
    rng = np.random.default_rng(54)
    rows = rng.integers(1, phix.seq_len + 1, 300).astype(np.int64)
    reads = [np.asarray(
        fmindex.unpack_2bit(phix.pac, phix.l_pac)[i * 37:i * 37 + 80],
        np.uint8).copy() for i in range(8)]
    opt = AlignerConfig()
    before_sa = native_ops.sa_lookup_batch(phix, rows)
    before_seeds = native_ops.collect_seeds_batch(phix, reads, opt)
    old_words = np.asarray(phix.packed_words).copy()
    old_gate = fmindex.FMIndex._HOT_MIN_BYTES
    try:
        fmindex.FMIndex._HOT_MIN_BYTES = 0
        phix.ensure_native_hot()
        assert getattr(phix, "_hot_bufs", None)
        assert np.array_equal(np.asarray(phix.packed_words), old_words)
        after_sa = native_ops.sa_lookup_batch(phix, rows)
        after_seeds = native_ops.collect_seeds_batch(phix, reads, opt)
    finally:
        fmindex.FMIndex._HOT_MIN_BYTES = old_gate
    assert np.array_equal(before_sa, after_sa)
    for a, b in zip(before_seeds, after_seeds):
        assert np.array_equal(a, b)


def test_interleaved_seed_walker_parity(phix, monkeypatch):
    """The opt-in coroutine-interleaved seeding walker (LARIAT_SEED_LANES)
    must be bit-identical to the sequential collect_intv walk, including
    round-2 re-seeding and round-3 forward-greedy seeds, with lanes
    narrower and wider than the read count."""
    rng = np.random.default_rng(77)
    text = np.concatenate([
        fmindex.unpack_2bit(phix.pac, phix.l_pac),
        (3 - fmindex.unpack_2bit(phix.pac, phix.l_pac))[::-1]])
    opt = AlignerConfig()
    reads = []
    for t in range(60):
        ln = int(rng.integers(21, 151))
        start = int(rng.integers(0, phix.l_pac - ln))
        r = text[start:start + ln].copy()
        for _ in range(t % 5):
            p = int(rng.integers(0, ln))
            r[p] = (r[p] + 1) % 4
        if t % 7 == 0:
            r[int(rng.integers(0, ln))] = 4  # an N splits the scan
        reads.append(r)
    monkeypatch.delenv("LARIAT_SEED_LANES", raising=False)
    base = native_ops.collect_seeds_batch(phix, reads, opt)
    assert base is not None
    for lanes in ("3", "32"):
        monkeypatch.setenv("LARIAT_SEED_LANES", lanes)
        inter = native_ops.collect_seeds_batch(phix, reads, opt)
        for b, i in zip(base, inter):
            assert np.array_equal(b, i)
