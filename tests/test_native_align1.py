"""C++ mem_align1_core (native/align1.cpp) vs the Python reference path."""

import dataclasses

import numpy as np
import pytest

from lariat_tpu.align import native_engine
from lariat_tpu.align.chaining import chain_seeds, filter_chains
from lariat_tpu.align.engine import AlignmentEngine, encode_read
from lariat_tpu.align.extension import chain2aln, sort_dedup_patch

from test_rfa import dup_genome  # noqa: F401
from test_soak import _messy_read

pytestmark = pytest.mark.skipif(
    native_engine._lib() is None, reason="native align1 unavailable")


@pytest.mark.parametrize("seed", range(4))
def test_native_align1_matches_python(dup_genome, seed):  # noqa: F811
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    rng = np.random.default_rng(seed * 131 + 3)
    seqs = [_messy_read(genome, rng) for _ in range(30)]
    qs = [encode_read(s) for s in seqs]
    qs = [q for q in qs if len(q)]
    mr = engine.collect_mems_many(qs, with_rbegs=True, raw=True)
    assert mr is not None
    got_all = native_engine.align1_batch(
        fm, engine.opt, qs, [m for m, _ in mr], [b for _, b in mr])
    assert got_all is not None
    from lariat_tpu.align.seeding import Intv
    for q, (marr, rbegs), got in zip(qs, mr, got_all):
        mems = [Intv(*row) for row in marr.tolist()]
        chains = chain_seeds(fm, q, engine.opt, mems, rbegs)
        chains = filter_chains(engine.opt, chains)
        regs = []
        for c in chains:
            chain2aln(fm, q, engine.opt, c, regs, engine.mat)
        want = sort_dedup_patch(fm, q, engine.opt, regs, engine.mat)
        assert len(got) == len(want)
        for a, b in zip(got, want):
            assert dataclasses.asdict(a) == dataclasses.asdict(b)


def test_native_align1_empty_inputs(dup_genome):  # noqa: F811
    fm, _ = dup_genome
    engine = AlignmentEngine(fm)
    assert native_engine.align1_batch(fm, engine.opt, [], [], []) == []
    # read with no seeds at all
    q = np.full(30, 4, dtype=np.uint8)  # all N
    out = native_engine.align1_batch(fm, engine.opt, [q],
                                     [np.zeros((0, 5), np.int64)], [[]])
    assert out == [[]]


@pytest.mark.parametrize("seed", range(3))
def test_native_reg2aln_matches_python(dup_genome, seed):  # noqa: F811
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    rng = np.random.default_rng(seed * 53 + 9)
    tasks = []
    for _ in range(20):
        seq = _messy_read(genome, rng)
        q = encode_read(seq)
        if not len(q):
            continue
        for reg in engine.align1(q):
            tasks.append((seq, reg))
    tasks.append((b"ACGT" * 20, None))
    got = native_engine.reg2aln_batch(fm, engine.opt, tasks)
    assert got is not None
    for (seq, reg), g in zip(tasks, got):
        want = engine.reg2aln(seq, reg)
        assert dataclasses.asdict(g) == dataclasses.asdict(want), (seq, reg)


def test_native_mismatch_walk_matches_python(dup_genome, monkeypatch):  # noqa: F811
    """get_alignments with the C++ CIGAR walk == the inline Python walk."""
    from lariat_tpu.config import RFAConfig
    from lariat_tpu.rfa.candidates import get_alignments, get_chains

    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    cfg = RFAConfig()
    from test_rfa import _make_pair
    rng = np.random.default_rng(17)
    reads = []
    for i in range(12):
        pos = int(rng.integers(2000, 42500))
        reads.append(_make_pair(genome, pos, 300, f"mm:{i}"))

    def run():
        chains, _ = get_chains(engine, reads, cfg.chain_score_delta)
        return get_alignments(engine, chains, cfg.alignment_score_delta,
                              cfg.improper_pair_penalty)

    filt_a, full_a = run()
    monkeypatch.setattr(native_engine, "mismatch_walk_batch",
                        lambda walks: None)
    filt_b, full_b = run()
    for la, lb in zip(full_a, full_b):
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            assert (a.matches, a.mismatches, a.indels, a.soft_clipped,
                    a.soft_clipped_length, a.mismatch_locs,
                    a.mismatch_read_locs) == \
                   (b.matches, b.mismatches, b.indels, b.soft_clipped,
                    b.soft_clipped_length, b.mismatch_locs,
                    b.mismatch_read_locs)


@pytest.mark.parametrize("read_len", [300, 700])
def test_long_reads_native_matches_python(dup_genome, read_len):  # noqa: F811
    """Longer-than-Illumina reads flow through both stacks identically."""
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    rng = np.random.default_rng(read_len)
    pos = int(rng.integers(0, len(genome) - read_len - 50))
    q = bytearray(genome[pos:pos + read_len])
    q = q[:read_len // 2] + bytearray(b"ACGTAC") + q[read_len // 2:]
    for _ in range(6):
        q[int(rng.integers(0, len(q)))] = b"ACGT"[int(rng.integers(0, 4))]
    seq = bytes(q)
    qc = encode_read(seq)
    py = engine.align1(qc)
    mr = engine.collect_mems_many([qc], with_rbegs=True, raw=True)
    nat = native_engine.align1_batch(fm, engine.opt, [qc],
                                     [mr[0][0]], [mr[0][1]])[0]
    assert len(py) == len(nat)
    for a, b in zip(nat, py):
        assert dataclasses.asdict(a) == dataclasses.asdict(b)
    assert py, "long read must align"
    sra_py = engine.reg2aln(seq, py[0])
    sra_nat = native_engine.reg2aln_batch(fm, engine.opt, [(seq, py[0])])[0]
    assert dataclasses.asdict(sra_py) == dataclasses.asdict(sra_nat)
    qlen_used = sum(l for op, l in sra_py.cigar if op in (0, 1, 3))
    assert qlen_used == len(seq)
