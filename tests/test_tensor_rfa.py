"""Tensorized fastScore (rfa/tensor_rfa.py) byte-parity vs the scalar path."""

import math

import numpy as np
import pytest

from lariat_tpu.align.engine import AlignmentEngine
from lariat_tpu.config import RFAConfig
from lariat_tpu.rfa import optimizer as opt_mod
from lariat_tpu.rfa.candidates import (get_alignments, get_chains,
                                       tag_best_alignments)
from lariat_tpu.rfa.molecules import (infer_molecules,
                                      mark_best_alignment_for_read_in_molecule,
                                      scrap_molecules,
                                      set_molecule_differences)
from lariat_tpu.rfa.tensor_rfa import RFATensors

from test_rfa import _make_pair, dup_genome  # noqa: F401


def _build(engine, genome, cfg, seed=23):
    rng = np.random.default_rng(seed)
    reads = []
    for m, start in enumerate((1800, 41800, 60000)):
        for i in range(8):
            pos = start + int(rng.integers(0, 900))
            reads.append(_make_pair(genome, pos, 300, f"t:{m}:{i}"))
    rng.shuffle(reads)
    chains, barcode = get_chains(engine, reads, cfg.chain_score_delta)
    alignments, _ = get_alignments(engine, chains, cfg.alignment_score_delta,
                                   cfg.improper_pair_penalty)
    positions = tag_best_alignments(alignments, -17)
    molecules = infer_molecules(positions)
    mark_best_alignment_for_read_in_molecule(molecules,
                                             cfg.improper_pair_penalty)
    molecules = scrap_molecules(molecules)
    set_molecule_differences(molecules, False)
    return molecules, alignments, barcode


def test_tensor_row_matches_scalar(dup_genome):  # noqa: F811
    """fast_score_row == scalar fast_score for every (source, sink) pair,
    bit-for-bit, at several optimization states."""
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    cfg = RFAConfig()
    molecules, alignments, _ = _build(engine, genome, cfg)
    t = RFATensors.build(molecules, alignments)
    assert t is not None
    lup = cfg.improper_pair_penalty

    def check_all():
        M = len(molecules)
        for s in range(M):
            src = molecules[s]
            if len(src.active_alignments) == 0:
                continue
            K = np.array([k for k in range(M) if k != s], np.int64)
            change, num = t.fast_score_row(src, s, K, lup)
            for j, k in enumerate(K):
                want_change, want_move = opt_mod.fast_score(
                    src, molecules[k], lup)
                assert change[j] == want_change, (s, k)
                assert num[j] == want_move.num_moved, (s, k)

    check_all()
    # run a few accepts and re-check (state-dependent terms)
    opt = opt_mod.RFAOptimizer(molecules, alignments, lup)
    for _ in range(3 * len(molecules)):
        opt.generate_move()
    check_all()


def test_optimizer_tensor_equals_scalar(dup_genome):  # noqa: F811
    """Full optimize() with the tensor propose step == forced scalar sweep."""
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    cfg = RFAConfig()

    mols_a, alns_a, bc = _build(engine, genome, cfg)
    opt_a = opt_mod.RFAOptimizer(mols_a, alns_a, cfg.improper_pair_penalty,
                                 bc)
    assert opt_a._tensors is not None
    opt_a.optimize()

    mols_b, alns_b, bc = _build(engine, genome, cfg)
    opt_b = opt_mod.RFAOptimizer(mols_b, alns_b, cfg.improper_pair_penalty,
                                 bc)
    opt_b._tensors = None  # force scalar
    opt_b.optimize()

    assert [sorted(m.active_alignments.keys()) for m in mols_a] == \
           [sorted(m.active_alignments.keys()) for m in mols_b]
    assert [[a.active for a in lst] for lst in alns_a] == \
           [[a.active for a in lst] for lst in alns_b]


def test_mapq_sums_tensor_equals_scalar(dup_genome):  # noqa: F811
    """molecule_mapq_probability_sums via tensors == scalar, bit-for-bit."""
    from lariat_tpu.rfa.mapq import molecule_mapq_probability_sums
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    cfg = RFAConfig()
    lup = cfg.improper_pair_penalty

    mols_a, alns_a, _ = _build(engine, genome, cfg)
    opt_a = opt_mod.RFAOptimizer(mols_a, alns_a, lup)
    opt_a.optimize()
    t = RFATensors.build(mols_a, alns_a)
    molecule_mapq_probability_sums(mols_a, lup, t)
    sums_a = {id(a): a.sum_move_probability_change
              for lst in alns_a for a in lst}

    mols_b, alns_b, _ = _build(engine, genome, cfg)
    opt_b = opt_mod.RFAOptimizer(mols_b, alns_b, lup)
    opt_b.optimize()
    molecule_mapq_probability_sums(mols_b, lup, None)

    a_by_read = [[x.sum_move_probability_change for x in lst]
                 for lst in alns_a]
    b_by_read = [[x.sum_move_probability_change for x in lst]
                 for lst in alns_b]
    assert a_by_read == b_by_read


def test_row_jit_matches_numpy(dup_genome, monkeypatch):  # noqa: F811
    """The jax.jit row kernel == the numpy row, byte-for-byte."""
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    cfg = RFAConfig()
    molecules, alignments, _ = _build(engine, genome, cfg)
    t = RFATensors.build(molecules, alignments)
    lup = cfg.improper_pair_penalty
    M = len(molecules)
    for s in range(M):
        src = molecules[s]
        if len(src.active_alignments) == 0:
            continue
        K = np.array([k for k in range(M) if k != s], np.int64)
        monkeypatch.delenv("LARIAT_RFA_JIT", raising=False)
        c_np, n_np = t.fast_score_row(src, s, K, lup)
        monkeypatch.setenv("LARIAT_RFA_JIT", "1")
        c_j, n_j = t.fast_score_row(src, s, K, lup)
        np.testing.assert_array_equal(np.asarray(c_np), np.asarray(c_j))
        np.testing.assert_array_equal(np.asarray(n_np),
                                      np.asarray(n_j).astype(np.int64))


def test_e2e_tensor_equals_scalar(dup_genome, monkeypatch):  # noqa: F811
    """process_barcode with tensors (default) == with tensors disabled."""
    from lariat_tpu.rfa import mapq as mapq_mod
    from lariat_tpu.rfa import tensor_rfa
    from lariat_tpu.rfa.pipeline import process_barcode
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    cfg = RFAConfig()

    def make_reads():
        rng = np.random.default_rng(31)
        reads = []
        for m, start in enumerate((1800, 41800, 60000)):
            for i in range(7):
                pos = start + int(rng.integers(0, 900))
                reads.append(_make_pair(genome, pos, 300, f"e:{m}:{i}"))
        return reads

    r1 = process_barcode(engine, make_reads(), True, cfg)
    monkeypatch.setattr(tensor_rfa.RFATensors, "build",
                        classmethod(lambda cls, m, a: None))
    r2 = process_barcode(engine, make_reads(), True, cfg)
    for arr1, arr2 in zip(r1.alignments, r2.alignments):
        assert len(arr1) == len(arr2)
        for a1, a2 in zip(arr1, arr2):
            assert (a1.pos, a1.mapq, a1.active, a1.is_proper, a1.duplicate,
                    a1.sum_move_probability_change) == \
                   (a2.pos, a2.mapq, a2.active, a2.is_proper, a2.duplicate,
                    a2.sum_move_probability_change)
