"""End-to-end RFA inference tests on a synthetic genome with a duplication.

Exercises the read-cloud disambiguation the reference exists for: reads from
a duplicated segment are ambiguous alone but should be placed with their
molecule's read cloud.
"""

import numpy as np
import pytest

from lariat_tpu.align.engine import AlignmentEngine
from lariat_tpu.config import RFAConfig
from lariat_tpu.index import fmindex
from lariat_tpu.io.fastq import FastQRecord
from lariat_tpu.rfa.pipeline import process_barcode, worth_running_rfa

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = bytes.maketrans(b"ACGT", b"TGCA")


def _revcomp(seq: bytes) -> bytes:
    return seq.translate(COMP)[::-1]


@pytest.fixture(scope="module")
def dup_genome(tmp_path_factory):
    """80 kb random genome with [2000:3000] duplicated at [42000:43000]
    (> 50 kb molecule gap away from the first cloud's span)."""
    rng = np.random.default_rng(7)
    g = BASES[rng.integers(0, 4, 80000)]
    g[42000:43000] = g[2000:3000]
    fasta = tmp_path_factory.mktemp("genome") / "dup.fa"
    seq = g.tobytes().decode()
    with open(fasta, "w") as f:
        f.write(">chrT\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    fm = fmindex.build_index(str(fasta))
    return fm, g.tobytes()


def _make_pair(genome: bytes, pos: int, insert: int, name: str,
               barcode: str = "AAACAGAGAAAGAT-1") -> FastQRecord:
    r1 = genome[pos:pos + 100]
    r2 = _revcomp(genome[pos + insert - 100:pos + insert])
    q = b"I" * 100
    return FastQRecord(read1=r1, read_qual1=q, read2=r2, read_qual2=q,
                       barcode10x=barcode.encode(), barcode10x_qual=b"J" * 14,
                       raw_barcode10x=barcode.split("-")[0].encode(),
                       barcode=b"ACGTACGT", barcode_qual=b"IIIIIIII",
                       read_info=name)


def test_rfa_places_ambiguous_read_with_cloud(dup_genome):
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    # molecule at [1500, 3500]: 8 pairs, some inside the duplicated segment
    reads = []
    for i, pos in enumerate(range(1500, 3100, 200)):
        reads.append(_make_pair(genome, pos, 300, f"m1:{i}"))
    assert worth_running_rfa(reads, True)
    result = process_barcode(engine, reads, True, RFAConfig())
    # every read must have exactly one active alignment
    actives = []
    for arr in result.alignments:
        act = [a for a in arr if a.active]
        assert len(act) == 1, "each read needs exactly one active alignment"
        actives.append(act[0])
    # ambiguous reads (inside [2000,3000] with both ends in the dup segment)
    # must be placed at the first copy, with the cloud
    for a in actives:
        assert a.contig == "chrT"
        assert a.pos < 11000, (
            f"read {a.read_name} placed at {a.pos}, outside the cloud")
    # molecule inference: one molecule spanning ~[1500, 3400]
    assert result.molecules is not None
    big = [m for m in result.molecules if len(m.active_alignments) >= 8]
    assert big, "expected one dominant molecule"
    # mapqs within range
    for a in actives:
        assert 0 <= a.mapq <= 60


def test_rfa_two_molecules(dup_genome):
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    reads = []
    for i, pos in enumerate(range(4000, 5200, 150)):
        reads.append(_make_pair(genome, pos, 280, f"a:{i}"))
    for i, pos in enumerate(range(60000, 61200, 150)):
        reads.append(_make_pair(genome, pos, 280, f"b:{i}"))
    result = process_barcode(engine, reads, True, RFAConfig())
    mols = [m for m in result.molecules if len(m.active_alignments) > 0]
    starts = sorted(m.start for m in mols)
    assert len(mols) == 2
    assert abs(starts[0] - 4000) < 300 and abs(starts[1] - 60000) < 300
    # well-separated unique placements get high MAPQ
    high = [a for arr in result.alignments for a in arr
            if a.active and a.mapq >= 30]
    assert len(high) >= len(reads)  # most of 2*n reads


def test_non_rfa_barcode_path(dup_genome):
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    reads = [_make_pair(genome, 5000, 300, "x:0", barcode="AAAA")]
    assert not worth_running_rfa(reads, True)
    result = process_barcode(engine, reads, True, RFAConfig())
    assert result.molecules is None
    for arr in result.alignments:
        assert sum(1 for a in arr if a.active) == 1


def test_duplicate_marking(dup_genome):
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    reads = [_make_pair(genome, 6000, 300, f"d:{i}") for i in range(6)]
    result = process_barcode(engine, reads, True, RFAConfig())
    actives = [a for arr in result.alignments for a in arr if a.active]
    dups = [a for a in actives if a.duplicate]
    # 6 identical pairs -> 5 dup read1s + 5 dup read2s
    assert len(dups) == 10


def test_rfa_recovers_mapq_in_duplication(tmp_path):
    """The method's raison d'etre: reads inside a perfect segdup are
    unmappable alone (MAPQ ~3) but the read-cloud prior recovers confident
    placement (reference README.md:3; RFA paper Genome Res. 2015).

    The copies must sit > 50 kb apart: within 50 kb they merge into one
    candidate molecule (the gap rule, lariat.go:1376) and no cloud evidence
    can separate them."""
    rng = np.random.default_rng(70)
    g = BASES[rng.integers(0, 4, 140000)]
    g[90000:91000] = g[2000:3000]
    fasta = tmp_path / "far_dup.fa"
    seq = g.tobytes().decode()
    with open(fasta, "w") as f:
        f.write(">chrT\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    fm = fmindex.build_index(str(fasta))
    genome = g.tobytes()
    engine = AlignmentEngine(fm)
    # every pair fully inside the duplicated segment [2000:3000]
    inner = [_make_pair(genome, 2000 + i * 80, 300, f"in:{i}")
             for i in range(5)]
    # plus anchor pairs unique to the first copy's flanks
    anchor = [_make_pair(genome, 1300 + i * 100, 300, f"an:{i}")
              for i in range(6)]
    reads = anchor + inner
    with_rfa = process_barcode(engine, reads, True, RFAConfig())
    # force the no-RFA path (non-unique barcode skips RFA, lariat.go:489-496)
    without = process_barcode(engine, reads, False, RFAConfig())

    def inner_active(result):
        return [a for arr in result.alignments for a in arr
                if a.active and a.read_name.startswith("in:")
                and 1900 < a.pos < 3100]

    rfa_mapqs = [a.mapq for a in inner_active(with_rfa)]
    no_mapqs = [a.mapq for a in inner_active(without)]
    # without the cloud, two equal-probability copies: p ~ 0.5 so MAPQ
    # collapses to -10*log10(0.5) ~ 3
    assert no_mapqs and all(q <= 3 for q in no_mapqs), no_mapqs
    # with the cloud: confidently placed
    assert all(q >= 20 for q in rfa_mapqs), rfa_mapqs
    assert len(rfa_mapqs) >= 8


def test_optimizer_indexed_sweep_equals_full_sweep(dup_genome):
    """The read->molecule sink index must not change any optimizer decision
    vs scanning every molecule (sinks without shared reads always lose)."""
    from lariat_tpu.align.engine import AlignmentEngine
    from lariat_tpu.config import RFAConfig
    from lariat_tpu.rfa import optimizer as opt_mod
    from lariat_tpu.rfa.candidates import (get_alignments, get_chains,
                                           tag_best_alignments)
    from lariat_tpu.rfa.molecules import (
        infer_molecules, mark_best_alignment_for_read_in_molecule,
        scrap_molecules, set_molecule_differences)

    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    cfg = RFAConfig()
    rng = np.random.default_rng(23)

    def build():
        reads = []
        # two read clouds over the duplicated region -> ambiguous molecules
        for m, start in enumerate((1800, 41800, 60000)):
            for i in range(8):
                pos = start + int(rng.integers(0, 900))
                reads.append(_make_pair(genome, pos, 300, f"t:{m}:{i}"))
        rng.shuffle(reads)
        chains, barcode = get_chains(engine, reads, cfg.chain_score_delta)
        alignments, _ = get_alignments(engine, chains,
                                       cfg.alignment_score_delta,
                                       cfg.improper_pair_penalty)
        positions = tag_best_alignments(alignments, -17)
        molecules = infer_molecules(positions)
        mark_best_alignment_for_read_in_molecule(
            molecules, cfg.improper_pair_penalty)
        molecules = scrap_molecules(molecules)
        set_molecule_differences(molecules, False)
        return molecules, alignments, barcode

    def snapshot(molecules):
        return [(sorted(m.active_alignments.keys()),
                 [id(a) for a in m.active_alignments.values()])
                for m in molecules]

    rng = np.random.default_rng(23)
    mols_a, alns_a, bc = build()
    opt_a = opt_mod.RFAOptimizer(mols_a, alns_a,
                                 cfg.improper_pair_penalty, bc)
    opt_a.optimize()

    rng = np.random.default_rng(23)
    mols_b, alns_b, bc = build()
    opt_b = opt_mod.RFAOptimizer(mols_b, alns_b,
                                 cfg.improper_pair_penalty, bc)
    # full sweep: every molecule is a candidate sink for every read
    all_idx = list(range(len(mols_b)))
    opt_b._read_to_mols = {rid: all_idx
                           for rid in range(2 * len(alns_b) + 2)}
    opt_b.optimize()

    a = [sorted(m.active_alignments.keys()) for m in mols_a]
    b = [sorted(m.active_alignments.keys()) for m in mols_b]
    assert a == b
    act_a = [[aln.active for aln in lst] for lst in alns_a]
    act_b = [[aln.active for aln in lst] for lst in alns_b]
    assert act_a == act_b


def test_mapq_sums_indexed_equals_full_sweep(dup_genome):
    """The read-sharing sink restriction in molecule_mapq_probability_sums
    must not change any sum (non-sharing sinks contribute to nothing)."""
    import math
    from lariat_tpu.align.engine import AlignmentEngine
    from lariat_tpu.config import RFAConfig
    from lariat_tpu.rfa import mapq as mapq_mod
    from lariat_tpu.rfa.candidates import (get_alignments, get_chains,
                                           tag_best_alignments)
    from lariat_tpu.rfa.molecules import (
        infer_molecules, mark_best_alignment_for_read_in_molecule,
        scrap_molecules, set_molecule_differences)
    from lariat_tpu.rfa.optimizer import RFAOptimizer, fast_score

    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    cfg = RFAConfig()
    rng = np.random.default_rng(41)

    def build():
        reads = []
        for m, start in enumerate((1800, 41800, 60000)):
            for i in range(8):
                pos = start + int(rng.integers(0, 900))
                reads.append(_make_pair(genome, pos, 300, f"q:{m}:{i}"))
        chains, bc = get_chains(engine, reads, cfg.chain_score_delta)
        alignments, _ = get_alignments(engine, chains,
                                       cfg.alignment_score_delta,
                                       cfg.improper_pair_penalty)
        positions = tag_best_alignments(alignments, -17)
        molecules = infer_molecules(positions)
        mark_best_alignment_for_read_in_molecule(
            molecules, cfg.improper_pair_penalty)
        molecules = scrap_molecules(molecules)
        set_molecule_differences(molecules, False)
        RFAOptimizer(molecules, alignments,
                     cfg.improper_pair_penalty, bc).optimize()
        return molecules, alignments

    def full_sweep(molecules, lup):
        out = {}
        for src_id, source in enumerate(molecules):
            for snk_id, sink in enumerate(molecules):
                if src_id == snk_id:
                    continue
                shared = [a for a in source.active_alignments.values()
                          if sink.best_alignment_for_read.get(a.read_id)
                          is not None]
                change, _ = fast_score(source, sink, lup)
                prob = math.pow(10.0, change) if change < 300 else math.inf
                for a in shared:
                    out[id(a)] = out.get(id(a), 0.0) + prob
        return out

    rng = np.random.default_rng(41)
    mols, alns = build()
    want = full_sweep(mols, cfg.improper_pair_penalty)
    before = {id(a): a.sum_move_probability_change
              for lst in alns for a in lst}
    mapq_mod.molecule_mapq_probability_sums(mols, cfg.improper_pair_penalty)
    for lst in alns:
        for a in lst:
            got = a.sum_move_probability_change - before[id(a)]
            expect = want.get(id(a), 0.0)
            assert got == expect, (a.read_id, got, expect)
