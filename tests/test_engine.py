"""Alignment engine golden tests (mirrors go/src/test/gobwa_test.go)."""

import numpy as np
import pytest

from lariat_tpu.align.engine import AlignmentEngine, OP_M, OP_S, encode_read
from lariat_tpu.index import fmindex

READ_A = b"TCAAAAACTGACGCGTTGGATGAGGAGAAGTGGCTTAATATGCTTGGCACGTTCGTCAAGGACTGGTTTA"
READ_B = b"TATGACCAGTGTTTCCAGTCCGTTCAGTTGTTGCAGTGGAATAGTCAGGTTAAATTTAATGTGACCGCTT"


@pytest.fixture(scope="module")
def engine(request):
    inputs = request.getfixturevalue("reference_inputs")
    fm = fmindex.load_bwa_index(str(inputs / "phix" / "PhiX.fa"))
    return AlignmentEngine(fm)


def test_golden_offset_210(engine):
    regs = engine.align1(encode_read(READ_A))
    assert regs
    ea = engine.interpret_align(regs[0])
    assert ea.contig == "PhiX"
    assert ea.offset == 210
    assert not ea.reversed_
    assert regs[0].score == 70  # perfect 70-mer


def test_golden_single_hit(engine):
    regs = engine.align1(encode_read(READ_B))
    assert len(regs) == 1


def test_reg2aln_perfect(engine):
    regs = engine.align1(encode_read(READ_A))
    aln = engine.reg2aln(READ_A, regs[0])
    assert aln.chrom == "PhiX"
    assert aln.pos == 210
    assert aln.cigar == ((OP_M, 70),)
    assert aln.edit_distance == 0
    assert not aln.reversed_


def test_reg2aln_mismatch(engine):
    read = bytearray(READ_A)
    read[30] = ord("A") if read[30] != ord("A") else ord("C")
    read = bytes(read)
    regs = engine.align1(encode_read(read))
    aln = engine.reg2aln(read, regs[0])
    assert aln.pos == 210
    assert aln.cigar == ((OP_M, 70),)
    assert aln.edit_distance == 1
    assert regs[0].score == 70 - 1 - 4  # one mismatch: -match -penalty


def test_reverse_strand(engine):
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    rc = READ_A.translate(comp)[::-1]
    regs = engine.align1(encode_read(rc))
    ea = engine.interpret_align(regs[0])
    assert ea.reversed_
    aln = engine.reg2aln(rc, regs[0])
    assert aln.reversed_
    assert aln.pos == 210
    assert aln.cigar == ((OP_M, 70),)
    assert aln.edit_distance == 0


def test_soft_clip(engine):
    # prepend junk that matches nowhere: expect a leading soft clip
    junk = b"GTCAGTCAGTCAGTCA"
    read = junk + READ_A
    regs = engine.align1(encode_read(read))
    aln = engine.reg2aln(read, regs[0])
    assert aln.pos == 210
    assert aln.cigar[0] == (OP_S, len(junk)) or aln.cigar[0][0] == OP_S


def test_mate_rescue(engine):
    # read2 = revcomp of a segment ~250bp downstream (FR orientation);
    # mutate read2 so heavily it cannot seed on its own, then check rescue
    fm = engine.fm
    r1 = fm.get_seq("PhiX", 1000, 1100, False)
    mate_fwd = bytearray(fm.get_seq("PhiX", 1250, 1350, False))
    rng = np.random.default_rng(5)
    # mutate every ~12bp to kill all 19bp seeds
    for p in range(5, 100, 11):
        mate_fwd[p] = b"ACGT"[(b"ACGT".index(bytes(mate_fwd[p:p+1])) + 1) % 4]
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    r2 = bytes(mate_fwd).translate(comp)[::-1]
    ea1, ea2 = engine.align_pair(r1, r2, score_delta=25)
    assert any(not e.reversed_ and e.offset == 1000 for e in ea1)
    # read2 must be rescued on the reverse strand near 1250
    rescued = [e for e in ea2 if e.reversed_]
    assert rescued, "mate rescue produced no reverse-strand hit"
    assert any(abs(e.alignment_end - 1250) < 60 or abs(e.offset - 1349) < 60
               for e in rescued)
