"""Batch engine must be bit-identical to the sequential host engine."""

import dataclasses

import numpy as np
import pytest

from lariat_tpu.align.batch_engine import BatchAlignmentEngine
from lariat_tpu.align.engine import AlignmentEngine, encode_read
from lariat_tpu.index import fmindex

from test_rfa import dup_genome  # noqa: F401

COMP = bytes.maketrans(b"ACGT", b"TGCA")


def _reads(genome, rng, n=24):
    out = []
    for _ in range(n):
        ln = int(rng.integers(60, 151))
        pos = int(rng.integers(0, len(genome) - ln))
        seq = bytearray(genome[pos:pos + ln])
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, ln))
            seq[p] = b"ACGT"[int(rng.integers(0, 4))]
        if rng.integers(0, 2):
            seq = bytearray(bytes(seq).translate(COMP)[::-1])
        # occasional junk tail to force soft clips
        if rng.integers(0, 4) == 0:
            seq += bytes(b"ACGT"[int(rng.integers(0, 4))]
                         for _ in range(20))
        out.append(bytes(seq))
    return out


def test_batch_engine_matches_host(dup_genome):  # noqa: F811
    fm, genome = dup_genome
    host = AlignmentEngine(fm)
    batch = BatchAlignmentEngine(fm, use_pallas=False)
    rng = np.random.default_rng(31)
    seqs = _reads(genome, rng)
    got_all = batch.align_batch(seqs)
    for seq, got in zip(seqs, got_all):
        want = host.align1(encode_read(seq))
        assert len(got) == len(want), seq
        for g, w in zip(got, want):
            assert dataclasses.asdict(g) == dataclasses.asdict(w), seq


def test_batch_engine_phix_golden(request):
    inputs = request.getfixturevalue("reference_inputs")
    fm = fmindex.load_bwa_index(str(inputs / "phix" / "PhiX.fa"))
    batch = BatchAlignmentEngine(fm, use_pallas=False)
    read = (b"TCAAAAACTGACGCGTTGGATGAGGAGAAGTGGCTTAATATGCTTGGCACGTTCGTCAAG"
            b"GACTGGTTTA")
    regs = batch.align_batch([read])[0]
    ea = batch.interpret_align(regs[0])
    assert (ea.contig, ea.offset, regs[0].score) == ("PhiX", 210, 70)
