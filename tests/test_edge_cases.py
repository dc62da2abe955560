"""Degenerate-input hardening (reference lariat_test.go + invariants)."""

import numpy as np
import pytest

from lariat_tpu.align.engine import AlignmentEngine
from lariat_tpu.config import RFAConfig
from lariat_tpu.index import fmindex
from lariat_tpu.io.bamwriter import LariatBAMs
from lariat_tpu.io.fastq import FastQReader
from lariat_tpu.rfa.candidates import get_alignments, get_chains
from lariat_tpu.rfa.pipeline import RFAStats, process_barcode
from lariat_tpu.rfa.types import Region, SwapOrderedMap


def test_zero_length_reads_pipeline(reference_inputs, tmp_path):
    """Reference TestLariatZeroLengthRead (lariat_test.go:12-24) extended to
    the FULL pipeline incl. BAM emission."""
    fm = fmindex.load_bwa_index(str(reference_inputs / "phix" / "PhiX.fa"))
    engine = AlignmentEngine(fm)
    reader = FastQReader(str(reference_inputs / "zero_length_read_test.fastq.gz"))
    reads, unique = reader.read_barcode_set(trim=7)
    assert reads
    chains, _ = get_chains(engine, reads, 25)
    get_alignments(engine, chains, 17, -17.0)  # crash-freedom regression
    result = process_barcode(engine, reads, unique, RFAConfig(
        improper_pair_penalty=-17.0))
    bams = LariatBAMs(contigs=[(c.name, c.length) for c in fm.contigs],
                      base_path=str(tmp_path / "out"), read_groups="",
                      sample_id="s", position_chunk_size=40000000,
                      debug_tags=False, first_chunk=True)
    bams.dump(result.alignments, result.attach_bx)
    bams.close()


def test_simulated_mode_and_centromeres(tmp_path):
    rng = np.random.default_rng(61)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    g = bases[rng.integers(0, 4, 60000)].tobytes()
    fasta = tmp_path / "g.fa"
    with open(fasta, "w") as f:
        f.write(">chr1\n")
        s = g.decode()
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    fm = fmindex.build_index(str(fasta))
    engine = AlignmentEngine(fm)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    from lariat_tpu.io.fastq import FastQRecord
    reads = []
    for i in range(8):
        pos = 5000 + i * 400
        end = pos + 200
        q = b"I" * 100
        reads.append(FastQRecord(
            read1=g[pos:pos + 100], read_qual1=q,
            read2=g[end:end + 100].translate(comp)[::-1], read_qual2=q,
            barcode10x=b"AAACAGAGAAAGAT-1", barcode10x_qual=b"J" * 14,
            raw_barcode10x=b"AAACAGAGAAAGAT", barcode=b"ACGTACGT",
            barcode_qual=b"IIIIIIII",
            read_info=f"mol:1:chr1:0:0:{pos}:{end}"))
    # centromere covering half the molecule span
    cent = {"chr1": Region(6000, 7000)}
    stats = RFAStats()
    result = process_barcode(engine, reads, True, RFAConfig(),
                             centromeres=cent, stats=stats, simulated=True)
    actives = [a for arr in result.alignments for a in arr if a.active]
    inside = [a for a in actives if 6000 < a.pos <= 7000]
    assert inside and all(a.mapq == 0 for a in inside)
    outside = [a for a in actives if not (6000 < a.pos <= 7000)]
    assert outside and all(a.mapq > 0 for a in outside)
    # simulated-truth accounting (lariat.go:517-542)
    assert stats.total == len(actives)
    assert stats.correct == len(actives)
    assert stats.correct_mapq10 == len(outside)


def test_swap_ordered_map_semantics():
    """Delete moves the LAST entry into the hole (ordered_map.go:39-51)."""
    m = SwapOrderedMap()
    for k in [10, 20, 30, 40]:
        m.set(k, k * 2)
    assert m.keys() == [10, 20, 30, 40]
    m.delete(20)
    assert m.keys() == [10, 40, 30]
    assert m.get(40) == 80
    m.delete(30)
    assert m.keys() == [10, 40]
    m.set(50, 100)
    assert m.keys() == [10, 40, 50]
    m.delete(10)
    assert m.keys() == [50, 40]
    assert len(m) == 2 and 40 in m and 10 not in m


def test_mapq_calibration_with_segdups(tmp_path):
    """Simulated segdup data: no incorrect placement may carry MAPQ >= 10
    (the reference's empirical-vs-reported calibration check, check.py:47-101
    and lariat.go:517-542)."""
    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    glen = 400_000
    g = bases[rng.integers(0, 4, glen)]
    g[300_000:303_000] = g[100_000:103_000]  # segdup pair 200kb apart
    fasta = tmp_path / "g.fa"
    with open(fasta, "w") as f:
        f.write(">chr1\n")
        s = g.tobytes().decode()
        for i in range(0, len(s), 1 << 16):
            f.write(s[i:i + (1 << 16)] + "\n")
    fm = fmindex.build_index(str(fasta))
    genome = g.tobytes()
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    from lariat_tpu.io.fastq import FastQRecord
    engine = AlignmentEngine(fm)
    total = wrong_conf = 0
    for b in range(6):
        reads = []
        for m in range(2):
            start = int(rng.integers(0, glen - 60000))
            for i in range(10):
                pos = start + int(rng.integers(0, 50000))
                end = pos + 300
                if end > glen:
                    continue
                q = b"I" * 120
                reads.append(FastQRecord(
                    read1=genome[pos:pos + 120], read_qual1=q,
                    read2=genome[end - 120:end].translate(comp)[::-1],
                    read_qual2=q, barcode10x=b"AAACAGAGAAAGAT-1",
                    barcode10x_qual=b"J" * 14,
                    raw_barcode10x=b"AAACAGAGAAAGAT", barcode=b"ACGTACGT",
                    barcode_qual=b"IIIIIIII",
                    read_info=f"mol:{m}:chr1:0:0:{pos}:{end - 120}"))
        res = process_barcode(engine, reads, True, RFAConfig())
        for arr in res.alignments:
            for a in arr:
                if not a.active:
                    continue
                truth = int(a.read_name.split(":")[5 if a.read1 else 6])
                total += 1
                if a.mapq >= 10 and abs(a.pos - truth) >= 600:
                    wrong_conf += 1
    assert total > 100
    assert wrong_conf == 0, f"{wrong_conf}/{total} overconfident placements"
