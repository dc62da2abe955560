"""BAM emission round-trip tests: pipeline output read back and validated."""

import glob
import os

import numpy as np
import pytest

from lariat_tpu.align.engine import AlignmentEngine
from lariat_tpu.config import RFAConfig
from lariat_tpu.io.bamread import BamFile
from lariat_tpu.io.bamwriter import LariatBAMs
from lariat_tpu.rfa.pipeline import process_barcode

from test_rfa import _make_pair, dup_genome  # noqa: F401  (fixture reuse)


@pytest.fixture()
def emitted(dup_genome, tmp_path):  # noqa: F811
    fm, genome = dup_genome
    engine = AlignmentEngine(fm)
    reads = []
    for i, pos in enumerate(range(4000, 5200, 150)):
        reads.append(_make_pair(genome, pos, 280, f"q:{i}"))
    result = process_barcode(engine, reads, True, RFAConfig())
    out = str(tmp_path / "out")
    bams = LariatBAMs(contigs=[(c.name, c.length) for c in fm.contigs],
                      base_path=out, read_groups="s:l:1:fc:1", sample_id="s",
                      position_chunk_size=40000000, debug_tags=False,
                      first_chunk=True)
    bams.dump(result.alignments, result.attach_bx)
    bams.close()
    return out, reads


def test_bam_roundtrip(emitted):
    out, reads = emitted
    bam = BamFile(os.path.join(out, "bc_sorted_bam.bam"))
    assert bam.references[0][0] == "chrT"
    recs = list(bam)
    assert len(recs) == 2 * len(reads)
    names = {r.name for r in recs}
    assert names == {f"q:{i}" for i in range(len(reads))}
    for r in recs:
        assert not r.is_unmapped
        assert r.is_proper_pair
        assert r.ref_name == "chrT"
        assert r.mapq > 0
        assert sum(l for op, l in r.cigar if op in "MIS=X") == 100
        # RX/QX/BX/AS tags present
        assert "RX" in r.tags and "QX" in r.tags and "AS" in r.tags
        assert r.tags.get("BX") == "AAACAGAGAAAGAT-1"
    # pairing: read1 forward, read2 reverse, TLEN symmetric
    r1 = [r for r in recs if r.is_read1]
    r2 = [r for r in recs if not r.is_read1]
    assert all(not r.is_reverse for r in r1)
    assert all(r.is_reverse for r in r2)
    by_name = {}
    for r in recs:
        by_name.setdefault(r.name, []).append(r)
    for name, pair in by_name.items():
        a, b = pair
        assert a.mate_pos == b.pos and b.mate_pos == a.pos
        assert a.tlen == -b.tlen and abs(a.tlen) == 280


def test_position_bucketed_output(emitted):
    out, reads = emitted
    files = sorted(glob.glob(os.path.join(out, "*_pos_bucketed.bam")))
    assert any("000000-chrT_0000000000" in f for f in files)
    assert any("ZZZ_unmapped" in f for f in files)
    pos_bam = [f for f in files if "chrT" in f][0]
    recs = list(BamFile(pos_bam))
    assert len(recs) == 2 * len(reads)
    unmapped = list(BamFile([f for f in files if "ZZZ" in f][0]))
    assert len(unmapped) == 0


def test_header_text(emitted):
    out, _ = emitted
    bam = BamFile(os.path.join(out, "bc_sorted_bam.bam"))
    assert "@SQ\tSN:chrT\tLN:80000" in bam.header_text
    assert "@RG\tID:s:l:1:fc:1\tLB:l.1\tPL:ILLUMINA" in bam.header_text
    assert "@PG\tID:lariat" in bam.header_text
    assert "10x_bam_to_fastq:R1" in bam.header_text
