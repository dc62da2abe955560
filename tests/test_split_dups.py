"""Direct unit tests for split-read detection and duplicate marking."""

from lariat_tpu.io.fastq import FastQRecord
from lariat_tpu.rfa.dups import mark_duplicates
from lariat_tpu.rfa.split import check_split_reads, get_split_alignment
from lariat_tpu.rfa.types import Alignment, Region


def _fq(read_len):
    seq = b"A" * read_len
    return FastQRecord(read1=seq, read_qual1=b"I" * read_len, read2=seq,
                       read_qual2=b"I" * read_len,
                       barcode10x=b"ACGTACGTACGTAA-1",
                       barcode10x_qual=b"J" * 14,
                       raw_barcode10x=b"ACGTACGTACGTAA",
                       barcode=b"ACGTACGT", barcode_qual=b"IIIIIIII",
                       read_info="t")


def _aln(read_len=120, **kw):
    base = dict(id=0, contig="chr1", pos=100, read1=True, reversed_=False,
                active=False, fastq=_fq(read_len))
    base.update(kw)
    return Alignment(**base)


def test_mark_duplicates_first_kept():
    m1 = _aln(pos=500)
    a = _aln(active=True, mate_alignment=m1)
    b = _aln(active=True, mate_alignment=m1)       # identical tuple
    c = _aln(active=True, pos=101, mate_alignment=m1)
    d = _aln(active=False, mate_alignment=m1)      # inactive: ignored
    mark_duplicates([[a], [b], [c], [d]])
    assert not a.duplicate and b.duplicate
    assert not c.duplicate and not d.duplicate


def test_mark_duplicates_distinguishes_strand_and_mate():
    m1 = _aln(pos=500)
    m2 = _aln(pos=700)
    a = _aln(active=True, mate_alignment=m1)
    b = _aln(active=True, reversed_=True, mate_alignment=m1)
    c = _aln(active=True, mate_alignment=m2)
    mark_duplicates([[a], [b], [c]])
    assert not a.duplicate and not b.duplicate and not c.duplicate


def test_split_picks_distinct_segment():
    # primary covers [0, 60) of a 151bp read; candidate covers [70, 150)
    primary = _aln(active=True, readmap_s=0, readmap_e=60, score=60,
                   read_len=151)
    supp = _aln(pos=9000, readmap_s=70, readmap_e=150, score=80)
    other = _aln(pos=120, readmap_s=5, readmap_e=55, score=50)  # overlapping
    arr = [primary, supp, other]
    split, second_best = get_split_alignment(primary, arr, {}, -4.0)
    assert split is supp
    assert split.mapq == 60  # min(score, 60), no runner-up
    check_split_reads([arr], {}, -4.0)
    assert primary.secondary is supp
    assert supp.primary is primary
    assert supp.mapq_data is not None


def test_split_rejects_low_score_improper():
    primary = _aln(active=True, readmap_s=0, readmap_e=60, score=60,
                   read_len=151)
    weak = _aln(pos=9000, readmap_s=70, readmap_e=150, score=20)  # <36
    split, _ = get_split_alignment(primary, [primary, weak], {}, -4.0)
    assert split is None


def test_split_requires_unmapped_tail():
    # primary covers nearly the whole read: no split possible
    primary = _aln(active=True, readmap_s=0, readmap_e=140, score=140,
                   read_len=151)
    supp = _aln(pos=9000, readmap_s=141, readmap_e=150, score=40)
    split, _ = get_split_alignment(primary, [primary, supp], {}, -4.0)
    assert split is None


def test_split_centromere_zeroes_mapq():
    primary = _aln(active=True, readmap_s=0, readmap_e=60, score=60,
                   read_len=151)
    supp = _aln(pos=9000, readmap_s=70, readmap_e=150, score=80)
    split, _ = get_split_alignment(primary, [primary, supp],
                                   {"chr1": Region(8000, 10000)}, -4.0)
    assert split is supp and split.mapq == 0
