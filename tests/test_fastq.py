"""FASTQ reader parity tests.

Golden values mirror the reference unit tests
(``go/src/test/fastq_reader_test.go``) run against the same fixture inputs,
which are read in place from the read-only reference checkout.
"""

import gzip

import pytest

from lariat_tpu.io.fastq import FastQReader


def test_read_one_parity(reference_inputs):
    r = FastQReader(str(reference_inputs / "1.fq"))
    rec = None
    for _ in range(3):
        rec = r.read_one(trim=2)
    assert rec is not None
    assert rec.read1 == (b"CCGCCCTAGCCAGGAGAGAAGCACTTCTTACCTGGGTTTCTTAGAGGCTTTGGCTGGCAAT"
                         b"ATTGTCAGCACCAGAGAGGACTTCTCGATGGCTGA")
    assert rec.read_qual1 == (b"BFFFFFFFFFFIIIIIFFIIIIIIIIFIIIIIFIFIFFIIFIIIIIII"
                              b"IIIIIIIIFFFFFFFFFFFFFFFFFFFBFFFFFFFFFFFFFFFFFFFF")
    assert rec.read2.startswith(b"GTGGTAGTCTCCTGTTCAGCCATCGAGAAGTCCTCTCTGGTGCTGAC")
    assert rec.barcode10x == b"AAACAGAGAAAGAT"
    assert rec.barcode10x_qual == b"BBBFFFFFFFFFFI"
    assert rec.barcode == b"CCGAACGC"
    assert rec.barcode_qual == b"BBBFFFFF"
    assert rec.read_info == "HWI-D00684:80:HFCKCADXX:2:2113:9410:56703"
    assert len(rec.trim_bases) == 2


def test_barcode_set_parity(reference_inputs):
    r = FastQReader(str(reference_inputs / "1.fq"))
    set1, _ = r.read_barcode_set(trim=2)
    assert set1[0].read_info == "HWI-D00684:80:HFCKCADXX:2:2113:17628:14813"
    assert set1[1].read1.startswith(b"CTGCTGCTCTCTCCATGTTTTTCCTGCACTCCTTGCAGG")
    set2, _ = r.read_barcode_set(trim=2)
    assert set2[0].read_info == "HWI-D00684:80:HFCKCADXX:2:2112:14227:100270"
    assert set2[1].read1.startswith(b"CGGGCAGCAGCCATGGGATGCAGGACCTGCAGTCCACAC")
    # all records within a set share the barcode
    for s in (set1, set2):
        assert len({rec.barcode10x for rec in s}) == 1


def test_zero_length_reads(reference_inputs):
    r = FastQReader(str(reference_inputs / "zero_length_read_test.fastq.gz"))
    set1, _ = r.read_barcode_set(trim=7)
    assert len(set1) > 0


def _write_fastq(path, records):
    with gzip.open(path, "wt") as f:
        for qname, r1, q1, r2, q2, bc, bq, si, sq in records:
            f.write(f"@{qname}\n{r1}\n{q1}\n{r2}\n{q2}\n{bc}\n{bq}\n{si}\n{sq}\n")


def _mk(qname, bc, seq="ACGT" * 25):
    q = "I" * len(seq)
    return (qname, seq, q, seq, q, bc, "I" * 14, "ACGTACGT", "IIIIIIII")


def test_barcode_grouping_and_trim(tmp_path):
    path = str(tmp_path / "t.fastq.gz")
    recs = ([_mk(f"r{i}", "AAACAGAGAAAGAT-1") for i in range(3)]
            + [_mk(f"s{i}", "CCCCAGAGAAAGAT-1") for i in range(2)])
    _write_fastq(path, recs)
    r = FastQReader(path)
    s1, u1 = r.read_barcode_set(trim=4)
    assert [x.read_info for x in s1] == ["r0", "r1", "r2"]
    assert u1 is True
    assert s1[0].trim_bases == b"ACGT" and s1[0].read1.startswith(b"ACGT")
    assert len(s1[0].read1) == 96
    s2, u2 = r.read_barcode_set(trim=4)
    assert [x.read_info for x in s2] == ["s0", "s1"]
    assert u2 is True
    s3, _ = r.read_barcode_set(trim=4)
    assert s3 is None


def test_nonwhitelist_force_flush(tmp_path):
    path = str(tmp_path / "t.fastq.gz")
    # 450 reads with a non-whitelist barcode (no '-'): flushed at 200/200/50
    recs = [_mk(f"r{i}", "AAAAAAAAAAAAAA") for i in range(450)]
    _write_fastq(path, recs)
    r = FastQReader(path)
    sizes = []
    uniques = []
    while True:
        s, u = r.read_barcode_set(trim=0)
        if s is None:
            break
        sizes.append(len(s))
        uniques.append(u)
    # force-flush fires at index 200 on every call (it precedes the
    # abnormal-break check in reader.go:226-235), deferring the 201st record
    assert sizes == [200, 200, 50]
    assert uniques == [True, True, True]


def test_subprocess_reaped(tmp_path):
    """The pigz/gzip decompressor child is reaped on EOF and on early close
    (no zombie accumulation in long multi-chunk runs)."""
    import shutil
    if not (shutil.which("pigz") or shutil.which("gzip")):
        import pytest
        pytest.skip("no external decompressor")
    from lariat_tpu.io.fastq import open_maybe_gzip, _SubprocessStream
    path = str(tmp_path / "t.fastq.gz")
    recs = [_mk(f"r{i}", "AAACAGAGAAAGAT-1") for i in range(50)]
    _write_fastq(path, recs)

    # full read to EOF
    stream = open_maybe_gzip(path)
    assert isinstance(stream, _SubprocessStream)
    while stream.read(1 << 16):
        pass
    assert stream._proc.returncode is not None  # reaped, not a zombie
    stream.close()

    # early close (mid-stream): child terminated and reaped
    stream = open_maybe_gzip(path)
    stream.read(10)
    stream.close()
    assert stream._proc.returncode is not None

    # FastQReader.close() propagates through the BufferedReader wrapper
    r = FastQReader(path)
    r.read_barcode_set(trim=0)
    proc = r._stream.raw._proc
    r.close()
    assert proc.returncode is not None
