"""Multi-contig genomes: rid mapping, cross-contig pairs, bucketed outputs.

Exercises the n_contigs > 1 branches (pos_to_contig / bns_intv2rid) in both
the Python and C++ engines, which single-contig tests never reach.
"""

import dataclasses
import gzip
import os

import numpy as np
import pytest

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = bytes.maketrans(b"ACGT", b"TGCA")


@pytest.fixture(scope="module")
def tri_genome(tmp_path_factory):
    rng = np.random.default_rng(33)
    contigs = {"chrA": BASES[rng.integers(0, 4, 30000)].tobytes(),
               "chrB": BASES[rng.integers(0, 4, 12000)].tobytes(),
               "chrC": BASES[rng.integers(0, 4, 50000)].tobytes()}
    fa = tmp_path_factory.mktemp("tri") / "tri.fa"
    with open(fa, "w") as f:
        for name, seq in contigs.items():
            f.write(f">{name}\n")
            s = seq.decode()
            for i in range(0, len(s), 70):
                f.write(s[i:i + 70] + "\n")
    from lariat_tpu.index import fmindex
    return fmindex.build_index(str(fa)), contigs, str(fa)


def test_multicontig_rid_and_native_parity(tri_genome):
    from lariat_tpu.align import native_engine
    from lariat_tpu.align.engine import AlignmentEngine, encode_read

    fm, contigs, _ = tri_genome
    assert len(fm.contigs) == 3
    engine = AlignmentEngine(fm)
    rng = np.random.default_rng(9)
    for name, seq in contigs.items():
        for _ in range(6):
            ln = int(rng.integers(60, 151))
            pos = int(rng.integers(0, len(seq) - ln))
            q = bytearray(seq[pos:pos + ln])
            for _ in range(int(rng.integers(0, 4))):
                q[int(rng.integers(0, len(q)))] = b"ACGT"[
                    int(rng.integers(0, 4))]
            if rng.integers(0, 2):
                q = bytearray(bytes(q).translate(COMP)[::-1])
            qc = encode_read(bytes(q))
            py = engine.align1(qc)
            mr = engine.collect_mems_many([qc], with_rbegs=True, raw=True)
            nat = native_engine.align1_batch(
                fm, engine.opt, [qc], [mr[0][0]], [mr[0][1]])
            if nat is not None:
                assert len(nat[0]) == len(py)
                for a, b in zip(nat[0], py):
                    assert dataclasses.asdict(a) == dataclasses.asdict(b)
            if py:
                sra = engine.reg2aln(bytes(q), py[0])
                assert sra.chrom == name, (name, sra.chrom)


def test_multicontig_cli_buckets(tri_genome, tmp_path):
    from lariat_tpu import cli
    from lariat_tpu.io.bamread import BamFile

    fm, contigs, fa = tri_genome
    fq = tmp_path / "r.fastq.gz"
    qual = "I" * 100
    n = 0
    with gzip.open(fq, "wt") as f:
        bc = "AAACAGAGAAAGAT-1"
        for name, seq in contigs.items():
            for i in range(5):
                pos = 2000 + i * 400
                r1 = seq[pos:pos + 100].decode()
                r2 = seq[pos + 200:pos + 300].translate(COMP)[::-1].decode()
                f.write(f"@{name}:r{i} x\n{r1}\n{qual}\n{r2}\n{qual}\n"
                        f"{bc},{bc.split('-')[0]}\nJJJJJJJJJJJJJJ\n"
                        f"ACGTACGT\nIIIIIIII\n")
                n += 1
        # cross-contig pair (improper): mates on chrA and chrC
        r1 = contigs["chrA"][5000:5100].decode()
        r2 = contigs["chrC"][9000:9100].translate(COMP)[::-1].decode()
        f.write(f"@cross:r x\n{r1}\n{qual}\n{r2}\n{qual}\n"
                f"{bc},{bc.split('-')[0]}\nJJJJJJJJJJJJJJ\n"
                f"ACGTACGT\nIIIIIIII\n")
        n += 1
    out = tmp_path / "out"
    rc = cli.main(["-reads", str(fq), "-genome", fa, "-output", str(out),
                   "-threads", "1", "-first_chunk"])
    assert rc == 0
    recs = list(BamFile(str(out / "bc_sorted_bam.bam")))
    assert len(recs) == 2 * n
    by_chrom = {}
    for r in recs:
        by_chrom.setdefault(r.ref_name, []).append(r)
    assert set(by_chrom) == {"chrA", "chrB", "chrC"}
    # small contigs pack into ONE position bucket (reference semantics:
    # one bucket per <=40 Mbp chunk, named after its first contig) and the
    # packed bucket holds records from all three contigs
    import glob
    buckets = sorted(os.path.basename(p)
                     for p in glob.glob(str(out / "*pos_bucketed.bam")))
    assert buckets == ["000000-chrA_0000000000_pos_bucketed.bam",
                       "ZZZ_unmapped_pos_bucketed.bam"], buckets
    packed = list(BamFile(str(out / buckets[0])))
    assert {r.ref_name for r in packed} == {"chrA", "chrB", "chrC"}
    # the cross-contig pair is not a proper pair and mates point across
    cross = [r for r in recs if r.name.startswith("cross")]
    assert len(cross) == 2
    assert not cross[0].is_proper_pair
    chroms = {r.ref_name for r in cross}
    assert chroms == {"chrA", "chrC"}
