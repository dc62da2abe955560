"""Harness tests: tools/check.py over a simulated-truth run."""

import gzip
import subprocess
import sys

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = bytes.maketrans(b"ACGT", b"TGCA")


def test_check_harness(tmp_path):
    rng = np.random.default_rng(17)
    genome = BASES[rng.integers(0, 4, 40000)].tobytes()
    fasta = tmp_path / "g.fa"
    with open(fasta, "w") as f:
        f.write(">chr1\n")
        s = genome.decode()
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    fq = tmp_path / "r.fastq.gz"
    qual = "I" * 100
    with gzip.open(fq, "wt") as f:
        for i in range(8):
            pos = 3000 + i * 400
            r1 = genome[pos:pos + 100].decode()
            end = pos + 300
            r2 = genome[end - 100:end].translate(COMP)[::-1].decode()
            # truth-in-qname format: mol:x:chrom:x:x:pos1:pos2
            f.write(f"@mol:1:chr1:0:0:{pos}:{end - 100} rg\n{r1}\n{qual}\n"
                    f"{r2}\n{qual}\nAAACAGAGAAAGAT-1,AAACAGAGAAAGAT\n"
                    f"JJJJJJJJJJJJJJ\nACGTACGT\nIIIIIIII\n")
    out = tmp_path / "out"
    log = tmp_path / "check_log.txt"
    res = subprocess.run(
        [sys.executable, "tools/check.py", "-reads", str(fq), "-genome",
         str(fasta), "-output", str(out), "-log", str(log),
         "-threads", "1"],
        capture_output=True, text=True, cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Unmapped       : 0.000000" in res.stdout
    assert "Proper pair    : 1.000000" in res.stdout
    assert "'bin': 45" in res.stdout  # calibration rows present
    assert log.exists()


def test_bam2sam_and_cat(tmp_path):
    """bam2sam prints valid SAM; cat_bams merges chunked outputs."""
    import gzip
    import numpy as np
    genome = np.frombuffer(b"ACGT", dtype=np.uint8)[
        np.random.default_rng(2).integers(0, 4, 30000)].tobytes()
    fasta = tmp_path / "g.fa"
    with open(fasta, "w") as f:
        f.write(">chr1\n")
        s = genome.decode()
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    qual = "I" * 100
    outs = []
    for chunk in range(2):
        fq = tmp_path / f"r{chunk}.fastq.gz"
        with gzip.open(fq, "wt") as f:
            for i in range(4):
                pos = 2000 + chunk * 8000 + i * 400
                r1 = genome[pos:pos + 100].decode()
                r2 = genome[pos + 200:pos + 300].translate(
                    bytes.maketrans(b"ACGT", b"TGCA"))[::-1].decode()
                f.write(f"@c{chunk}r{i} rg\n{r1}\n{qual}\n{r2}\n{qual}\n"
                        f"AAACAGAGAAAGAT-1,AAACAGAGAAAGAT\nJJJJJJJJJJJJJJ\n"
                        f"ACGTACGT\nIIIIIIII\n")
        out = tmp_path / f"out{chunk}"
        argv = ["-reads", str(fq), "-genome", str(fasta), "-output", str(out),
                "-threads", "1"]
        if chunk == 0:
            argv.append("-first_chunk")
        from lariat_tpu import cli as _cli
        assert _cli.main(argv) == 0
        outs.append(str(out))
    merged = tmp_path / "merged.bam"
    r = subprocess.run(
        [sys.executable, "tools/cat_bams.py", "-o", str(merged), "--auto"]
        + outs, capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    from lariat_tpu.io.bamread import BamFile
    recs = list(BamFile(str(merged)))
    assert len(recs) == 16  # 8 pairs across the two chunks
    r = subprocess.run(
        [sys.executable, "tools/bam2sam.py", str(merged)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.split("\n") if l and not l.startswith("@")]
    assert len(lines) == 16
    f0 = lines[0].split("\t")
    assert f0[2] == "chr1" and f0[5].endswith("M")
