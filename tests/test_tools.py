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
