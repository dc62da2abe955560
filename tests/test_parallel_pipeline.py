"""Multiprocess pipeline: output must be byte-identical to the serial path."""

import gzip

import numpy as np

from lariat_tpu import cli

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = bytes.maketrans(b"ACGT", b"TGCA")


def _mkdata(tmp_path):
    rng = np.random.default_rng(23)
    genome = BASES[rng.integers(0, 4, 50000)].tobytes()
    fasta = tmp_path / "g.fa"
    with open(fasta, "w") as f:
        f.write(">chr1\n")
        s = genome.decode()
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    fq = tmp_path / "r.fastq.gz"
    qual = "I" * 100
    bcs = ["AAACAGAGAAAGAT-1", "CCCTGAGAAAAGAT-1", "GGGTGAGAAAAGAT-1"]
    with gzip.open(fq, "wt") as f:
        for b, bc in enumerate(bcs):
            for i in range(6):
                pos = 2000 + b * 12000 + i * 300
                r1 = genome[pos:pos + 100].decode()
                r2 = genome[pos + 200:pos + 300].translate(COMP)[::-1].decode()
                f.write(f"@b{b}:r{i} rg\n{r1}\n{qual}\n{r2}\n{qual}\n"
                        f"{bc},{bc.split('-')[0]}\nJJJJJJJJJJJJJJ\n"
                        f"ACGTACGT\nIIIIIIII\n")
    return fasta, fq


def test_parallel_matches_serial(tmp_path):
    fasta, fq = _mkdata(tmp_path)
    out1 = tmp_path / "serial"
    out2 = tmp_path / "par"
    base = ["-reads", str(fq), "-genome", str(fasta), "-first_chunk",
            "-read_groups", "s:l:1:fc:1"]
    assert cli.main(base + ["-output", str(out1), "-threads", "1"]) == 0
    assert cli.main(base + ["-output", str(out2), "-threads", "3"]) == 0
    import glob
    import gzip as gz
    files1 = sorted(p.split("/")[-1] for p in glob.glob(str(out1 / "*.bam")))
    files2 = sorted(p.split("/")[-1] for p in glob.glob(str(out2 / "*.bam")))
    assert files1 == files2
    for name in files1:
        a = gz.open(out1 / name, "rb").read()
        b = gz.open(out2 / name, "rb").read()
        assert a == b, f"{name} differs between serial and parallel"


def test_device_primed_parallel_matches_serial(tmp_path):
    """-use_device on (CPU jax backend) must still produce identical BAMs."""
    fasta, fq = _mkdata(tmp_path)
    out1 = tmp_path / "serial2"
    out2 = tmp_path / "primed"
    base = ["-reads", str(fq), "-genome", str(fasta), "-first_chunk",
            "-read_groups", "s:l:1:fc:1"]
    assert cli.main(base + ["-output", str(out1), "-threads", "1"]) == 0
    assert cli.main(base + ["-output", str(out2), "-threads", "2",
                            "-use_device", "on"]) == 0
    import glob
    import gzip as gz
    for name in sorted(p.split("/")[-1]
                       for p in glob.glob(str(out1 / "*.bam"))):
        a = gz.open(out1 / name, "rb").read()
        b = gz.open(out2 / name, "rb").read()
        assert a == b, name
