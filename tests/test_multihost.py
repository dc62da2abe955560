"""Multi-host driver: degenerate single-host mode + shard/merge round trip."""

import gzip
import subprocess
import sys

import numpy as np

from lariat_tpu.parallel import multihost
from lariat_tpu.rfa.pipeline import RFAStats


def test_plan_and_run_two_shards(tmp_path):
    rng = np.random.default_rng(8)
    genome = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, 30000)].tobytes()
    fasta = tmp_path / "g.fa"
    with open(fasta, "w") as f:
        f.write(">chr1\n")
        s = genome.decode()
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    qual = "I" * 100
    shard_paths = []
    for shard in range(2):
        fq = tmp_path / f"shard{shard}.fastq.gz"
        with gzip.open(fq, "wt") as f:
            bc = ["AAACAGAGAAAGAT-1", "CCCAGAGAGAAGAT-1"][shard]
            for i in range(6):
                pos = 2000 + shard * 9000 + i * 300
                r1 = genome[pos:pos + 100].decode()
                r2 = genome[pos + 200:pos + 300].translate(comp)[::-1].decode()
                f.write(f"@s{shard}r{i} rg\n{r1}\n{qual}\n{r2}\n{qual}\n"
                        f"{bc},{bc.split('-')[0]}\nJJJJJJJJJJJJJJ\n"
                        f"ACGTACGT\nIIIIIIII\n")
        shard_paths.append(str(fq))
    plans = multihost.plan_host_shards(shard_paths, str(tmp_path / "o"), 2)
    assert len(plans) == 2
    assert plans[0].first_chunk and not plans[1].first_chunk
    multihost.init_distributed(num_processes=1)  # degenerate no-op
    for plan in plans:
        assert multihost.run_host(plan, str(fasta), threads=1) == 0
    # merge the per-host outputs
    merged = tmp_path / "merged.bam"
    r = subprocess.run(
        [sys.executable, "tools/cat_bams.py", "-o", str(merged), "--auto",
         plans[0].output_dir, plans[1].output_dir],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    from lariat_tpu.io.bamread import BamFile
    recs = list(BamFile(str(merged)))
    assert len(recs) == 24
    # stats psum degenerate path
    st = RFAStats(total=10, correct=9, total_mapq10=8, correct_mapq10=7)
    assert multihost.global_stats_psum(st) == [10, 9, 8, 7]
