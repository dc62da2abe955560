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
        rc, _stats = multihost.run_host(plan, str(fasta), threads=1)
        assert rc == 0
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


def _write_sim_shard(path, genome, comp, barcodes, pairs_per_bc=8):
    """Barcode-complete shard with truth-in-qname simulated reads."""
    qual = "I" * 100
    with gzip.open(path, "wt") as f:
        for b, bc in enumerate(barcodes):
            for i in range(pairs_per_bc):
                pos = 1500 + (b * pairs_per_bc + i) * 250
                r1 = genome[pos:pos + 100].decode()
                r2 = genome[pos + 200:pos + 300].translate(comp)[::-1].decode()
                # simulated qname: truth positions in fields 5 (r1) / 6 (r2)
                qn = f"sim:x:x:x:x:{pos}:{pos + 200}"
                f.write(f"@{qn} rg\n{r1}\n{qual}\n{r2}\n{qual}\n"
                        f"{bc},{bc.split('-')[0]}\nJJJJJJJJJJJJJJ\n"
                        f"ACGTACGT\nIIIIIIII\n")


def test_two_process_distributed(tmp_path):
    """A REAL 2-process jax.distributed run (CPU backend, gloo collectives):
    each process aligns its own barcode-complete shard, then psums simulated
    stats globally; both processes must agree and the merged BAMs must carry
    every record (reference scale-out contract: chunked invocation
    lariat/main.go:16,24 + bucket merge)."""
    import json
    import os
    import socket

    rng = np.random.default_rng(11)
    genome = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, 40000)].tobytes()
    fasta = tmp_path / "g.fa"
    with open(fasta, "w") as f:
        f.write(">chr1\n")
        s = genome.decode()
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    shards = []
    all_bcs = [["AAACAGAGAAAGAT-1", "CCCAGAGAGAAGAT-1"],
               ["GGGACAGAGAAGAT-1", "TTTACAGAGAAGAT-1"]]
    for h in range(2):
        fq = tmp_path / f"shard{h}.fastq.gz"
        _write_sim_shard(str(fq), genome, comp, all_bcs[h])
        shards.append(str(fq))

    # pre-build the index once so the two processes don't race the .npz write
    from lariat_tpu.cli import load_reference
    load_reference(str(fasta))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    procs = []
    for h in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "lariat_tpu.parallel.multihost",
             "-coordinator", f"localhost:{port}",
             "-num_processes", "2", "-process_id", str(h),
             "-reads", shards[h], "-genome", str(fasta),
             "-output_base", str(tmp_path / "mh"),
             "-threads", "2", "-jax_platform", "cpu", "-simulated"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, cwd="/root/repo"))
    outs = []
    for pr in procs:
        out, err = pr.communicate(timeout=240)
        assert pr.returncode == 0, err[-2000:]
        # gloo prints connection banners around our line: find the JSON
        jline = [l for l in out.splitlines() if l.startswith('{"host"')]
        assert jline, out[-2000:]
        outs.append(json.loads(jline[-1]))

    # both processes computed the same global sum over real collectives
    assert outs[0]["global_stats"] == outs[1]["global_stats"]
    expect = [a + b for a, b in zip(outs[0]["local_stats"],
                                    outs[1]["local_stats"])]
    assert outs[0]["global_stats"] == expect
    # 2 hosts * 2 bcs * 8 pairs * 2 mates = 64 reads
    assert outs[0]["global_stats"][0] == 64
    assert outs[0]["global_stats"][1] >= 60      # nearly all correctly placed

    # merge host outputs; every record present exactly once
    merged = tmp_path / "merged.bam"
    r = subprocess.run(
        [sys.executable, "tools/cat_bams.py", "-o", str(merged), "--auto",
         outs[0]["output_dir"], outs[1]["output_dir"]],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    from lariat_tpu.io.bamread import BamFile
    names = sorted(rec.name for rec in BamFile(str(merged)))
    assert len(names) == 64  # 32 pairs * 2 mates
