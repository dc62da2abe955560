"""Resident device-server IPC: server subprocess + client parity + CLI path.

The server normally fronts a real TPU; here it runs cpu-pinned (conftest
pins JAX_PLATFORMS=cpu) and the CLI opts in via LARIAT_DEVICE_SERVER_CPU_OK
— the IPC plumbing, engine-proxy surface, and failure degradation are what
these tests pin down.
"""

import gzip
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from lariat_tpu import cli
from lariat_tpu.io.bamread import BamFile
from lariat_tpu.parallel import device_server

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = bytes.maketrans(b"ACGT", b"TGCA")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_inputs(tmp_path, n_bc=3, pairs=8):
    rng = np.random.default_rng(33)
    genome = bytearray(BASES[rng.integers(0, 4, 60000)].tobytes())
    genome[40000:42000] = genome[5000:7000]
    genome = bytes(genome)
    fasta = tmp_path / "g.fa"
    with open(fasta, "w") as f:
        f.write(">chr1\n")
        s = genome.decode()
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    fq = tmp_path / "reads.fastq.gz"
    bcs = ["AAACAGAGAAAGAT-1", "CCCTGAGAAAAGAT-1", "GGGCAGAGAAAGAT-1"]
    with gzip.open(fq, "wt") as f:
        qual = "I" * 100
        for bc_i in range(n_bc):
            bc = bcs[bc_i]
            for i in range(pairs):
                pos = 1500 + bc_i * 11000 + i * 220
                r1 = genome[pos:pos + 100].decode()
                r2 = genome[pos + 200:pos + 300].translate(
                    COMP)[::-1].decode()
                f.write(f"@b{bc_i}:r{i} rg\n{r1}\n{qual}\n{r2}\n{qual}\n"
                        f"{bc},{bc.split('-')[0]}\nJJJJJJJJJJJJJJ\n"
                        f"ACGTACGT\nIIIIIIII\n")
    return fasta, fq


def _start_server(fasta, tmp_path):
    sock = str(tmp_path / "srv.sock")
    ready = str(tmp_path / "ready")
    env = {**os.environ, "PYTHONPATH": REPO + (
        ":" + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH") else ""),
        "JAX_PLATFORMS": "cpu", "LARIAT_PRIME_BATCH": "8"}
    proc = subprocess.Popen(
        [sys.executable, "-m", "lariat_tpu.parallel.device_server",
         "-genome", str(fasta), "-socket", sock, "-ready_file", ready],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    for _ in range(600):
        if os.path.exists(ready):
            break
        if proc.poll() is not None:
            raise RuntimeError(proc.stdout.read().decode()[-800:])
        time.sleep(0.1)
    else:
        proc.kill()
        raise RuntimeError("server never became ready")
    return proc, sock


def test_server_prime_matches_local_engine(tmp_path):
    fasta, fq = _mk_inputs(tmp_path)
    from lariat_tpu.align.batch_engine import BatchAlignmentEngine
    from lariat_tpu.io.fastq import FastQReader
    from lariat_tpu.rfa.pipeline import RFAConfig

    fm = cli.load_reference(str(fasta))
    engine = BatchAlignmentEngine(fm, use_pallas=False)
    config = RFAConfig()
    reader = FastQReader(str(fq))
    reads, _ = reader.read_barcode_set(0)

    proc, sock = _start_server(fasta, tmp_path)
    try:
        client = device_server.DeviceServerClient.connect(
            str(fasta), path=sock)
        assert client is not None
        assert client.backend == "cpu"
        want = engine.prime_regions(reads, config.chain_score_delta)
        got = client.prime_regions(reads, config.chain_score_delta)
        assert len(got) == len(want)
        for (g1, g2, gr, gs1, gs2), (w1, w2, wr, ws1, ws2) in zip(got,
                                                                  want):
            assert g1 == w1 and g2 == w2 and gr == wr
            assert gs1 == ws1 and gs2 == ws2
        assert client.wave_stats["n"] >= 0
    finally:
        proc.kill()
        proc.wait()


def test_cli_via_server_bit_identical(tmp_path):
    """CLI with a device server produces byte-identical records to the
    host-native run (same parity bar the direct device path clears)."""
    fasta, fq = _mk_inputs(tmp_path)
    out_host = tmp_path / "out_host"
    rc = cli.main(["-reads", str(fq), "-genome", str(fasta),
                   "-output", str(out_host), "-threads", "2",
                   "-use_device", "off"])
    assert rc == 0

    proc, sock = _start_server(fasta, tmp_path)
    try:
        os.environ["LARIAT_DEVICE_SERVER_CPU_OK"] = "1"
        os.environ["LARIAT_PRIME_BATCH"] = "8"
        os.environ["LARIAT_DEVICE_SOCKET"] = sock
        out_srv = tmp_path / "out_srv"
        rc = cli.main(["-reads", str(fq), "-genome", str(fasta),
                       "-output", str(out_srv), "-threads", "2",
                       "-use_device", "on"])
        assert rc == 0
    finally:
        os.environ.pop("LARIAT_DEVICE_SERVER_CPU_OK", None)
        os.environ.pop("LARIAT_PRIME_BATCH", None)
        os.environ.pop("LARIAT_DEVICE_SOCKET", None)
        proc.kill()
        proc.wait()
    recs_h = [(r.name, r.pos, r.cigar, r.tags.get("BX"))
              for r in BamFile(str(out_host / "bc_sorted_bam.bam"))]
    recs_s = [(r.name, r.pos, r.cigar, r.tags.get("BX"))
              for r in BamFile(str(out_srv / "bc_sorted_bam.bam"))]
    assert recs_h == recs_s


def test_client_degrades_on_dead_server(tmp_path):
    """A server that dies mid-run must not sink the CLI: the client raises
    PrimeAborted and the router host-routes."""
    fasta, fq = _mk_inputs(tmp_path)
    proc, sock = _start_server(fasta, tmp_path)
    client = device_server.DeviceServerClient.connect(str(fasta), path=sock)
    assert client is not None
    proc.kill()
    proc.wait()
    from lariat_tpu.align.batch_engine import PrimeAborted
    from lariat_tpu.io.fastq import FastQReader
    reader = FastQReader(str(fq))
    reads, _ = reader.read_barcode_set(0)
    with pytest.raises(PrimeAborted):
        client.prime_regions(reads, 17)
    assert client.dead
