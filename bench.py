"""Benchmark: device candidate-generation throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the flagship device step (FM exact seed -> SA dereference -> window
fetch -> banded SW extension of the full read) in steady state on the default
JAX device (the real TPU chip under the driver). Reads are simulated 151 bp
pairs over an E. coli-scale synthetic genome.

vs_baseline compares against 10,000 read pairs/s — a rough figure for the
single-node reference (Go + BWA C API, 8 threads) on commodity CPUs; the
reference repo publishes no numbers (BASELINE.md) and its native submodules
are not buildable here, so this stands in for the "single-node Go+BWA"
denominator of the >=10x north-star target.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PAIRS_PER_S = 10_000.0


def main() -> None:
    import jax

    from lariat_tpu.align import ksw
    from lariat_tpu.index import fmindex
    from lariat_tpu.parallel.align_step import DeviceGenome, align_step

    # E. coli-scale genome (4.6 Mb)
    rng = np.random.default_rng(12)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    glen = 4_600_000
    g = bases[rng.integers(0, 4, glen)]
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        s = g.tobytes().decode()
        f.write(">chrE\n")
        step = 1 << 16
        for i in range(0, len(s), step):
            f.write(s[i:i + step] + "\n")
        path = f.name
    t_index = time.time()
    fm = fmindex.build_index(path, sa_intv=4)  # dense SA: short batched LF walks
    t_index = time.time() - t_index

    codes = fmindex.NT4_TABLE[np.frombuffer(g.tobytes(), dtype=np.uint8)]
    B, L = 8192, 151
    starts = rng.integers(0, glen - L, B)
    reads = np.zeros((B, L), np.uint8)
    for i, pos in enumerate(starts):
        seg = codes[pos:pos + L].copy()
        if i % 2:
            seg = (3 - seg)[::-1]
        p = int(rng.integers(0, L))
        seg[p] = (seg[p] + 1) % 4
        reads[i] = seg
    lens = np.full(B, L, np.int32)
    mat = np.asarray(ksw.fill_score_matrix(1, 4))

    dg = jax.device_put(DeviceGenome.from_host(fm))
    reads_d = jax.device_put(reads)
    lens_d = jax.device_put(lens)
    mat_d = jax.device_put(mat)

    use_pallas = jax.default_backend() not in ("cpu",)
    # warmup/compile
    res = align_step(dg, reads_d, lens_d, mat_d, use_pallas=use_pallas)
    jax.block_until_ready(res.score)
    mapped = int(np.sum(np.asarray(res.mapped)))

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        res = align_step(dg, reads_d, lens_d, mat_d, use_pallas=use_pallas)
    jax.block_until_ready(res.score)
    dt = (time.time() - t0) / iters
    reads_per_s = B / dt
    pairs_per_s = reads_per_s / 2.0

    # end-to-end figure: the REAL per-barcode RFA pipeline (grouped device
    # priming) on a sample of synthetic barcodes
    from lariat_tpu.align.batch_engine import BatchAlignmentEngine
    from lariat_tpu.config import RFAConfig
    from lariat_tpu.io.fastq import FastQRecord
    from lariat_tpu.rfa.pipeline import process_barcode_group
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    gbytes = g.tobytes()

    def mkpair(pos, name, bc):
        r1 = gbytes[pos:pos + 151]
        r2 = gbytes[pos + 149:pos + 300].translate(comp)[::-1]
        q = b"I" * 151
        return FastQRecord(read1=r1, read_qual1=q, read2=r2, read_qual2=q,
                           barcode10x=bc, barcode10x_qual=b"J" * 14,
                           raw_barcode10x=bc.split(b"-")[0],
                           barcode=b"ACGTACGT", barcode_qual=b"IIIIIIII",
                           read_info=name)

    def make_bc(bc):
        out = []
        for m in range(3):
            start = int(rng.integers(0, glen - 200000))
            for i in range(17):
                out.append(mkpair(start + i * 2500,
                                  f"{bc.decode()}:{m}:{i}", bc))
        return out

    engine = BatchAlignmentEngine(fm, use_pallas=use_pallas)
    cfg = RFAConfig()
    warm = [(make_bc(f"WW{j:04d}-1".encode()), True) for j in range(20)]
    process_barcode_group(engine, warm, cfg)
    groups = [(make_bc(f"BC{j:04d}-1".encode()), True) for j in range(20)]
    t0 = time.time()
    process_barcode_group(engine, groups, cfg)
    e2e_dt = time.time() - t0
    e2e_pairs = sum(len(b) for b, _ in groups)
    # host-native single-process figure (the multiprocess CLI scales this by
    # the worker count)
    from lariat_tpu.align.engine import AlignmentEngine
    from lariat_tpu.rfa.pipeline import process_barcode
    host_engine = AlignmentEngine(fm)
    process_barcode(host_engine, groups[0][0], True, cfg)
    t0 = time.time()
    for reads_, uniq_ in groups:
        process_barcode(host_engine, reads_, uniq_, cfg)
    host_dt = time.time() - t0

    print(json.dumps({
        "metric": "read pairs candidate-generated/sec/chip "
                  "(seed+SA+extend device step, 151bp, E.coli-scale genome)",
        "value": round(pairs_per_s, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
        "detail": {
            "batch": B, "read_len": L, "mapped_frac": mapped / B,
            "step_ms": round(dt * 1e3, 2),
            "index_build_s": round(t_index, 1),
            "device": str(jax.devices()[0]),
            "pallas": use_pallas,
            "e2e_rfa_device_primed_1proc": round(e2e_pairs / e2e_dt, 1),
            "e2e_rfa_host_native_1proc": round(e2e_pairs / host_dt, 1),
        },
    }))


if __name__ == "__main__":
    main()
