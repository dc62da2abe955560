"""Regenerate data_big/ (bench inputs at chr20- and hg38-scale).

Order: chr20-scale first (minutes), then the hg38-scale index build
(~70 min, ~124 GB peak RSS on this 125 GB host — run nothing RAM-heavy
alongside). Saves straight to the mmap-able .lariat.d directory format,
skipping the intermediate .npz of tools/build_big_index.py.

    setsid nohup python tools/gen_data_big.py > data_big/gen.log 2>&1 &
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DB = os.path.join(REPO, "data_big")


def run(args: list) -> None:
    print("+", " ".join(args), flush=True)
    subprocess.run([sys.executable] + args, check=True, cwd=REPO)


def build(fa: str, sa_intv: int = 32) -> None:
    from lariat_tpu.index import fmindex
    t0 = time.time()
    fm = fmindex.build_index(fa, sa_intv=sa_intv)
    print(f"build {fa}: {time.time() - t0:.0f}s, l_pac={fm.l_pac:,}",
          flush=True)
    t0 = time.time()
    fm.save_dir(fa)
    print(f"save_dir: {time.time() - t0:.0f}s", flush=True)


def main() -> None:
    os.makedirs(DB, exist_ok=True)
    # --- chr20-scale (~64 Mbp total) + 1M pairs ---
    c20 = os.path.join(DB, "chr20sim.fa")
    if not os.path.isdir(c20 + ".lariat.d"):
        run(["tools/synth_genome.py", c20, "--scale", "0.0208",
             "--seed", "7"])
        build(c20)
    if not os.path.exists(os.path.join(DB, "sim1m_chr20.fastq.gz")):
        run(["tools/sim_reads.py", c20,
             os.path.join(DB, "sim1m_chr20.fastq.gz"),
             "--barcodes", "10000", "--pairs-per-bc", "100"])
    # --- hg38-scale (3.09 Gbp) + 50k/10k pairs ---
    hg = os.path.join(DB, "hg38sim.fa")
    if not os.path.isdir(hg + ".lariat.d"):
        run(["tools/synth_genome.py", hg, "--scale", "1.0", "--seed", "7",
             "--centromeres", os.path.join(DB, "hg38sim.centromeres.tsv")])
        build(hg)
    for name, bcs, ppb in (("sim200k.fastq.gz", 4000, 50),
                           ("sim50k.fastq.gz", 1000, 50),
                           ("sim10k.fastq.gz", 200, 50)):
        out = os.path.join(DB, name)
        if not os.path.exists(out):
            run(["tools/sim_reads.py", hg, out, "--barcodes", str(bcs),
                 "--pairs-per-bc", str(ppb)])
    print("data_big complete", flush=True)


if __name__ == "__main__":
    main()
