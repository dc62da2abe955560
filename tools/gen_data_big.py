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


def _acquire_lock() -> bool:
    """data_big/.gen.lock holds the generator's PID. One generator at a
    time: the hg38 index build peaks ~124 GB RSS on a 125 GB host, so a
    second concurrent build (e.g. bench.py regenerating while a manual
    run is in flight) OOMs both. Stale locks (dead PID) are reclaimed."""
    os.makedirs(DB, exist_ok=True)
    lock = os.path.join(DB, ".gen.lock")
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return True
        except FileExistsError:
            try:
                pid = int(open(lock).read().strip() or "0")
            except (OSError, ValueError):
                pid = 0
            if pid > 0:
                try:
                    os.kill(pid, 0)
                    return False          # live generator owns the lock
                except ProcessLookupError:
                    pass
            try:
                os.unlink(lock)           # stale: reclaim
            except FileNotFoundError:
                pass


def wait_for_generator(timeout_s: float = 7200.0) -> bool:
    """True once no live generator holds the lock (polls 5 s)."""
    lock = os.path.join(DB, ".gen.lock")
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            pid = int(open(lock).read().strip() or "0")
        except (OSError, ValueError):
            return True
        try:
            os.kill(pid, 0)
        except (ProcessLookupError, ValueError):
            return True
        time.sleep(5)
    return False


if __name__ == "__main__":
    if not _acquire_lock():
        print("another generator is live (data_big/.gen.lock); waiting",
              flush=True)
        wait_for_generator()
        sys.exit(0)
    try:
        main()
    finally:
        try:
            os.unlink(os.path.join(DB, ".gen.lock"))
        except FileNotFoundError:
            pass
