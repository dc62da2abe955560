"""Convert a .lariat.npz index to the mmap-able .lariat.d directory format.

    python tools/npz_to_dir.py data_big/hg38sim.fa

Computes occ_ckpt if the npz predates its persistence. The directory
format loads in ~ms (np.load mmap_mode='r'); the npz needs a full
stream-read into anonymous memory (~minutes at hg38 scale).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from lariat_tpu.index.fmindex import FMIndex  # noqa: E402


def main(argv=None) -> int:
    prefix = (argv or sys.argv[1:])[0]
    t0 = time.time()
    fm = FMIndex.load(prefix)
    print(f"load npz (+occ if missing): {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    fm.save_dir(prefix)
    print(f"save dir: {time.time() - t0:.0f}s -> {prefix}.lariat.d", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
