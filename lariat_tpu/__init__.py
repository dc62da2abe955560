"""lariat_tpu: a TPU-native linked-read aligner.

A from-scratch rebuild of the capabilities of 10XGenomics/lariat (BWA-MEM
candidate generation + RFA read-cloud inference) designed for TPU hardware:
JAX/XLA/Pallas compute kernels, pjit/shard_map barcode data-parallelism, and a
host pipeline for I/O and BAM emission.
"""

__version__ = "0.1.0"

import os as _os

# The TPU-tunnel PJRT plugin has registered its platform under different
# names across environment updates ("axon", then plain "tpu"). A pinned
# JAX_PLATFORMS naming a backend that is no longer registered makes every
# jax backend lookup raise; clear stale pins and let jax auto-pick from
# what is actually registered (explicit "cpu"/"tpu" pins are honored).
_plat = _os.environ.get("JAX_PLATFORMS", "")
_STALE = {"axon"}  # names the tunnel plugin has retired
if _plat and set(_plat.split(",")) & _STALE:
    _os.environ["JAX_PLATFORMS"] = ",".join(
        p for p in _plat.split(",") if p not in _STALE)
    import sys as _sys
    print(f"lariat_tpu: cleared stale JAX_PLATFORMS entries {_STALE & set(_plat.split(','))} "
          f"(plugin now registers as 'tpu')", file=_sys.stderr)
    del _sys
del _os, _plat, _STALE
