"""Device (JAX/XLA/Pallas) compute kernels.

Importing this package enables jax x64 mode: FM-index row indices over a
whole-genome FMD text (hg38 doubled = 6.2e9 rows) exceed int32. The SW
kernels pin int32 explicitly and are unaffected. A per-shard int32 coordinate
scheme (chromosome-group index sharding) is the planned optimization for
TPU-native 32-bit arithmetic.
"""

import sys

import jax

jax.config.update("jax_enable_x64", True)
# Mosaic/Pallas lowering of long fori_loop kernels recurses deeply
sys.setrecursionlimit(max(sys.getrecursionlimit(), 100_000))

# Persistent compilation cache: kernel compiles (expensive over the remote
# TPU compile service) survive process restarts.
import os as _os

_cache_dir = _os.path.join(_os.path.expanduser("~"), ".cache",
                           "lariat_tpu_jax")
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
