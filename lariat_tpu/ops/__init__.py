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
