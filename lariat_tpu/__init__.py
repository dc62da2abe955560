"""lariat_tpu: a TPU-native linked-read aligner.

A from-scratch rebuild of the capabilities of 10XGenomics/lariat (BWA-MEM
candidate generation + RFA read-cloud inference) designed for TPU hardware:
JAX/XLA/Pallas compute kernels, pjit/shard_map barcode data-parallelism, and a
host pipeline for I/O and BAM emission.
"""

__version__ = "0.1.0"

import os as _os

# The TPU-tunnel plugin registers its platform as "axon" and the environment
# pins JAX_PLATFORMS=axon deliberately (a swallowed plugin-registration
# failure then raises loudly instead of silently falling back to CPU). The
# pin is only stale — and would make every jax backend lookup raise — when
# the plugin package itself is gone; clear it exactly then.
_plat = _os.environ.get("JAX_PLATFORMS", "")
if "axon" in _plat.split(","):
    import importlib.util as _ilu
    if _ilu.find_spec("axon") is None:
        _os.environ["JAX_PLATFORMS"] = ",".join(
            p for p in _plat.split(",") if p != "axon")
        import sys as _sys
        print("lariat_tpu: cleared JAX_PLATFORMS 'axon' pin (plugin package "
              "not installed)", file=_sys.stderr)
        del _sys
    del _ilu

# The TPU-tunnel relay forwards raw TCP only; libtpu's metadata queries for
# accelerator type / worker hostnames fail intermittently and abort client
# init ("Failed to find host bounds for accelerator type"). When the tunnel
# environment marker is present, pin the single-chip answers libtpu would
# have discovered so client init is deterministic. Explicit (sane) user
# values win; values that captured a metadata-query warning string are
# replaced.
_gen = _os.environ.get("PALLAS_AXON_TPU_GEN")
if _gen:
    for _var, _good in (
            ("TPU_ACCELERATOR_TYPE", {"v5e": "v5litepod-1"}.get(_gen, _gen)),
            ("TPU_WORKER_HOSTNAMES", "localhost")):
        _val = _os.environ.get(_var)
        if not _val or " " in _val:  # unset, or a captured warning message
            _os.environ[_var] = _good
    del _var, _good, _val
del _os, _plat, _gen
