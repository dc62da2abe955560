"""lariat_tpu: a TPU-native linked-read aligner.

A from-scratch rebuild of the capabilities of 10XGenomics/lariat (BWA-MEM
candidate generation + RFA read-cloud inference) designed for TPU hardware:
JAX/XLA/Pallas compute kernels, pjit/shard_map barcode data-parallelism, and a
host pipeline for I/O and BAM emission.
"""

__version__ = "0.1.0"
