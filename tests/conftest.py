"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh; real-TPU benchmarking is
done separately by bench.py.
"""

import os

# The environment pins JAX_PLATFORMS=axon (single real TPU chip behind a
# serializing tunnel); tests must run on a virtual CPU mesh instead, and the
# axon plugin overrides the env var, so force it via jax.config post-import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")
REFERENCE_INPUTS = REFERENCE_ROOT / "go" / "src" / "test" / "inputs"


@pytest.fixture(scope="session")
def reference_inputs():
    if not REFERENCE_INPUTS.exists():
        pytest.skip("reference test inputs not available")
    return REFERENCE_INPUTS


@pytest.fixture(scope="session")
def phix_fasta(reference_inputs):
    p = reference_inputs / "phix" / "PhiX.fa"
    if not p.exists():
        pytest.skip("PhiX fixture not available")
    return p
