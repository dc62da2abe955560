"""Opt-in real-accelerator kernel CI (RUN_TPU=1): the Pallas extend/global
kernels must be bit-identical to the host references ON THE CHIP, not just in
interpret mode (VERDICT r1 item 8; the reference's analog is its C tests
running the real library, SURVEY.md section 4).

Spawned as a subprocess so conftest's CPU forcing doesn't apply and so this
test is the machine's only TPU client while it runs.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(os.environ.get("RUN_TPU") != "1",
                    reason="needs the real chip; opt in with RUN_TPU=1 "
                           "(one TPU client at a time on this machine)")
def test_pallas_kernels_on_chip():
    env = dict(os.environ)
    # undo conftest's CPU forcing for the child
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    env["PYTHONPATH"] = "/root/repo" + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    r = subprocess.run(
        [sys.executable, "tools/tpu_kernel_check.py"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=900)
    sys.stdout.write(r.stdout)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "TPU_KERNELS_OK" in r.stdout
