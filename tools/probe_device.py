"""Bisection probe for device-path latency on the real chip.

Prints progressive JSON lines (flushed) so a watcher can follow along:
  - tunnel RPC latency (trivial jit dispatch+sync)
  - device->host transfer bandwidth
  - Pallas extend kernel at 1 chunk / 8 chunks (per-chunk + per-row-step cost)
  - XLA extend_batch at full wave width (is the lane-wide scan faster?)

Usage: python tools/probe_device.py
NOTE: needs the TPU; run while no other tunnel client is live.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def timeit(fn, iters=3):
    """(first_call_s, per_call_s). first_call_s = compile + one execution
    (not compile alone). Blocks every iteration so async dispatch cannot
    pipeline the loop and understate per-call latency (ADVICE r4)."""
    t0 = time.time()
    jax_block(fn())
    first_call_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        jax_block(fn())
    return first_call_s, (time.time() - t0) / iters


def jax_block(out):
    import jax
    jax.block_until_ready(out)


def main():
    import jax
    import jax.numpy as jnp

    emit("device", dev=str(jax.devices()[0]))

    # --- RPC latency: trivial jit ---
    x = jnp.arange(1024, dtype=jnp.int32)
    f = jax.jit(lambda v: v + 1)
    c, dt = timeit(lambda: f(x), iters=10)
    emit("rpc_trivial", compile_s=round(c, 2), per_call_ms=round(dt * 1e3, 2))

    # --- transfer bandwidth: download 8 MB ---
    big = jnp.zeros((2 * 1024 * 1024,), jnp.int32) + 7
    jax_block(big)
    t0 = time.time()
    _ = np.asarray(big)
    dl = time.time() - t0
    emit("download_8MB", s=round(dl, 3), MB_s=round(8 / max(dl, 1e-9), 1))
    t0 = time.time()
    _ = jax.device_put(np.zeros((2 * 1024 * 1024,), np.int32))
    jax_block(_)
    ul = time.time() - t0
    emit("upload_8MB", s=round(ul, 3), MB_s=round(8 / max(ul, 1e-9), 1))

    from lariat_tpu.align import ksw
    from lariat_tpu.ops import sw_batch, sw_extend_pallas

    rng = np.random.default_rng(5)
    mat = np.asarray(ksw.fill_score_matrix(1, 4))
    Lq, Lt = 192, 576

    def mk(B):
        q = rng.integers(0, 4, (B, Lq)).astype(np.int32)
        t = rng.integers(0, 4, (B, Lt)).astype(np.int32)
        qlen = np.full(B, 151, np.int32)
        tlen = np.full(B, 400, np.int32)
        w = np.full(B, 100, np.int32)
        h0 = np.full(B, 30, np.int32)
        return q, qlen, t, tlen, w, h0

    # --- Pallas extend: 1 chunk (128 lanes) ---
    q, qlen, t, tlen, w, h0 = mk(128)
    c, dt = timeit(lambda: sw_extend_pallas.extend_batch_pallas(
        q, qlen, t, tlen, mat, w, h0, packed=True))
    emit("pallas_extend_B128", compile_s=round(c, 1),
         per_call_ms=round(dt * 1e3, 1),
         per_row_step_us=round(dt / Lt * 1e6, 1))

    # --- Pallas extend: 8 chunks (1024 lanes) ---
    q, qlen, t, tlen, w, h0 = mk(1024)
    c, dt = timeit(lambda: sw_extend_pallas.extend_batch_pallas(
        q, qlen, t, tlen, mat, w, h0, packed=True))
    emit("pallas_extend_B1024", compile_s=round(c, 1),
         per_call_ms=round(dt * 1e3, 1),
         per_chunk_ms=round(dt / 8 * 1e3, 1))

    # --- XLA extend: 1024 and 8192 lanes ---
    for B in (1024, 8192):
        q, qlen, t, tlen, w, h0 = mk(B)
        c, dt = timeit(lambda: sw_batch.extend_batch(
            q, qlen, t, tlen, mat, w, h0, packed=True))
        cells = B * 151 * 400
        emit(f"xla_extend_B{B}", compile_s=round(c, 1),
             per_call_ms=round(dt * 1e3, 1),
             useful_cells_per_s=round(cells / dt))


if __name__ == "__main__":
    main()
