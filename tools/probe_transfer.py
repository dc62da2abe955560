"""Characterize device->host transfer cost over the tunnel.

Questions:
  - latency vs size (is it per-transfer RTT or bandwidth limited?)
  - np.asarray vs jax.device_get vs copy_to_host_async
  - does dtype matter (int8 vs int32)
  - do many small transfers beat one big one (or vice versa)?

Usage: python tools/probe_transfer.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    emit(dev=str(jax.devices()[0]))

    f = jax.jit(lambda v: v + 1)

    def mk(nbytes):
        x = f(jnp.zeros((nbytes // 4,), jnp.int32))
        jax.block_until_ready(x)
        return x

    for nb in (1024, 16 * 1024, 128 * 1024, 1024 * 1024):
        x = mk(nb)
        t0 = time.time()
        _ = np.asarray(x)
        dt = time.time() - t0
        # second download of the same buffer (cached?)
        t0 = time.time()
        _ = np.asarray(x)
        dt2 = time.time() - t0
        emit(probe="np_asarray", bytes=nb, s=round(dt, 3), s2=round(dt2, 3),
             MB_s=round(nb / 1e6 / max(dt, 1e-9), 2))

    x = mk(1024 * 1024)
    t0 = time.time()
    _ = jax.device_get(x)
    emit(probe="device_get", bytes=1024 * 1024,
         s=round(time.time() - t0, 3))

    # async copy overlap: start several copies first, then time only the
    # drains — shows whether copy_to_host_async actually overlaps
    # (ADVICE r4: timing async-start + drain together just re-measures
    # the synchronous path)
    try:
        xs = [mk(1024 * 1024) for _ in range(4)]
        for x in xs:
            x.copy_to_host_async()
        t0 = time.time()
        for x in xs:
            _ = np.asarray(x)
        emit(probe="async4_drain", bytes=4 * 1024 * 1024,
             s=round(time.time() - t0, 3))
    except Exception as e:
        emit(probe="async4_drain", error=str(e)[:120])

    # int8 vs int32: same element count
    g8 = jax.jit(lambda v: (v + 1).astype(jnp.int8))
    x8 = g8(jnp.zeros((1024 * 1024,), jnp.int32))
    jax.block_until_ready(x8)
    t0 = time.time()
    _ = np.asarray(x8)
    emit(probe="int8_1M_elems", bytes=1024 * 1024,
         s=round(time.time() - t0, 3))

    # 8 parallel small transfers via separate buffers + threads
    import concurrent.futures as cf
    xs = [mk(128 * 1024) for _ in range(8)]
    t0 = time.time()
    with cf.ThreadPoolExecutor(8) as ex:
        list(ex.map(np.asarray, xs))
    emit(probe="8x128KB_threads", total_bytes=8 * 128 * 1024,
         s=round(time.time() - t0, 3))
    # sequential for comparison
    xs = [mk(128 * 1024) for _ in range(8)]
    t0 = time.time()
    for x in xs:
        np.asarray(x)
    emit(probe="8x128KB_seq", total_bytes=8 * 128 * 1024,
         s=round(time.time() - t0, 3))


if __name__ == "__main__":
    main()
