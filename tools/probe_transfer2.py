"""Large-transfer cliff probe: does d2h degrade beyond some size?"""
from __future__ import annotations

import concurrent.futures as cf
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

    f = jax.jit(lambda v: v + 1)

    def mk(nbytes):
        x = f(jnp.zeros((nbytes // 4,), jnp.int32))
        jax.block_until_ready(x)
        return x

    for mb in (2, 4, 8):
        x = mk(mb << 20)
        t0 = time.time()
        _ = np.asarray(x)
        dt = time.time() - t0
        emit(probe="np_asarray", MB=mb, s=round(dt, 3),
             MB_s=round(mb / max(dt, 1e-9), 2))

    # 8 MB as 8 x 1 MB buffers downloaded in parallel threads
    xs = [mk(1 << 20) for _ in range(8)]
    t0 = time.time()
    with cf.ThreadPoolExecutor(8) as ex:
        list(ex.map(np.asarray, xs))
    emit(probe="8x1MB_threads", s=round(time.time() - t0, 3))


if __name__ == "__main__":
    main()
