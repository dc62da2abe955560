"""Vectorized GoRand/FastF64 streams must be bit-exact with scalar draws.

The tie-break PRNG (utils/gorand.py, reference inference/lariat.go:1481-1486)
feeds exact-tie decisions; any stream divergence changes picks, so the block
generators are held to bit-equality against the scalar ALFG.
"""

import numpy as np

from lariat_tpu.utils.gorand import FastF64, GoRand


def test_uint64_n_matches_scalar_mixed_chunks():
    for seed in (1, 42, 7_000_000_123, -5, 0):
        g1, g2 = GoRand(seed), GoRand(seed)
        ref = [g1.uint64() for _ in range(2600)]
        got = []
        got.extend(g2.uint64_n(3).tolist())
        got.append(g2.uint64())                 # scalar interleave
        got.extend(g2.uint64_n(700).tolist())   # crosses wrap + TAP chunks
        got.extend(g2.uint64() for _ in range(5))
        got.extend(g2.uint64_n(1891).tolist())
        assert got == ref


def test_fastf64_fallback_matches_scalar_stream():
    seeds = [99, 123456, 31337]
    rows = GoRand.batch_first_floats(seeds, k=16)
    for seed, row in zip(seeds, rows):
        f = FastF64(seed, row)
        g = GoRand(seed)
        ref = [g.float64() for _ in range(3000)]
        got = [f.float64() for _ in range(10)]          # inside the prefix
        got.extend(f.float64_n(1500).tolist())          # prefix -> fallback
        got.extend(f.float64() for _ in range(490))
        got.extend(f.float64_n(1000).tolist())
        assert got == ref


def test_fastf64_empty_prefix():
    f = FastF64(7, np.zeros(0, np.float64))
    g = GoRand(7)
    assert [f.float64() for _ in range(600)] == [g.float64()
                                                for _ in range(600)]
