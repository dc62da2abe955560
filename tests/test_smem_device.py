"""Device 3-round SMEM enumeration vs the native C++ (bit-for-bit)."""

import numpy as np
import pytest

from lariat_tpu.align.engine import AlignmentEngine, encode_read
from lariat_tpu.config import AlignerConfig
from lariat_tpu.index import native_ops
from lariat_tpu.ops import fm_batch, smem_device

from test_rfa import dup_genome  # noqa: F401


def _messy_reads(genome: bytes, rng, n=60):
    """Clean, mutated, reversed, N-riddled, short and long reads."""
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    out = []
    for i in range(n):
        ln = int(rng.integers(15, 152))
        pos = int(rng.integers(0, len(genome) - ln))
        seg = bytearray(genome[pos:pos + ln])
        nmut = int(rng.integers(0, 6))
        for _ in range(nmut):
            p = int(rng.integers(0, ln))
            seg[p] = b"ACGTN"[int(rng.integers(0, 5))]
        if rng.integers(0, 2):
            seg = bytearray(bytes(seg).translate(comp)[::-1])
        out.append(encode_read(bytes(seg)))
    # degenerate cases
    out.append(encode_read(b"ACGT"))
    out.append(encode_read(b"N" * 30))
    out.append(encode_read(b"ACGTN" * 25))
    return out


def test_collect_seeds_device_matches_native(dup_genome):  # noqa: F811
    fm, genome = dup_genome
    opt = AlignerConfig()
    rng = np.random.default_rng(77)
    reads = _messy_reads(genome, rng)
    want = native_ops.collect_seeds_rbegs_batch(fm, reads, opt)
    if want is None:
        pytest.skip("native seeding unavailable")
    mems_native, _rbegs = want
    dfm = fm_batch.DeviceFMIndex.from_host(fm)
    got = smem_device.collect_seeds_device(dfm, fm, reads, opt)
    assert len(got) == len(mems_native)
    for i, (g, w) in enumerate(zip(got, mems_native)):
        w_rows = [tuple(int(v) for v in row) for row in np.asarray(w)]
        assert g == w_rows, (
            f"read {i}: device {g[:6]}... vs native {w_rows[:6]}...")


def test_collect_seeds_device_segdup_heavy(dup_genome):  # noqa: F811
    """Reads inside the duplicated segment (multi-occurrence seeds, round-2
    re-seeding fires) must match too."""
    fm, genome = dup_genome
    opt = AlignerConfig()
    rng = np.random.default_rng(78)
    reads = []
    for i in range(30):
        pos = 2000 + int(rng.integers(0, 900))
        ln = int(rng.integers(60, 152))
        reads.append(encode_read(genome[pos:pos + ln]))
    want = native_ops.collect_seeds_rbegs_batch(fm, reads, opt)
    if want is None:
        pytest.skip("native seeding unavailable")
    mems_native, _ = want
    dfm = fm_batch.DeviceFMIndex.from_host(fm)
    got = smem_device.collect_seeds_device(dfm, fm, reads, opt)
    for i, (g, w) in enumerate(zip(got, mems_native)):
        w_rows = [tuple(int(v) for v in row) for row in np.asarray(w)]
        assert g == w_rows, f"read {i}"


def test_collect_seeds_rbegs_device_matches_native(dup_genome):  # noqa: F811
    """Full device seeding incl. SA-walked rbegs == native, bit-for-bit."""
    from lariat_tpu.parallel.align_step import DeviceGenome
    fm, genome = dup_genome
    opt = AlignerConfig()
    rng = np.random.default_rng(79)
    reads = _messy_reads(genome, rng, n=40)
    want = native_ops.collect_seeds_rbegs_batch(fm, reads, opt)
    if want is None:
        pytest.skip("native seeding unavailable")
    w_mems, w_rbegs = want
    dfm = fm_batch.DeviceFMIndex.from_host(fm)
    dg = DeviceGenome.from_host(fm)
    g_mems, g_rbegs = __import__(
        "lariat_tpu.ops.smem_device", fromlist=["x"]
    ).collect_seeds_rbegs_device(dfm, dg, fm, reads, opt)
    for i in range(len(reads)):
        np.testing.assert_array_equal(
            g_mems[i], np.asarray(w_mems[i]).reshape(-1, 5), err_msg=str(i))
        np.testing.assert_array_equal(g_rbegs[i], w_rbegs[i],
                                      err_msg=str(i))


def test_align_batch_with_device_seed(dup_genome, monkeypatch):  # noqa: F811
    """The full session path with LARIAT_DEVICE_SEED=1 produces identical
    candidate regions to the host-seeded path."""
    from lariat_tpu.align.batch_engine import BatchAlignmentEngine
    fm, genome = dup_genome
    rng = np.random.default_rng(80)
    seqs = []
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    for i in range(25):
        ln = int(rng.integers(40, 152))
        pos = int(rng.integers(0, len(genome) - ln))
        seg = bytearray(genome[pos:pos + ln])
        for _ in range(int(rng.integers(0, 4))):
            seg[int(rng.integers(0, ln))] = b"ACGT"[int(rng.integers(0, 4))]
        if rng.integers(0, 2):
            seg = bytearray(bytes(seg).translate(comp)[::-1])
        seqs.append(bytes(seg))
    eng = BatchAlignmentEngine(fm, use_pallas=False)
    host_regs = eng.align_batch(seqs)
    monkeypatch.setenv("LARIAT_DEVICE_SEED", "1")
    eng2 = BatchAlignmentEngine(fm, use_pallas=False)
    dev_regs = eng2.align_batch(seqs)
    assert host_regs == dev_regs
