"""Per-kernel speed-of-light accounting on the real chip (VERDICT r2 #5).

Measures the three DP wave kernels (banded extend, banded global, local
two-pass) and the FM rank primitive at their production tier shapes, and
reports %SOL against an explicit v5e roofline model:

 - VPU peak: the TPU v5e TensorCore VPU is an (8, 128) vector unit with 4
   independent ALUs (jax-ml.github.io/scaling-book): 8*128*4 = 4096 int32
   lanes/cycle at ~1.6 GHz => ~6.6e12 int32 op/s. The DP kernels are pure
   VPU int32 work (adds/max/select) — the MXU is idle by design, DP has no
   matmul shape.
 - HBM roofline for rank lookups: ~8.1e11 B/s (v5e HBM BW); each occ
   lookup touches one 64 B checkpoint block, so lookups/s caps at
   BW / 64 (random access makes the realistic cap far lower).

ops_per_cell: int32 VPU ops per DP cell counted from the kernel inner
loops (document, not measurement): extend ~34 (H/E/F updates, zdrop
bookkeeping, masks), global ~22 (+direction-byte packing), local ~30
(two passes amortized into the per-cell figure of the fused kernel).

Usage:  python tools/kernel_roofline.py            (prints one JSON line)
NOTE: needs the TPU; run while no other tunnel client is live.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

VPU_INT32_PEAK = 4096 * 1.6e9          # ops/s (model above)
HBM_BW = 8.1e11                        # B/s


def _sync(out):
    """Force completion via a 1-element download: the axon tunnel backend's
    block_until_ready is a no-op (measured: 75 ms kernels "complete" in
    0.1 ms), so only a data fetch truly synchronizes."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def _time_fn(fn, iters=5):
    """On-chip THROUGHPUT per call: time ``iters`` back-to-back dispatches
    with one end sync, minus the measured sync floor (the 1-element
    download latency). Inputs must already be device-resident — a numpy
    arg re-uploads per call and times the TUNNEL, which is how BENCH_r04
    got 0.0% SOL artifacts."""
    out = fn()
    _sync(out)            # warm/compile
    t0 = time.time()
    _sync(out)            # pure download latency on a finished array
    floor = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return max((time.time() - t0) - floor, 1e-6) / iters


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import os
    import threading
    # backend init can hang indefinitely when the TPU tunnel terminal is
    # unreachable; probe with a bounded daemon thread and fail fast
    box = {}

    def _probe():
        try:
            import jax as _jax
            box["ok"] = str(_jax.devices()[0])
        except Exception as e:  # noqa: BLE001
            box["err"] = str(e)[:200]

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout=float(os.environ.get("LARIAT_DEVICE_PROBE_TIMEOUT",
                                         "150")))
    if th.is_alive() or "err" in box:
        print(json.dumps({"error": box.get(
            "err", "device backend init timed out (tunnel unreachable)")}))
        os._exit(1)
    import jax

    from lariat_tpu.align import ksw
    from lariat_tpu.ops import sw_extend_pallas, sw_global_pallas
    from lariat_tpu.ops import sw_local_pallas

    rng = np.random.default_rng(5)
    mat = np.asarray(ksw.fill_score_matrix(1, 4))
    out = {"device": str(jax.devices()[0]),
           "model": {"vpu_int32_peak_ops_s": VPU_INT32_PEAK,
                     "hbm_bw_B_s": HBM_BW}}

    # ---- banded extend (production tier 8192 x 192q x 576t) --------------
    B, Lq, Lt = 8192, 192, 576
    q = jax.device_put(rng.integers(0, 4, (B, Lq)).astype(np.int32))
    t = jax.device_put(rng.integers(0, 4, (B, Lt)).astype(np.int32))
    qlen = jax.device_put(np.full(B, 151, np.int32))
    tlen = jax.device_put(np.full(B, 400, np.int32))
    w = jax.device_put(np.full(B, 100, np.int32))
    h0 = jax.device_put(np.full(B, 30, np.int32))

    def run_ext():
        return sw_extend_pallas.extend_batch_pallas(
            q, qlen, t, tlen, mat, w, h0, o_del=6, e_del=1, o_ins=6,
            e_ins=1, end_bonus=5, zdrop=100, match_sc=1, mismatch_sc=-4,
            packed=True)

    dt = _time_fn(run_ext)
    cells = float(B) * Lq * Lt
    ops = 34.0
    eff = cells * ops / dt
    out["extend"] = {
        "ms": round(dt * 1e3, 2), "padded_cells_per_s": round(cells / dt),
        "ops_per_cell": ops, "eff_int32_ops_s": round(eff),
        "sol_pct": round(100 * eff / VPU_INT32_PEAK, 1),
        "useful_cell_frac": round(151 * 201 / (Lq * Lt), 3)}

    # ---- banded global + device traceback at the PRODUCTION r2a tier
    # (2048 x 192q x 192t — the CLI's reg2aln waves; the old 576t tier
    # overstated the traceback walk 2x and belonged to no real wave) ------
    Bg = 2048
    qg = jax.device_put(rng.integers(0, 4, (Bg, 192)).astype(np.int32))
    tg = jax.device_put(rng.integers(0, 4, (Bg, 192)).astype(np.int32))
    qlg = jax.device_put(np.full(Bg, 151, np.int32))
    tlg = jax.device_put(np.full(Bg, 160, np.int32))
    wg = jax.device_put(np.full(Bg, 20, np.int32))
    S = 192 + 192

    # PRODUCTION config (batch_engine.py:1026-1033): plain DP + unpacked-z
    # device walk. NOT global_batch_pallas_packed — its _pack_band gather
    # costs ~10x the DP and no shipped path runs it (the r4 0.1% SOL was
    # this dead config).
    def run_glob_dp():
        return sw_global_pallas.global_batch_pallas(
            qg, qlg, tg, tlg, mat, wg, match_sc=1, mismatch_sc=-4,
            o_del=6, e_del=1, o_ins=6, e_ins=1)

    res_g = run_glob_dp()

    def run_tb():
        return sw_global_pallas.traceback_ops_fused(
            res_g.z, qlg, tlg, wg, res_g.score, S=S, packed_layout=False)

    def run_glob():
        res = run_glob_dp()
        return sw_global_pallas.traceback_ops_fused(
            res.z, qlg, tlg, wg, res.score, S=S, packed_layout=False)

    dt_dp = _time_fn(run_glob_dp)
    dt_tb = _time_fn(run_tb)
    dt = _time_fn(run_glob)
    cells = float(Bg) * 192 * 192
    ops = 22.0
    eff = cells * ops / dt_dp
    out["global_tb"] = {
        "ms": round(dt * 1e3, 2), "dp_ms": round(dt_dp * 1e3, 2),
        "traceback_ms": round(dt_tb * 1e3, 2),
        "padded_cells_per_s": round(cells / dt_dp),
        "ops_per_cell": ops, "eff_int32_ops_s": round(eff),
        "sol_pct": round(100 * eff / VPU_INT32_PEAK, 1),
        "dl_bytes_per_wave": Bg * (S // 4 + 12)}

    # ---- local two-pass (rescue tier 2048 x 192q x 704t) -----------------
    Bl = 2048
    ql = jax.device_put(rng.integers(0, 4, (Bl, 192)).astype(np.uint8))
    tl = jax.device_put(rng.integers(0, 4, (Bl, 704)).astype(np.uint8))
    qll = jax.device_put(np.full(Bl, 151, np.int32))
    tll = jax.device_put(np.full(Bl, 686, np.int32))
    minsc = jax.device_put(np.full(Bl, 19, np.int32))

    def run_loc():
        return sw_local_pallas.local_two_pass_pallas(
            ql, qll, tl, tll, minsc, o_del=6, e_del=1, o_ins=6, e_ins=1,
            match_sc=1, mismatch_sc=-4, n_sc=-1)

    dt = _time_fn(run_loc)
    cells = 2.0 * Bl * 192 * 704          # two passes
    ops = 30.0
    eff = cells * ops / dt
    out["local_2pass"] = {
        "ms": round(dt * 1e3, 2), "padded_cells_per_s": round(cells / dt),
        "ops_per_cell": ops, "eff_int32_ops_s": round(eff),
        "sol_pct": round(100 * eff / VPU_INT32_PEAK, 1)}

    # ---- FM rank primitive (occ1 over random k) + real SMEM seeding ------
    try:
        from lariat_tpu.index import fmindex
        from lariat_tpu.ops import fm_batch
        import tempfile
        g = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, 1 << 20)]
        with tempfile.NamedTemporaryFile("w", suffix=".fa",
                                         delete=False) as f:
            s = g.tobytes().decode()
            f.write(">c\n")
            for i in range(0, len(s), 70):
                f.write(s[i:i + 70] + "\n")
            path = f.name
        fm = fmindex.build_index(path)
        dfm = fm_batch.DeviceFMIndex.from_host(fm)
        Bk = 1 << 16
        ks = rng.integers(0, fm.seq_len, Bk)
        cs = rng.integers(0, 4, Bk).astype(np.int32)
        import jax.numpy as jnp
        kd = jnp.asarray(ks)
        cd = jnp.asarray(cs)

        def run_rank():
            return fm_batch.occ1_batch(dfm, kd, cd)

        dt = _time_fn(run_rank)
        bytes_touched = Bk * 64.0
        out["fm_rank"] = {
            "ms": round(dt * 1e3, 3),
            "lookups_per_s": round(Bk / dt),
            "bytes_per_s": round(bytes_touched / dt),
            "hbm_roofline_pct": round(
                100 * (bytes_touched / dt) / HBM_BW, 2)}

        # real 3-round SMEM seeding on device (VERDICT r2 #3: the bench
        # device numbers include production seeding, not a toy)
        from lariat_tpu.config import AlignerConfig
        from lariat_tpu.ops import smem_device
        from lariat_tpu.parallel.align_step import DeviceGenome
        opt = AlignerConfig()
        dg = jax.device_put(DeviceGenome.from_host(fm))
        Rr, Lr = 2048, 151
        codes = fm.get_seq_codes(0, fm.l_pac)
        seeds_reads = []
        for i in range(Rr):
            p = int(rng.integers(0, fm.l_pac - Lr))
            seg = codes[p:p + Lr].copy()
            seg[int(rng.integers(0, Lr))] = (seg[0] + 1) % 4
            seeds_reads.append(seg)
        t0 = time.time()
        mems, rbegs = smem_device.collect_seeds_rbegs_device(
            dfm, dg, fm, seeds_reads, opt)
        warm = time.time() - t0
        t0 = time.time()
        mems, rbegs = smem_device.collect_seeds_rbegs_device(
            dfm, dg, fm, seeds_reads, opt)
        dt = time.time() - t0
        out["smem_seed"] = {
            "reads": Rr, "ms": round(dt * 1e3, 1),
            "reads_per_s": round(Rr / dt),
            "first_run_ms": round(warm * 1e3, 1),
            "mems_total": int(sum(len(m) for m in mems)),
            "rbegs_total": int(sum(len(r) for r in rbegs))}
    except Exception as e:
        out["fm_rank"] = {"error": str(e)[:200]}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
