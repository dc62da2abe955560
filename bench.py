"""Benchmark: end-to-end pipeline throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (VERDICT r1 item 2): REAL full-pipeline throughput — the
shipped CLI (FASTQ -> candidates -> mate rescue -> RFA -> BAM) over 160
molecule-structured barcodes at a realistic ``sa_intv=32``, best of the
host-native and device-primed configurations, in read pairs aligned per
second per chip. The single-seed device candidate step that was round 1's
headline lives in ``detail`` now.

vs_baseline compares against 10,000 read pairs/s — a rough figure for the
single-node reference (Go + BWA C API, 8 threads) on commodity CPUs; the
reference repo publishes no numbers (BASELINE.md) and its native submodules
are not buildable here, so this stands in for the "single-node Go+BWA"
denominator of the >=10x north-star target.

Order matters: the CLI subprocesses run BEFORE this process touches jax —
the axon TPU tunnel serializes clients and two live clients deadlock.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

BASELINE_PAIRS_PER_S = 10_000.0
REPO = os.path.dirname(os.path.abspath(__file__))
N_BARCODES = 320
PAIRS_PER_BC = 100


def _prepare_inputs(workdir: str) -> tuple[str, str, float]:
    """Synth genome + sa_intv=32 index (.lariat.d) + simulated linked reads."""
    from lariat_tpu.index import fmindex

    rng = np.random.default_rng(12)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    glen = 4_600_000
    g = bases[rng.integers(0, 4, glen)].copy()
    # plant segdups so second-best hits / molecule moves are exercised
    g[1_000_000:1_010_000] = g[3_000_000:3_010_000]
    fa = os.path.join(workdir, "g.fa")
    with open(fa, "w") as f:
        s = g.tobytes().decode()
        f.write(">chrE\n")
        step = 1 << 16
        for i in range(0, len(s), step):
            f.write(s[i:i + step] + "\n")
    t0 = time.time()
    fm = fmindex.build_index(fa, sa_intv=32)
    fm.save_dir(fa)  # CLI subprocesses mmap it (instant load)
    t_index = time.time() - t0

    reads = os.path.join(workdir, "reads.fastq.gz")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/sim_reads.py"), fa, reads,
         "--barcodes", str(N_BARCODES), "--pairs-per-bc", str(PAIRS_PER_BC),
         "--molecule-len", "40000"],
        check=True, env={**os.environ, "PYTHONPATH": REPO + (
             ":" + os.environ["PYTHONPATH"]
             if os.environ.get("PYTHONPATH") else "")},
        stdout=subprocess.DEVNULL)
    return fa, reads, t_index


_RATE_RE = re.compile(r"Processed (\d+) read pairs across (\d+) barcodes "
                      r"in ([0-9.]+)s \(([0-9.]+) pairs/s\)")
_BUSY_RE = re.compile(r"device waves: (\d+)\s+wave wall ([0-9.]+)s\s+"
                      r"busy fraction ([0-9.]+)(?:\s+primed pairs (\d+)\s+"
                      r"host pairs (\d+))?")
_TIE_RE = re.compile(r"tie-sensitive picks: (\d+)/(\d+) \(([0-9.]+)\)")


def _run_cli(fa: str, reads: str, outdir: str, use_device: str,
             extra=(), threads: int = 5, timeout_s: float = 900) -> dict:
    """One CLI invocation; returns {pairs_s, wall_s, pairs} or {error}.

    Bounded: a wedged TPU tunnel can hang a device run indefinitely, and
    one hung run must never eat the whole bench (VERDICT r4 item 8)."""
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "lariat_tpu.cli", "-reads", reads,
             "-genome", fa, "-output", outdir, "-threads", str(threads),
             "-use_device", use_device, *extra],
            env={**os.environ, "PYTHONPATH": REPO + (
                 ":" + os.environ["PYTHONPATH"]
                 if os.environ.get("PYTHONPATH") else "")},
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout_s:.0f}s "
                         "(tunnel wedged?)"}
    wall = time.time() - t0
    m = _RATE_RE.search(proc.stdout)
    if proc.returncode != 0 or not m:
        return {"error": (proc.stderr or proc.stdout)[-400:]}
    out = {"pairs_s": float(m.group(4)), "steady_s": float(m.group(3)),
           "wall_s": round(wall, 1), "pairs": int(m.group(1)),
           "startup_s": round(wall - float(m.group(3)), 1)}
    b = _BUSY_RE.search(proc.stdout)
    if b:
        out["device_waves"] = int(b.group(1))
        out["device_wave_wall_s"] = float(b.group(2))
        out["device_busy_frac"] = float(b.group(3))
        if b.group(4) is not None:
            out["primed_pairs"] = int(b.group(4))
            out["host_pairs"] = int(b.group(5))
    tie = _TIE_RE.search(proc.stdout)
    if tie:
        out["tie_sensitive_rate"] = float(tie.group(3))
        out["tie_sensitive_picks"] = [int(tie.group(1)), int(tie.group(2))]
    rfa = re.search(r"rfa wall: ([0-9.]+)s across workers \(rows: (\w+)\)",
                    proc.stdout)
    if rfa:
        out["rfa_wall_s"] = float(rfa.group(1))
        out["rfa_rows"] = rfa.group(2)
    return out


def _device_available(timeout_s: float = 150.0) -> bool:
    """One bounded probe: can the (possibly remote-tunnel) device backend
    initialize at all? Avoids paying a probe timeout per device run when
    the tunnel terminal is unreachable."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import lariat_tpu, jax\n"
        "print('BACKEND', jax.default_backend())\n" % REPO)
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           env={**os.environ, "PYTHONPATH": REPO + (
                                ":" + os.environ["PYTHONPATH"]
                                if os.environ.get("PYTHONPATH") else "")},
                           capture_output=True, text=True,
                           timeout=timeout_s)
        for line in p.stdout.splitlines():
            if line.startswith("BACKEND"):
                return line.split()[1] != "cpu"
    except subprocess.TimeoutExpired:
        pass
    return False


def _start_device_server(genome: str, timeout_s: float = 1500.0):
    """Spawn the resident priming server (parallel/device_server.py) and
    wait for its ready file. The server holds the tunnel warmup, the
    uploaded index, and warm kernel compiles ACROSS the CLI runs — the
    per-process first-transfer stall (10-60 s measured) otherwise eats
    entire bench runs before the device can contribute. Returns
    (proc, socket_path) or None when the device/tunnel is unusable
    (callers fall back to direct per-run device init)."""
    import tempfile as _tf
    sock = os.path.join(_tf.mkdtemp(prefix="lariat_srv_"), "dev.sock")
    ready = sock + ".ready"
    try:
        proc = subprocess.Popen(
            [sys.executable, "-m", "lariat_tpu.parallel.device_server",
             "-genome", genome, "-socket", sock, "-ready_file", ready,
             "-idle_timeout", "3600"],
            env={**os.environ, "PYTHONPATH": REPO + (
                 ":" + os.environ["PYTHONPATH"]
                 if os.environ.get("PYTHONPATH") else "")},
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except OSError:
        return None
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if os.path.exists(ready):
            return proc, sock
        if proc.poll() is not None:
            return None
        time.sleep(0.5)
    proc.kill()
    return None


def _median_of(runs: list) -> dict:
    """Median-by-pairs_s run dict (VERDICT r2 item 7: median of >=3 warm
    runs is the reported number; the run list stays in detail)."""
    if not runs:
        return {"error": "no runs"}
    ok = sorted((r for r in runs if "pairs_s" in r),
                key=lambda r: r["pairs_s"])
    if not ok:
        return runs[-1]
    return ok[len(ok) // 2]


HG38_DIR = os.path.join(REPO, "data_big")


def _hg38_runs(workdir: str, have_device: bool) -> dict:
    """Full-genome (3.09 Gbp simulated hg38) CLI runs, host vs device.

    This is BASELINE.md's own regime ("read pairs aligned/sec/chip, hg38,
    barcode-sorted 10X reads"). Per mode: one warmup run (mmap page faults
    + compile cache), then 3 measured runs; the MEDIAN is the reported
    number and the full run list stays in detail.
    """
    fa = os.path.join(HG38_DIR, "hg38sim.fa")
    reads = os.path.join(HG38_DIR, "sim200k.fastq.gz")
    for fall in ("sim50k.fastq.gz", "sim10k.fastq.gz"):
        if not os.path.exists(reads):
            reads = os.path.join(HG38_DIR, fall)
    cents = os.path.join(HG38_DIR, "hg38sim.centromeres.tsv")
    if not os.path.isdir(fa + ".lariat.d") or not os.path.exists(reads):
        # the hg38-scale inputs are gitignored (too big to track) and a
        # workspace reset wipes them; REGENERATE rather than silently
        # benching the toy genome (VERDICT r4 item 1). ~90 min, ~124 GB
        # peak RSS. Opt out with LARIAT_BENCH_NO_GEN=1 (keeps the loud
        # skip marker).
        if os.environ.get("LARIAT_BENCH_NO_GEN"):
            return {"hg38_skipped": "data_big/ missing and "
                                    "LARIAT_BENCH_NO_GEN=1"}
        print("data_big/ missing; regenerating (~90 min)...",
              file=sys.stderr, flush=True)
        try:
            subprocess.run(
                [sys.executable, os.path.join(REPO, "tools/gen_data_big.py")],
                check=True, cwd=REPO, stdout=sys.stderr,
                timeout=float(os.environ.get("LARIAT_BENCH_GEN_TIMEOUT",
                                             "10800")))
        except Exception as e:  # noqa: BLE001
            return {"hg38_skipped": f"data_big regeneration failed: "
                                    f"{str(e)[:200]}"}
        if not os.path.exists(reads):
            reads = os.path.join(HG38_DIR, "sim10k.fastq.gz")
        if not os.path.isdir(fa + ".lariat.d") or not os.path.exists(reads):
            return {"hg38_skipped": "regeneration completed but inputs "
                                    "still absent"}
    out = {}
    extra = ("-centromeres", cents) if os.path.exists(cents) else ()
    out["device_available"] = have_device
    for mode in (("off", "on") if have_device else ("off",)):
        srv = None
        if mode == "on":
            srv = _start_device_server(fa)
            out["device_server"] = bool(srv)
            if srv:
                os.environ["LARIAT_DEVICE_SOCKET"] = srv[1]
        try:
            runs = []
            errs = 0
            for i in range(4):   # run 0 = warmup, 1..3 measured
                r = _run_cli(fa, reads, os.path.join(
                    workdir, f"hg38_{mode}{i}"), mode, extra, threads=8,
                    timeout_s=1200 if (mode == "on" and i == 0) else 900)
                runs.append(r)
                errs = errs + 1 if "error" in r else 0
                if errs >= 2:
                    break        # tunnel dead: stop burning bench budget
        finally:
            if srv:
                os.environ.pop("LARIAT_DEVICE_SOCKET", None)
                srv[0].kill()
                srv[0].wait()
        key = "hg38_host_8w" if mode == "off" else "hg38_device_8w"
        out[key] = _median_of(runs[1:])
        out[key + "_runs"] = [r.get("pairs_s", 0.0) for r in runs]
    # BASELINE config 2 analog: chr20-scale genome, 1M pairs, one run
    # (device-primed when available; too long to triplicate)
    c20 = os.path.join(HG38_DIR, "chr20sim.fa")
    c20_reads = os.path.join(HG38_DIR, "sim1m_chr20.fastq.gz")
    if os.path.isdir(c20 + ".lariat.d") and os.path.exists(c20_reads):
        out["chr20_1m"] = _run_cli(
            c20, c20_reads, os.path.join(workdir, "chr20"),
            "on" if have_device else "off", timeout_s=2400)
    return out


def _device_step_detail(fa: str) -> dict:
    """Single-chip device step detail — REAL round-1 SMEM seeding (the
    production enumeration kernel), SA walk, fetch, banded extension."""
    import jax

    from lariat_tpu.align import ksw
    from lariat_tpu.index import fmindex
    from lariat_tpu.parallel.align_step import (DeviceGenome,
                                                align_step_smem as
                                                align_step)

    fm = fmindex.FMIndex.load(fa)
    rng = np.random.default_rng(7)
    codes = fm.get_seq_codes(0, fm.l_pac).copy()
    B, L = 8192, 151
    starts = rng.integers(0, fm.l_pac - L, B)
    reads = np.zeros((B, L), np.uint8)
    for i, pos in enumerate(starts):
        seg = codes[pos:pos + L].copy()
        if i % 2:
            seg = (3 - seg)[::-1]
        p = int(rng.integers(0, L))
        seg[p] = (seg[p] + 1) % 4
        reads[i] = seg
    lens = np.full(B, L, np.int32)
    mat = np.asarray(ksw.fill_score_matrix(1, 4))

    dg = jax.device_put(DeviceGenome.from_host(fm))
    reads_d = jax.device_put(reads)
    lens_d = jax.device_put(lens)
    mat_d = jax.device_put(mat)
    use_pallas = jax.default_backend() not in ("cpu",)
    res = align_step(dg, reads_d, lens_d, mat_d, use_pallas=use_pallas)
    jax.block_until_ready(res.score)
    mapped = int(np.sum(np.asarray(res.mapped)))
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        res = align_step(dg, reads_d, lens_d, mat_d, use_pallas=use_pallas)
    jax.block_until_ready(res.score)
    dt = (time.time() - t0) / iters
    return {
        "device_step_pairs_s": round(B / dt / 2.0, 1),
        "device_step_ms": round(dt * 1e3, 2),
        "device_step_mapped_frac": mapped / B,
        "device": str(jax.devices()[0]),
        "pallas": use_pallas,
    }


def _record_diff_rate(dir_a: str, dir_b: str) -> dict:
    """Record-level BAM diff between two CLI output dirs (VERDICT r4 item
    7): fraction of bc-sorted records whose packed bytes differ. The
    device-primed and host-native paths are asserted bit-identical by
    tests; this keeps that claim measured in every BENCH artifact."""
    import struct

    from lariat_tpu.io.bamread import BamFile

    def recs(d):
        bf = BamFile(os.path.join(d, "bc_sorted_bam.bam"))
        out, off, data = [], bf._records_start, bf.data
        while off < len(data):
            n = struct.unpack_from("<I", data, off)[0]
            out.append(data[off + 4:off + 4 + n])
            off += 4 + n
        return out

    a, b = recs(dir_a), recs(dir_b)
    n = max(len(a), len(b))
    if n == 0:
        return {"sam_diff_rate": 0.0, "records": 0}
    diff = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
    return {"sam_diff_rate": round(diff / n, 6), "records": n}


def main() -> None:
    sys.path.insert(0, REPO)
    workdir = tempfile.mkdtemp(prefix="lariat_bench_")
    fa, reads, t_index = _prepare_inputs(workdir)

    have_device = _device_available()
    # median of 3 warm runs per mode (run 0 = warmup) — r4's 3.7x
    # no-change swings came from single 0.8 s runs (VERDICT r4 item 5)
    host_runs, dev_runs = [], []
    for i in range(4):
        host_runs.append(_run_cli(fa, reads,
                                  os.path.join(workdir, f"out_host{i}"),
                                  "off"))
    host = _median_of(host_runs[1:])
    host["runs"] = [r.get("pairs_s", 0.0) for r in host_runs]
    if have_device:
        srv = _start_device_server(fa, timeout_s=600)
        if srv:
            os.environ["LARIAT_DEVICE_SOCKET"] = srv[1]
        try:
            errs = 0
            for i in range(4):
                r = _run_cli(fa, reads, os.path.join(workdir, f"out_dev{i}"),
                             "on", timeout_s=1200 if i == 0 else 600)
                dev_runs.append(r)
                errs = errs + 1 if "error" in r else 0
                if errs >= 2:
                    break
        finally:
            if srv:
                os.environ.pop("LARIAT_DEVICE_SOCKET", None)
                srv[0].kill()
                srv[0].wait()
        dev = _median_of(dev_runs[1:])
        dev["runs"] = [r.get("pairs_s", 0.0) for r in dev_runs]
        dev["server"] = bool(srv)
    else:
        dev = {"error": "device unavailable"}

    candidates = {"cli_host_native_5w": host, "cli_device_primed_5w": dev}
    best_name, best = max(
        ((k, v) for k, v in candidates.items() if "pairs_s" in v),
        key=lambda kv: kv[1]["pairs_s"], default=(None, None))

    detail = {
        "config": f"{N_BARCODES} barcodes x {PAIRS_PER_BC} pairs, 151bp, "
                  "4.6Mb genome + segdup, sa_intv=32, 5 workers",
        "best_config": best_name,
        "index_build_s": round(t_index, 1),
        **{k: v for k, v in candidates.items()},
    }
    # RFA jit-vs-numpy probe (VERDICT r4 item 4): one run with the jitted
    # row kernel so the decision to ship numpy rows stays evidence-backed
    # in every BENCH artifact (jit measured ~10x slower: per-worker
    # per-bucket compiles never amortize on rows this small)
    detail["rfa_numpy"] = {"pairs_s": host.get("pairs_s"),
                           "rfa_wall_s": host.get("rfa_wall_s")}
    os.environ["LARIAT_RFA_JIT"] = "1"
    try:
        jit_probe = _run_cli(fa, reads,
                             os.path.join(workdir, "out_rfajit2"), "off")
    finally:
        os.environ.pop("LARIAT_RFA_JIT", None)
    detail["rfa_jit_probe"] = {
        k: jit_probe.get(k) for k in ("pairs_s", "rfa_wall_s", "rfa_rows")}
    # record-level device-vs-host parity on the last pair of runs
    if have_device and "pairs_s" in dev:
        try:
            detail["device_vs_host_diff"] = _record_diff_rate(
                os.path.join(workdir, "out_host3"),
                os.path.join(workdir, "out_dev3"))
        except Exception as e:  # noqa: BLE001
            detail["device_vs_host_diff"] = {"error": str(e)[:200]}
    hg38 = _hg38_runs(workdir, have_device)
    detail.update(hg38)
    # per-kernel %SOL roofline (separate process: one tunnel client at a
    # time, and it must not share this process's jax state)
    try:
        if not have_device:
            raise RuntimeError("device unavailable")
        roof = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/kernel_roofline.py")],
            env={**os.environ, "PYTHONPATH": REPO + (
                 ":" + os.environ["PYTHONPATH"]
                 if os.environ.get("PYTHONPATH") else "")},
            capture_output=True, text=True, timeout=1800)
        detail["roofline"] = json.loads(roof.stdout.strip().splitlines()[-1])
    except Exception as e:
        detail["roofline_error"] = str(e)[:200]
    try:
        if not have_device:
            raise RuntimeError("device unavailable")
        # subprocess + hard timeout: a wedged tunnel must not hang the
        # bench process itself (in-process jax cannot be interrupted)
        code = ("import sys, json; sys.path.insert(0, %r)\n"
                "import bench\n"
                "print('DSD ' + json.dumps(bench._device_step_detail(%r)))"
                % (REPO, fa))
        p = subprocess.run(
            [sys.executable, "-c", code],
            env={**os.environ, "PYTHONPATH": REPO + (
                 ":" + os.environ["PYTHONPATH"]
                 if os.environ.get("PYTHONPATH") else "")},
            capture_output=True, text=True, timeout=1200)
        for line in p.stdout.splitlines():
            if line.startswith("DSD "):
                detail.update(json.loads(line[4:]))
                break
        else:
            raise RuntimeError((p.stderr or p.stdout)[-200:])
    except Exception as e:  # device detail must never sink the primary metric
        detail["device_step_error"] = str(e)[:200]

    # primary metric: BASELINE.md's regime is hg38-scale barcoded reads;
    # use the full-genome runs when the prebuilt 3.09 Gbp index is present,
    # else the synthetic small-genome pipeline
    hg_dev = hg38.get("hg38_device_8w", {})
    hg_host = hg38.get("hg38_host_8w", {})
    hg_best = None
    if "pairs_s" in hg_dev or "pairs_s" in hg_host:
        # the primary number is the device-primed median when it wins
        # (VERDICT r2 item 1); otherwise the host median
        hg_best = max((r for r in (hg_dev, hg_host) if "pairs_s" in r),
                      key=lambda r: r["pairs_s"])
        detail["primary_config"] = ("hg38_device_8w"
                                    if hg_best is hg_dev else "hg38_host_8w")
    if hg_best is not None:
        value = hg_best["pairs_s"]
        metric = ("read pairs aligned/sec/chip (full CLI pipeline on 3.09 "
                  "Gbp simulated hg38: FASTQ->candidates->rescue->RFA->BAM, "
                  "barcoded 10X reads)")
        detail["small_genome_pairs_s"] = best["pairs_s"] if best else 0.0
    else:
        # primary regime unavailable: say so LOUDLY in the metric string
        # (never report the toy number as if it were the hg38 number)
        reason = hg38.get("hg38_skipped", "hg38 runs produced no rate")
        detail.setdefault("hg38_skipped", reason)
        value = best["pairs_s"] if best else 0.0
        metric = ("read pairs aligned/sec/chip (full CLI pipeline, 4.6Mb "
                  "TOY genome — hg38 regime SKIPPED: " + str(reason)[:120]
                  + ")")
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / BASELINE_PAIRS_PER_S, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
