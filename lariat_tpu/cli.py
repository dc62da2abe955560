"""Command-line entry point with reference flag parity (lariat/main.go:9-48).

Usage: python -m lariat_tpu.cli -reads in.fastq.gz -genome ref.fa -output dir

Accepts both single-dash (Go style) and double-dash flags.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from . import __version__
from .align.engine import AlignmentEngine
from .config import RFAConfig
from .index import fmindex
from .io.bamwriter import LariatBAMs
from .io.fastq import FastQReader
from .rfa.pipeline import (RFAStats, load_centromeres, process_barcode,
                           worth_running_rfa)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lariat_tpu", allow_abbrev=False)
    a = p.add_argument
    a("-reads", "--reads", required=True,
      help="fastq.gz input file containing reads")
    a("-improper_pair_penalty", "--improper_pair_penalty", type=float,
      default=-4.0, help="penalty for improper pair")
    a("-simulated", "--simulated", action="store_true", help="simulated data?")
    a("-output", "--output", required=True,
      help="directory at which to output bam files")
    a("-read_groups", "--read_groups",
      default="sample:library:gem_group:flowcell:lane",
      help="comma-separated list of read group IDs")
    a("-sample_id", "--sample_id", default="default_sample_id")
    a("-threads", "--threads", type=int, default=8)
    a("-max_bcs", "--max_bcs", type=int, default=-1,
      help="maximum number of barcodes to process")
    a("-debug", "--debug", action="store_true")
    a("-position_chunk_size", "--position_chunk_size", type=int,
      default=40000000)
    a("-debugBamTags", "--debugBamTags", action="store_true")
    a("-debugPrintMove", "--debugPrintMove", action="store_true")
    a("-genome", "--genome", required=True, help="genome FASTA path")
    a("-centromeres", "--centromeres", default="")
    a("-trim_length", "--trim_length", type=int, default=0)
    a("-first_chunk", "--first_chunk", action="store_true")
    a("-index", "--index", default="",
      help="optional prebuilt index prefix (.lariat.npz or bwa-format)")
    a("-profile", "--profile", default="",
      help="write a jax profiler trace to this directory (single-process "
           "mode) and print per-stage wall times")
    a("-use_device", "--use_device", choices=["auto", "on", "off"],
      default="auto",
      help="prime candidate-generation DP (seed-extend, mate rescue, "
           "final global SW) on the accelerator; auto uses the device "
           "whenever a non-CPU jax backend is present and falls back to "
           "host-native workers otherwise. First run per kernel-shape set "
           "pays a compile that persists in the jax compile cache.")
    return p


def _prime_group(device_engine, buf, config):
    """Run one device priming pass over a group of barcodes; attach the
    per-pair candidate regions to each work item."""
    all_reads = [rec for reads, _ in buf for rec in reads]
    primes = device_engine.prime_regions(all_reads,
                                         config.chain_score_delta)
    off = 0
    out = []
    for reads, unique in buf:
        out.append((reads, unique, primes[off:off + len(reads)]))
        off += len(reads)
    return out


def load_reference(genome: str, index_prefix: str = ""):
    """Load or build the genome index: prefers our .lariat.d / .lariat.npz,
    then a bwa-format index next to the FASTA, then builds from scratch."""
    import os
    prefix = index_prefix or genome
    if os.path.isdir(prefix + ".lariat.d"):
        return fmindex.FMIndex.load_dir(prefix)
    if os.path.exists(prefix + ".lariat.npz"):
        return fmindex.FMIndex.load(prefix)
    if os.path.exists(prefix + ".bwt"):
        return fmindex.load_bwa_index(prefix)
    fm = fmindex.build_index(genome)
    try:
        fm.save(genome)
    except OSError:
        pass
    return fm


# set by run() when a device tunnel RPC may still be in flight on a daemon
# thread at completion: C++ runtime teardown while it is mid-call aborts the
# process ("FATAL: exception not rethrown"), so main() hard-exits instead
_SKIP_TEARDOWN = False


def main(argv=None) -> int:
    rc, _ = run(argv)
    if _SKIP_TEARDOWN:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)
    return rc


def run(argv=None):
    """Full pipeline; returns (exit_code, RFAStats) so multi-host drivers can
    psum the stats across processes (parallel/multihost.py)."""
    global _SKIP_TEARDOWN
    args = build_parser().parse_args(argv)
    if args.debugPrintMove or args.debug:
        # set before workers fork so every process inherits the switches
        from .rfa import debug as rfa_debug
        rfa_debug.PRINT_MOVE = rfa_debug.PRINT_MOVE or args.debugPrintMove
        rfa_debug.DEBUG = rfa_debug.DEBUG or args.debug
    # kick the device backend init + first-transfer warmup NOW so it overlaps
    # the (tens of seconds at hg38 scale) genome load — otherwise short runs
    # finish before the tunnel warms up and prime zero pairs. Safe pre-fork:
    # workers never touch jax (tensor RFA's jit twin is opt-in via
    # LARIAT_RFA_JIT, which is a cpu-pinned/testing mode).
    early_box: dict = {}
    early_warm = None
    if args.threads > 1 and args.use_device != "off":
        plat = os.environ.get("JAX_PLATFORMS", "")
        if not (plat and set(plat.split(",")) <= {"cpu"}):
            import threading

            def _early_probe():
                try:
                    import jax
                    early_box["backend"] = jax.default_backend()
                    if early_box["backend"] != "cpu":
                        import jax.numpy as jnp
                        import numpy as _np
                        _np.asarray(jnp.zeros(16, jnp.int32))
                        early_box["warm"] = True
                except Exception as e:  # noqa: BLE001
                    early_box["err"] = e
            early_warm = threading.Thread(target=_early_probe, daemon=True,
                                          name="lariat-early-warmup")
            early_warm.start()
    print(f"Starting lariat_tpu. Version: {__version__}")
    print(f"Loading reference genome: {args.genome}")
    fm = load_reference(args.genome, args.index)
    print("Reference loaded")
    if fm.l_pac > fmindex.FMIndex.CODES_CACHE_MAX:
        # genomes past the auto-cache bound (hg38-scale) still want the
        # unpacked-codes cache; build it pre-fork so workers share it CoW
        fm.ensure_codes_cache()
    # hugepage-migrate the FM hot arrays pre-fork (no-op for small genomes)
    fm.ensure_native_hot()
    engine = AlignmentEngine(fm)
    config = RFAConfig(improper_pair_penalty=args.improper_pair_penalty)
    centromeres = load_centromeres(args.centromeres or None)
    stats = RFAStats()
    bams = LariatBAMs(
        contigs=[(c.name, c.length) for c in fm.contigs],
        base_path=args.output, read_groups=args.read_groups,
        sample_id=args.sample_id,
        position_chunk_size=args.position_chunk_size,
        debug_tags=args.debugBamTags, first_chunk=args.first_chunk,
        version=__version__, cl=" ".join(sys.argv))
    reader = FastQReader(args.reads)
    t0 = time.time()

    def work_iter():
        barcode_num = 0
        while True:
            barcode_num += 1
            reads, unique = reader.read_barcode_set(args.trim_length)
            if reads is None:
                return
            if barcode_num == args.max_bcs:
                return
            if len(reads) > 2:
                print(f"working on barcode {reads[0].barcode10x.decode()}  "
                      f"num reads: {len(reads)}  doing RFA: "
                      f"{worth_running_rfa(reads, unique)}  "
                      f"unique_barcode {unique}")
            yield reads, unique

    n_pairs = 0
    n_bcs = 0
    if args.threads > 1:
        # worker pool over barcode groups (reference lariat.go:333-390);
        # with a device available, candidate-generation DP is primed on it in
        # the main process and workers run rescue + RFA + emission
        from .parallel.host_pipeline import ParallelRunner, write_packed
        # fork the worker pool BEFORE any jax initialization: jax spawns
        # threads and fork-after-threads deadlocks
        runner = ParallelRunner(engine, config, centromeres, bams.tid,
                                args.debugBamTags, args.simulated,
                                args.threads,
                                position_chunk_size=args.position_chunk_size)
        device_engine = None
        if args.use_device != "off":
            # a resident device server (parallel/device_server.py) holds
            # the tunnel warmup, the uploaded index, and the compiled
            # kernels across CLI runs — connect to it first: priming then
            # starts at t=0 instead of after a 10-60 s per-process
            # first-transfer warmup
            from .parallel.device_server import DeviceServerClient
            cli_srv = DeviceServerClient.connect(
                args.genome, path=os.environ.get("LARIAT_DEVICE_SOCKET")
                or None)
            if cli_srv is not None and (
                    getattr(cli_srv, "backend", "cpu") != "cpu"
                    or os.environ.get("LARIAT_DEVICE_SERVER_CPU_OK") == "1"):
                device_engine = cli_srv
                print(f"device priming via server ({cli_srv.path}, "
                      f"backend {cli_srv.backend})")
        if args.use_device != "off" and device_engine is None:
            try:
                import jax
                # a cpu-pinned environment means no device: checking via
                # default_backend() would make the TPU-tunnel plugin build
                # its client anyway (it ignores JAX_PLATFORMS and injects
                # itself into jax.config.jax_platforms), which can block
                # for minutes when another client holds the tunnel
                plat = os.environ.get("JAX_PLATFORMS", "")
                cpu_pinned = bool(plat) and set(plat.split(",")) <= {"cpu"}
                if args.use_device == "auto" and cpu_pinned:
                    raise RuntimeError("jax pinned to cpu")
                if cpu_pinned:
                    # explicit -use_device on with a cpu pin (tests): build
                    # the cpu engine without probing the default backend.
                    # The tunnel plugin ignores the ENV pin but honors the
                    # jax.config one — set it so lazy jnp constants in the
                    # kernel modules can't initialize the tunnel client
                    try:
                        jax.config.update("jax_platforms", "cpu")
                    except RuntimeError:
                        pass
                    from .align.batch_engine import BatchAlignmentEngine
                    device_engine = BatchAlignmentEngine(fm,
                                                         use_pallas=False)
                    print("device priming on cpu (pinned)")
                else:
                    # backend init over a remote tunnel can block
                    # INDEFINITELY when the terminal is unreachable; the
                    # early-warmup daemon thread (started before the genome
                    # load) carries it — join with a hard timeout so a
                    # broken tunnel degrades (auto) or fails fast (on)
                    # instead of hanging the whole run
                    box = early_box
                    th = early_warm
                    if th is not None:
                        th.join(timeout=float(os.environ.get(
                            "LARIAT_DEVICE_PROBE_TIMEOUT", "180")))
                        if th.is_alive():
                            _SKIP_TEARDOWN = True
                            raise RuntimeError(
                                "device backend init timed out "
                                "(tunnel unreachable)")
                    if "err" in box:
                        raise box["err"]
                    if args.use_device == "on" or box.get("backend") != "cpu":
                        from .align.batch_engine import BatchAlignmentEngine
                        device_engine = BatchAlignmentEngine(fm)
                        print(f"device priming on {jax.devices()[0]}")
            except Exception as e:  # no usable device: run host-only workers
                if args.use_device == "on":
                    raise
                print(f"device priming unavailable ({e}); host-only workers")

        feed_stats = {"primed_pairs": 0, "host_pairs": 0}

        def primed_iter():
            """Tagged work feed: yields (seq, work), possibly out of reader
            order (the main loop reorders results by seq before writing).

            Hybrid routing (the device can only ADD throughput, never gate
            it): barcode groups batch up to ~4k pairs; a batch goes to a
            device priming thread when one is free, and straight to the
            host workers (who run the native DP themselves) when priming
            is saturated. Workers therefore never idle behind a slow
            device wave — over a high-latency TPU tunnel the device
            contributes whatever fraction it can keep up with, and on
            well-attached hardware it absorbs essentially all DP."""
            import itertools
            seq = itertools.count()
            if device_engine is None:
                for item in work_iter():
                    yield (next(seq), item)
                return
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            n_prime = max(1, int(os.environ.get("LARIAT_PRIME_THREADS",
                                                "2")))
            ex = ThreadPoolExecutor(max_workers=n_prime,
                                    thread_name_prefix="lariat-prime")
            if os.environ.get("LARIAT_PRIME_WAIT"):
                # block for the transfer warmup instead of feeding workers
                # through the host path meanwhile (tests / short runs that
                # must exercise the primed path end to end)
                device_engine.wait_warmup()

            import time as _time
            rate_box = {"pairs_s": None}

            def prime_tagged(tagged):
                from .align.batch_engine import PrimeAborted
                t0 = _time.time()
                try:
                    primed = _prime_group(device_engine,
                                          [it for _, it in tagged], config)
                except PrimeAborted:
                    return None   # EOF tail guard fired: host-route batch
                dt = max(_time.time() - t0, 1e-3)
                n = sum(len(it[0]) for _, it in tagged)
                r = n / dt
                prev = rate_box["pairs_s"]
                rate_box["pairs_s"] = r if prev is None else (
                    0.5 * prev + 0.5 * r)
                return [(s, p) for (s, _), p in zip(tagged, primed)]

            futs = deque()   # (future, tagged) pairs
            dorm = {"first_submit": None, "off": False}

            def dormant() -> bool:
                """Give up on priming for the rest of the run when the
                device demonstrably cannot pull its weight: it must add
                >= LARIAT_PRIME_MIN_FRAC (default 15%) on top of the host
                pool's concurrent throughput, or never complete a batch
                within 45 s. A dormant device costs nothing; a struggling
                one costs contention, reorder latency, and the EOF tail."""
                if dorm["off"]:
                    return True
                r = rate_box["pairs_s"]
                el = time.time() - t0
                if r is None:
                    fs = dorm["first_submit"]
                    if fs is not None and time.time() - fs > 45.0:
                        dorm["off"] = True
                else:
                    host_rate = feed_stats["host_pairs"] / max(el, 1e-3)
                    frac = float(os.environ.get("LARIAT_PRIME_MIN_FRAC",
                                                "0.15"))
                    if r < frac * host_rate:
                        dorm["off"] = True
                if dorm["off"]:
                    print(f"device priming dormant (measured "
                          f"{r or 0:.0f} pairs/s)", flush=True)
                return dorm["off"]

            # priming via the resident server: FIXED batch size. The
            # tunnel's compile service is outside the persistent cache, so
            # every distinct batch shape costs minutes of compile; the
            # server prewarms exactly this size and the router never sends
            # another (remainders host-route).
            fixed_batch = (int(os.environ.get("LARIAT_PRIME_BATCH", "1024"))
                           if getattr(device_engine, "path", None)
                           else None)

            def batch_target() -> int:
                if fixed_batch:
                    return fixed_batch
                # size prime batches so one wave is ~2 s of device work:
                # a slow device (or cold tunnel) then holds only a short
                # tail at EOF and can never gate the run; a fast device
                # earns full 16k-pair waves. Until the first batch lands
                # the rate is unknown — start small so the first (compile-
                # and upload-laden) batch can never hold minutes of work.
                r = rate_box["pairs_s"]
                if r is None:
                    return 1024
                return max(512, min(16384, int(r * 2.0)))

            def drain(block: bool):
                while futs and (block or futs[0][0].done()):
                    f, tagged = futs.popleft()
                    res = f.result()
                    if res is None:   # prime pass aborted: host-route
                        for s, it in tagged:
                            feed_stats["host_pairs"] += len(it[0])
                            yield (s, it)
                        continue
                    for t in res:
                        feed_stats["primed_pairs"] += len(t[1][0])
                        yield t
            try:
                buf = []
                pending = 0
                for item in work_iter():
                    t = (next(seq), item)
                    # while the tunnel's first-transfer warmup stall is in
                    # flight, keep workers fed through the host path instead
                    # of blocking the whole pipeline on the device
                    if device_engine._warmup is not None:
                        if device_engine._warmup.is_alive():
                            feed_stats["host_pairs"] += len(item[0])
                            yield t
                            continue
                        device_engine.wait_warmup()
                    npairs = len(item[0])
                    if (fixed_batch and pending
                            and pending + npairs > fixed_batch):
                        # fixed-shape mode: never let a batch overshoot
                        # the prewarmed size (the pow2 padding would jump
                        # to a shape the server has not compiled). Batches
                        # in (fixed/2, fixed] pairs share the prewarmed
                        # read-count bucket; anything smaller host-routes.
                        if (pending <= fixed_batch // 2 or dormant()
                                or sum(1 for f, _ in futs
                                       if not f.done()) >= n_prime):
                            for s, it in buf:
                                feed_stats["host_pairs"] += len(it[0])
                                yield (s, it)
                        else:
                            if dorm["first_submit"] is None:
                                dorm["first_submit"] = time.time()
                            futs.append((ex.submit(prime_tagged, buf),
                                         buf))
                        buf = []
                        pending = 0
                        yield from drain(block=False)
                    buf.append(t)
                    pending += npairs
                    if pending >= batch_target():
                        if (fixed_batch and pending > fixed_batch):
                            # single oversized barcode group: host route
                            for s, it in buf:
                                feed_stats["host_pairs"] += len(it[0])
                                yield (s, it)
                        elif dormant() or sum(
                                1 for f, _ in futs
                                if not f.done()) >= n_prime:
                            # priming saturated/dormant: host route now
                            for s, it in buf:
                                feed_stats["host_pairs"] += len(it[0])
                                yield (s, it)
                        else:
                            if dorm["first_submit"] is None:
                                dorm["first_submit"] = time.time()
                            futs.append((ex.submit(prime_tagged, buf),
                                         buf))
                        buf = []
                        pending = 0
                        yield from drain(block=False)
                # EOF: the device must never gate the tail. Submit the
                # remainder only if a prime slot is free (and, in fixed-
                # shape mode, only at the exact prewarmed size — an odd
                # remainder would compile a fresh shape for one batch);
                # cancel queued futures and host-route their batches.
                if buf:
                    if ((fixed_batch and pending <= fixed_batch // 2)
                            or sum(1 for f, _ in futs
                                   if not f.done()) >= n_prime):
                        for s, it in buf:
                            feed_stats["host_pairs"] += len(it[0])
                            yield (s, it)
                    else:
                        futs.append((ex.submit(prime_tagged, buf), buf))
                keep = deque()
                while futs:
                    f, tagged = futs.popleft()
                    if f.cancel():
                        for s, it in tagged:
                            feed_stats["host_pairs"] += len(it[0])
                            yield (s, it)
                    else:
                        keep.append((f, tagged))
                futs = keep
                # RUNNING futures: a bounded grace, then abort the engine
                # between waves and host-route their batches. Re-doing a
                # batch on host costs ~1 s; a mid-prime device batch can
                # hold minutes over a cold tunnel — the device must never
                # gate the run tail (VERDICT r4 item 2 / r5).
                if futs:
                    from concurrent.futures import wait as _fwait
                    # rate-aware: an in-flight batch at the measured rate
                    # is worth waiting ~1.5 batch-times for; an unmeasured
                    # (never-completed-a-batch) device gets seconds only.
                    # Bounded by a fraction of the elapsed run so the tail
                    # wait can never dominate a short run's wall time.
                    r = rate_box["pairs_s"]
                    auto = (1.5 * batch_target() / r) if r else 5.0
                    elapsed = time.time() - t0
                    grace = float(os.environ.get(
                        "LARIAT_PRIME_TAIL_GRACE", "0")) or min(
                            max(2.0, auto), max(2.0, 0.15 * elapsed), 30.0)
                    _fwait([f for f, _ in futs], timeout=grace)
                    if any(not f.done() for f, _ in futs):
                        device_engine.abort_prime = True
                        still = deque()
                        abandoned = []
                        while futs:
                            f, tagged = futs.popleft()
                            if f.done():
                                still.append((f, tagged))
                            else:
                                # result (even if it lands later) is
                                # discarded; items are yielded exactly once
                                abandoned.append(f)
                                for s, it in tagged:
                                    feed_stats["host_pairs"] += len(it[0])
                                    yield (s, it)
                        futs = still
                        device_engine._abandoned = abandoned
                yield from drain(block=True)
            finally:
                ex.shutdown(wait=False)

        reorder = {}
        next_seq = 0
        for seq_i, packed in runner.imap_seq(primed_iter()):
            reorder[seq_i] = packed
            while next_seq in reorder:
                packed = reorder.pop(next_seq)
                next_seq += 1
                write_packed(bams, packed)
                n_pairs += packed.n_reads
                n_bcs += 1
                stats.total += packed.stats[0]
                stats.correct += packed.stats[1]
                stats.total_mapq10 += packed.stats[2]
                stats.correct_mapq10 += packed.stats[3]
                if len(packed.stats) >= 6:
                    stats.picks += packed.stats[4]
                    stats.tie_picks += packed.stats[5]
                if len(packed.stats) >= 7:
                    stats.rfa_wall += packed.stats[6]
        assert not reorder, "reorder buffer not drained"
        runner.close()
        if device_engine is not None:
            w = device_engine._warmup
            if w is not None:
                w.join(timeout=2.0)
                if w.is_alive():
                    _SKIP_TEARDOWN = True
            # abandoned prime futures may still be mid-RPC on the tunnel:
            # runtime teardown would abort the process from under them
            for f in getattr(device_engine, "_abandoned", ()):
                if not f.done():
                    _SKIP_TEARDOWN = True
    else:
        profiler = None
        if args.profile:
            try:
                import jax
                jax.profiler.start_trace(args.profile)
                profiler = jax
            except Exception as e:
                print(f"profiler unavailable: {e}")
        t_align = t_dump = 0.0
        for reads, unique in work_iter():
            t1 = time.time()
            result = process_barcode(engine, reads, unique, config,
                                     centromeres, stats, args.simulated)
            t2 = time.time()
            bams.dump(result.alignments, result.attach_bx)
            t_align += t2 - t1
            t_dump += time.time() - t2
            n_pairs += len(reads)
            n_bcs += 1
        if profiler is not None:
            profiler.profiler.stop_trace()
        if args.profile:
            print(f"stage times: align+rfa {t_align:.2f}s, emit {t_dump:.2f}s")
    bams.close()
    dt = time.time() - t0
    if args.threads > 1 and device_engine is not None:
        ws = device_engine.wave_stats
        print(f"device waves: {ws['n']}  wave wall {ws['wall']:.1f}s  "
              f"busy fraction {min(ws['wall'] / max(dt, 1e-9), 1.0):.2f}  "
              f"primed pairs {feed_stats['primed_pairs']}  "
              f"host pairs {feed_stats['host_pairs']}")
    print(f"Processed {n_pairs} read pairs across {n_bcs} barcodes "
          f"in {dt:.1f}s ({n_pairs / max(dt, 1e-9):.1f} pairs/s)")
    if stats.picks:
        print(f"tie-sensitive picks: {stats.tie_picks}/{stats.picks} "
              f"({stats.tie_picks / stats.picks:.4f})")
    if stats.rfa_wall:
        jit_on = os.environ.get("LARIAT_RFA_JIT") not in (None, "", "0")
        print(f"rfa wall: {stats.rfa_wall:.2f}s across workers "
              f"(rows: {'jit' if jit_on else 'numpy'})")
    if args.simulated and stats.total:
        print(f"simulated: total={stats.total} correct={stats.correct} "
              f"mapq10 total={stats.total_mapq10} correct={stats.correct_mapq10}")
    print("Lariat completed successfully")
    return 0, stats


if __name__ == "__main__":
    sys.exit(main())
