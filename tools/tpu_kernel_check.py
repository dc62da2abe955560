"""On-chip Pallas kernel correctness check (VERDICT r1 item 8).

Runs the SW-extend and banded-global Pallas kernels on the REAL accelerator
(no interpret mode, no CPU forcing) and asserts bit-equality against the
scalar host references in align/ksw.py. Invoked by tests/test_tpu_kernels.py
under RUN_TPU=1, or manually:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/tpu_kernel_check.py

Prints TPU_KERNELS_OK on success. Must be the only TPU client on this
machine (the axon tunnel serializes clients).
"""

import sys
import time

import numpy as np

from lariat_tpu.align import ksw
from lariat_tpu.ops import sw_extend_pallas, sw_global_pallas


def make_extend_tasks(rng, B, Lq, Lt):
    qa = rng.integers(0, 4, (B, Lq)).astype(np.int32)
    ta = np.zeros((B, Lt), np.int32)
    qlen = rng.integers(0, Lq + 1, B).astype(np.int32)
    tlen = rng.integers(0, Lt + 1, B).astype(np.int32)
    for i in range(B):
        n = min(int(qlen[i]), int(tlen[i]))
        ta[i, :n] = qa[i, :n]
        extra = int(tlen[i]) - n
        if extra > 0:
            ta[i, n:n + extra] = rng.integers(0, 4, extra)
        for _ in range(int(rng.integers(0, 5))):
            if tlen[i]:
                p = int(rng.integers(0, tlen[i]))
                ta[i, p] = (ta[i, p] + 1) % 4
    h0 = rng.integers(10, 60, B).astype(np.int32)
    w = np.full(B, 40, np.int32)
    return qa, qlen, ta, tlen, w, h0


def main() -> int:
    import jax
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}")
    if dev.platform == "cpu":
        print("ERROR: expected an accelerator, got cpu", file=sys.stderr)
        return 2

    mat = np.asarray(ksw.fill_score_matrix(1, 4))
    rng = np.random.default_rng(2024)

    # --- extend kernel ---
    B, Lq, Lt = 256, 128, 160
    qa, qlen, ta, tlen, w, h0 = make_extend_tasks(rng, B, Lq, Lt)
    t0 = time.time()
    got = sw_extend_pallas.extend_batch_pallas(qa, qlen, ta, tlen, mat, w, h0)
    # materialize via np.asarray: block_until_ready is unreliable over the
    # axon tunnel
    got = {f: np.asarray(getattr(got, f)) for f in got._fields}
    dt = time.time() - t0
    print(f"extend kernel: B={B} in {dt * 1e3:.1f} ms (incl. compile)")
    mism = 0
    for i in range(B):
        want = ksw.extend(qa[i, :qlen[i]], ta[i, :tlen[i]], mat,
                          6, 1, 6, 1, int(w[i]), 5, 100, int(h0[i]))
        for f in got:
            if int(got[f][i]) != int(getattr(want, f)):
                print(f"extend mismatch task {i} field {f}: "
                      f"device={int(got[f][i])} host={int(getattr(want, f))}")
                mism += 1
    if mism:
        return 1
    print(f"extend kernel: {B} tasks bit-identical to host")

    # --- banded global kernel + traceback ---
    B, Lq, Lt = 128, 96, 112
    qa = np.zeros((B, Lq), np.int32)
    ta = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    wv = np.zeros(B, np.int32)
    cases = []
    for i in range(B):
        ql = int(rng.integers(10, Lq + 1))
        ref = rng.integers(0, 4, Lt + 8)
        q = ref[:ql].copy()
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, ql))
            q[p] = (q[p] + 1) % 4
        tl = max(1, ql + int(rng.integers(-4, 5)))
        t = ref[:tl].copy()
        ww = int(rng.choice([10, 25, 100]))
        ww = max(ww, abs(ql - tl))  # traceback undefined for w < |diff|
        qa[i, :ql] = q
        ta[i, :tl] = t
        qlen[i], tlen[i], wv[i] = ql, tl, ww
        cases.append((q, t, ww))
    t0 = time.time()
    res = sw_global_pallas.global_batch_pallas(qa, qlen, ta, tlen, mat, wv)
    score = np.asarray(res.score)
    z = np.asarray(res.z)
    dt = time.time() - t0
    print(f"global kernel: B={B} in {dt * 1e3:.1f} ms (incl. compile)")
    for i, (q, t, ww) in enumerate(cases):
        want_score, want_cigar = ksw.global_align(
            q.astype(np.int64), t.astype(np.int64), mat, 6, 1, 6, 1, ww)
        if int(score[i]) != want_score:
            print(f"global score mismatch task {i}: "
                  f"device={int(score[i])} host={want_score}")
            return 1
        got_cigar = sw_global_pallas.traceback_unpacked(
            z[i], len(q), len(t), ww)
        if got_cigar != want_cigar:
            print(f"global cigar mismatch task {i}: "
                  f"device={got_cigar} host={want_cigar}")
            return 1
    print(f"global kernel: {B} tasks bit-identical to host (score + cigar)")

    # --- local (mate rescue) kernel ---
    B, Lq, Lt = 256, 128, 256
    qa = np.zeros((B, Lq), np.int32)
    ta = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    cases = []
    for i in range(B):
        ql = int(rng.integers(1, Lq + 1))
        tl = int(rng.integers(1, Lt + 1))
        t = rng.integers(0, 4, tl)
        if tl > ql and rng.integers(0, 4):
            off = int(rng.integers(0, tl - ql))
            q = t[off:off + ql].copy()
            for _ in range(int(rng.integers(0, max(2, ql // 10)))):
                p = int(rng.integers(0, ql))
                q[p] = (q[p] + 1) % 4
        else:
            q = rng.integers(0, 5, ql)
        qa[i, :ql] = q
        ta[i, :tl] = t
        qlen[i], tlen[i] = ql, tl
        cases.append((q, t))
    minsc = np.full(B, 19, np.int32)
    from lariat_tpu.ops import sw_local_pallas
    t0 = time.time()
    res = sw_local_pallas.local_batch_pallas(qa, qlen, ta, tlen, minsc)
    got = {f: np.asarray(getattr(res, f)) for f in res._fields}
    dt = time.time() - t0
    print(f"local kernel: B={B} in {dt * 1e3:.1f} ms (incl. compile)")
    for i, (q, t) in enumerate(cases):
        ref = ksw._local_core(q.astype(np.int64), t.astype(np.int64), mat,
                              6, 1, 6, 1, 19, 1 << 30)
        want = (0, -1, -1, -1, -1) if ref[1] < 0 else ref
        for f, wv_ in zip(res._fields, want):
            if int(got[f][i]) != int(wv_):
                print(f"local mismatch task {i} field {f}: "
                      f"device={int(got[f][i])} host={int(wv_)}")
                return 1
    print(f"local kernel: {B} tasks bit-identical to host")

    # --- local wrapper: exercises local_align_batch's score-matrix ->
    # (match, mismatch, n) translation on the chip (a sign bug hid there
    # once: kernel-level tests passed while the wrapper rewarded
    # mismatches) ---
    tasks = [(q.astype(np.int64), t.astype(np.int64)) for q, t in cases[:64]]
    out = ksw.local_align_batch(tasks, mat, 6, 1, 6, 1, 19,
                                backend="pallas")
    for i, (q, t) in enumerate(tasks):
        want = ksw.local_align(q, t, mat, 6, 1, 6, 1, 19)
        if out[i] != want:
            print(f"local wrapper mismatch task {i}: device={out[i]} "
                  f"host={want}")
            return 1
    print(f"local wrapper: {len(tasks)} tasks bit-identical to host")
    print("TPU_KERNELS_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
