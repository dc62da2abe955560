"""Batch-synchronous 3-round SMEM enumeration on device (VERDICT r2 #3).

Reference semantics: native/seed.cpp collect_intv (bwa mem_collect_intv) —
round 1: all SMEMs with len >= min_seed_len; round 2: re-seed long low-occ
SMEMs from their midpoint with min_intv = s + 1; round 3: LAST-like
forward-greedy seeds (bwt_seed_strategy1); then a stable (qb, qe) sort.

Device mapping (the TPU-native design, not a port of the scan loop):

 - bwa's smem1a walks scan positions sequentially, each scan doing a
   forward pass then a backward contraction over a variable-length interval
   list — irregular control flow a chip can't batch. Instead we compute,
   for EVERY end position e of every read in the batch, the minimal start
   b(e) such that q[b..e) occurs (with interval size >= min_intv), by
   per-lane backward FM extension with divergence masking: lanes are
   (read, e) pairs, each device step extends every live lane by one base
   (two occ4 block gathers per lane). b(.) is non-decreasing, and
   [b(e), e) is an SMEM exactly when b(e+1) > b(e) — a right-maximality
   proof via occurrence counting shows this reproduces the scan-based
   enumeration set exactly (see docstring of smems_from_starts).
 - round 2 reuses the same kernel with per-lane min_intv = s + 1 and a
   covering-midpoint filter.
 - round 3 is a per-read forward walker (one lane per read).

Host assembly derives the (qb, qe, x0, x1, s) lists from the downloaded
arrays with numpy; order matches collect_intv byte-for-byte (rounds
concatenated then the same stable sort). Parity vs the native C++ is
asserted by tests/test_smem_device.py on fuzz corpora.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fm_batch import DeviceFMIndex, bwt_extend_batch


@functools.partial(jax.jit, static_argnames=("L",))
def min_starts_kernel(fmd: DeviceFMIndex, reads: jnp.ndarray,
                      read_idx: jnp.ndarray, e: jnp.ndarray,
                      min_intv: jnp.ndarray, L: int):
    """Per-lane minimal backward extension.

    reads: (R, L) codes 0..4. Lanes i: end position e[i] (exclusive) in
    read read_idx[i]. Returns (b, x0, x1, s, valid): b[i] = minimal start
    such that q[b..e) has interval size >= min_intv[i] (stepping only over
    non-N bases); the bi-interval is the final accepted state. valid=False
    when q[e-1] is N / e out of range (lane contributes nothing).
    """
    dt = fmd.idx_dtype
    flat = reads.reshape(-1)
    e = e.astype(jnp.int32)
    min_intv = jnp.maximum(min_intv.astype(dt), 1)

    def base_at(pos):
        idx = read_idx.astype(jnp.int32) * L + jnp.clip(pos, 0, L - 1)
        return jnp.take(flat, idx).astype(jnp.int32)

    c0 = base_at(e - 1)
    valid = (e >= 1) & (c0 < 4)
    c0c = jnp.clip(c0, 0, 3)
    x0 = fmd.L2[c0c] + 1
    x1 = fmd.L2[3 - c0c] + 1
    s = fmd.L2[c0c + 1] - fmd.L2[c0c]
    b = jnp.where(valid, e - 1, e).astype(jnp.int32)

    def step(t, carry):
        x0, x1, s, b, alive = carry
        pos = e - 2 - t
        c = base_at(pos)
        can = alive & (pos >= 0) & (c < 4)
        ok0, ok1, oks = bwt_extend_batch(
            fmd, jnp.where(can, x0, 1), jnp.where(can, x1, 1),
            jnp.where(can, s, 0), is_back=True)
        cc = jnp.clip(c, 0, 3)[:, None].astype(jnp.int32)
        n0 = jnp.take_along_axis(ok0, cc, axis=1)[:, 0]
        n1 = jnp.take_along_axis(ok1, cc, axis=1)[:, 0]
        ns = jnp.take_along_axis(oks, cc, axis=1)[:, 0]
        acc = can & (ns >= min_intv)
        x0 = jnp.where(acc, n0, x0)
        x1 = jnp.where(acc, n1, x1)
        s = jnp.where(acc, ns, s)
        b = jnp.where(acc, pos, b)
        return (x0, x1, s, b, acc)

    x0, x1, s, b, _ = jax.lax.fori_loop(
        0, L - 1, step, (x0, x1, s, jnp.where(valid, b, e), valid))
    return b, x0, x1, s, valid


@functools.partial(jax.jit, static_argnames=("L", "min_len", "cap"))
def strategy1_kernel(fmd: DeviceFMIndex, reads: jnp.ndarray,
                     lens: jnp.ndarray, max_intv, L: int,
                     min_len: int, cap: int):
    """bwt_seed_strategy1 per read: forward-greedy third-round seeds.

    Returns per-read (count, qb[cap], qe[cap], x0[cap], x1[cap], s[cap])
    in emission order (ascending qb — the scan is strictly forward).
    """
    dt = fmd.idx_dtype
    R = reads.shape[0]
    max_intv = jnp.asarray(max_intv, dt)
    lens = lens.astype(jnp.int32)

    def gather(pos):
        return jnp.take_along_axis(
            reads, jnp.clip(pos, 0, L - 1)[:, None].astype(jnp.int32),
            axis=1)[:, 0].astype(jnp.int32)

    # state: x (scan start), interval of q[x..t) (s==0 => needs init)
    init = (jnp.zeros(R, jnp.int32),                      # x
            jnp.ones(R, dt), jnp.ones(R, dt), jnp.zeros(R, dt),  # x0,x1,s
            jnp.zeros(R, jnp.int32),                      # n emitted
            jnp.zeros((R, cap), jnp.int32), jnp.zeros((R, cap), jnp.int32),
            jnp.zeros((R, cap), dt), jnp.zeros((R, cap), dt),
            jnp.zeros((R, cap), dt))

    def step(t, carry):
        x, x0, x1, s, n, qb, qe, ox0, ox1, os_ = carry
        inb = t < lens
        c = gather(jnp.full(R, t, jnp.int32))
        at_start = (t == x) & inb
        is_n = c >= 4
        # N at scan start (or anywhere): restart at t + 1
        cc = jnp.clip(c, 0, 3)
        sx0 = fmd.L2[cc] + 1
        sx1 = fmd.L2[3 - cc] + 1
        ss = fmd.L2[cc + 1] - fmd.L2[cc]
        # forward extension for lanes past their start
        ext = inb & (t > x) & ~is_n
        fc = jnp.clip(3 - c, 0, 3)[:, None].astype(jnp.int32)
        ok0, ok1, oks = bwt_extend_batch(
            fmd, jnp.where(ext, x0, 1), jnp.where(ext, x1, 1),
            jnp.where(ext, s, 0), is_back=False)
        n0 = jnp.take_along_axis(ok0, fc, axis=1)[:, 0]
        n1 = jnp.take_along_axis(ok1, fc, axis=1)[:, 0]
        ns = jnp.take_along_axis(oks, fc, axis=1)[:, 0]
        emit = ext & (ns < max_intv) & ((t - x) >= min_len) & (n < cap)
        # record emitted seed (qb=x, qe=t+1, interval = extended)
        idx = jnp.clip(n, 0, cap - 1)[:, None]
        onehot = (jnp.arange(cap, dtype=jnp.int32)[None, :] == idx)
        w = onehot & emit[:, None]
        qb = jnp.where(w, x[:, None], qb)
        qe = jnp.where(w, t + 1, qe)
        ox0 = jnp.where(w, n0[:, None], ox0)
        ox1 = jnp.where(w, n1[:, None], ox1)
        os_ = jnp.where(w, ns[:, None], os_)
        n = n + emit.astype(jnp.int32)
        # next state
        restart = inb & (is_n | emit)
        x = jnp.where(restart, t + 1, x)
        x0 = jnp.where(at_start & ~is_n, sx0, jnp.where(ext, n0, x0))
        x1 = jnp.where(at_start & ~is_n, sx1, jnp.where(ext, n1, x1))
        s = jnp.where(at_start & ~is_n, ss, jnp.where(ext, ns, s))
        # N at start also restarts
        x = jnp.where(at_start & is_n, t + 1, x)
        return (x, x0, x1, s, n, qb, qe, ox0, ox1, os_)

    out = jax.lax.fori_loop(0, L, step, init)
    x, x0, x1, s, n, qb, qe, ox0, ox1, os_ = out
    return n, qb, qe, ox0, ox1, os_


def smems_from_starts(b: np.ndarray, x0: np.ndarray, x1: np.ndarray,
                      s: np.ndarray, valid: np.ndarray, length: int,
                      min_seed_len: int) -> List[Tuple]:
    """Round-1 SMEM list for ONE read from its per-e arrays (e = 1..L,
    array index e-1).

    [b(e), e) is an SMEM iff it is right-maximal: b(e+1) > b(e), where
    crossing an N or the read end counts as +inf. Proof of equivalence to
    bwa's scan enumeration: every occurrence of [b(e), e) is an occurrence
    of any [x, e) with x >= b(e); if all occurrences of [x, e) extend by
    the same base then so do all occurrences of [b(e), e) — hence
    right-maximality at the scan level and at the b level coincide, and
    b's monotonicity makes each SMEM appear for exactly one e.
    """
    out = []
    for e in range(1, length + 1):
        if not valid[e - 1]:
            continue
        be = int(b[e - 1])
        if e - be < min_seed_len:
            continue
        if e < length and valid[e] and int(b[e]) <= be:
            continue  # extensible to the right: not maximal
        out.append((int(x0[e - 1]), int(x1[e - 1]), int(s[e - 1]),
                    be, e))
    return out


def collect_seeds_device(fmd: DeviceFMIndex, fm, reads: List[np.ndarray],
                         opt) -> List[List[Tuple]]:
    """Full 3-round collect_intv for a batch of reads, device-batched.

    Returns per-read seed tuple lists (x0, x1, s, qb, qe) matching
    native seed.cpp fm_collect_seeds_batch output order bit-for-bit.
    """
    n_reads = len(reads)
    if n_reads == 0:
        return []
    R = n_reads
    L = max((len(r) for r in reads), default=1)
    L = max(L, 2)
    # pad shapes to a small fixed set: every distinct (R, L) retraces the
    # lane kernels, and group sizes vary run to run. Padded reads are all-N
    # (every lane invalid -> no seeds), padded lens 0.
    L = -(-L // 64) * 64
    Rp = 128
    while Rp < R:
        Rp <<= 1
    rmat = np.full((Rp, L), 4, np.uint8)
    lens = np.zeros(Rp, np.int32)
    for i, r in enumerate(reads):
        rmat[i, :len(r)] = r
        lens[i] = len(r)
    R = Rp
    rd = jnp.asarray(rmat)

    # ---- round 1: all (read, e) lanes ------------------------------------
    read_idx = np.repeat(np.arange(R, dtype=np.int32), L)
    e_arr = np.tile(np.arange(1, L + 1, dtype=np.int32), R)
    b, x0, x1, s, valid = min_starts_kernel(
        fmd, rd, jnp.asarray(read_idx), jnp.asarray(e_arr),
        jnp.ones(R * L, np.int64), L)
    b = np.asarray(b).reshape(R, L)
    x0 = np.asarray(x0).reshape(R, L)
    x1 = np.asarray(x1).reshape(R, L)
    s = np.asarray(s).reshape(R, L)
    valid = np.asarray(valid).reshape(R, L).copy()
    # e beyond the read length is invalid
    valid &= (np.arange(1, L + 1, dtype=np.int32)[None, :]
              <= lens[:, None])

    min_seed = opt.min_seed_len
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    # vectorized round-1 assembly (smems_from_starts semantics batched)
    e_mat = np.arange(1, L + 1, dtype=np.int64)[None, :]
    BIG = np.int64(1 << 60)
    bnext = np.full((R, L), BIG, np.int64)
    bnext[:, :-1] = np.where(valid[:, 1:], b[:, 1:].astype(np.int64), BIG)
    emit = (valid & ((e_mat - b) >= min_seed) & (bnext > b))
    per_read: List[List[Tuple]] = [[] for _ in range(R)]
    reseeds = []   # (read, mid, s+1) requests, in round-1 emission order
    ri_idx, ei_idx = np.nonzero(emit)
    mb = b[ri_idx, ei_idx].tolist()
    mx0 = x0[ri_idx, ei_idx].tolist()
    mx1 = x1[ri_idx, ei_idx].tolist()
    ms_ = s[ri_idx, ei_idx].tolist()
    for k in range(len(ri_idx)):
        i = int(ri_idx[k])
        qe = int(ei_idx[k]) + 1
        qb = int(mb[k])
        mem = (int(mx0[k]), int(mx1[k]), int(ms_[k]), qb, qe)
        per_read[i].append(mem)
        if qe - qb >= split_len and mem[2] <= opt.split_width:
            reseeds.append((i, (qb + qe) >> 1, mem[2] + 1))

    # ---- round 2: per-reseed lanes over e in (mid, L] --------------------
    if reseeds:
        lane_read = []
        lane_e = []
        lane_m = []
        req_off = []           # [start, end) lane range per reseed request
        for (i, mid, m) in reseeds:
            start = len(lane_read)
            for e in range(mid + 1, int(lens[i]) + 1):
                lane_read.append(i)
                lane_e.append(e)
                lane_m.append(m)
            req_off.append((start, len(lane_read)))
        if lane_read:
            b2, x02, x12, s2, valid2 = min_starts_kernel(
                fmd, rd, jnp.asarray(np.array(lane_read, np.int32)),
                jnp.asarray(np.array(lane_e, np.int32)),
                jnp.asarray(np.array(lane_m, np.int64)), L)
            b2 = np.asarray(b2).tolist()
            x02 = np.asarray(x02).tolist()
            x12 = np.asarray(x12).tolist()
            s2 = np.asarray(s2).tolist()
            valid2 = np.asarray(valid2).tolist()
            # lanes per request are consecutive and e-ascending
            for (i, mid, m), (lo, hi) in zip(reseeds, req_off):
                for j in range(lo, hi):
                    if not valid2[j]:
                        continue
                    e = lane_e[j]
                    be = b2[j]
                    if be > mid:
                        continue
                    # right-maximality within this constrained family +
                    # covering-mid filter (smem1a(x=mid, min_intv=m))
                    if j + 1 < hi and valid2[j + 1] and b2[j + 1] <= be:
                        continue
                    if e - be < min_seed:
                        continue
                    per_read[i].append((x02[j], x12[j], s2[j], be, e))

    # ---- round 3: forward-greedy walker ----------------------------------
    if opt.max_mem_intv > 0:
        cap = max(2, L // max(min_seed, 1) + 2)
        n3, qb3, qe3, ox0, ox1, os3 = strategy1_kernel(
            fmd, rd, jnp.asarray(lens), int(opt.max_mem_intv), L,
            int(min_seed), cap)
        n3 = np.asarray(n3)
        qb3 = np.asarray(qb3)
        qe3 = np.asarray(qe3)
        ox0 = np.asarray(ox0)
        ox1 = np.asarray(ox1)
        os3 = np.asarray(os3)
        for i in range(R):
            for k in range(int(n3[i])):
                if int(os3[i, k]) > 0:
                    per_read[i].append((int(ox0[i, k]), int(ox1[i, k]),
                                        int(os3[i, k]), int(qb3[i, k]),
                                        int(qe3[i, k])))

    # ---- final stable (qb, qe) sort (collect_intv) -----------------------
    for i in range(n_reads):
        per_read[i] = sorted(per_read[i], key=lambda t: (t[3], t[4]))
    return per_read[:n_reads]


def collect_seeds_rbegs_device(dfm: DeviceFMIndex, dg, fm,
                               reads: List[np.ndarray], opt):
    """Device twin of native fm_collect_seeds_rbegs_batch: 3-round SMEM
    enumeration + the occurrence schedule's SA dereference, both on device.

    Returns (mems_per_read, rbegs_per_read) in the exact native format:
    (n, 5) int64 arrays [x0, x1, s, qb, qe] and int64 rbeg arrays in
    enumerate_occurrences order (step-sampled above max_occ).
    """
    from ..parallel.align_step import sa_lookup_batch as sa_dev

    per_read = collect_seeds_device(dfm, fm, reads, opt)
    mems = [np.array(m, np.int64).reshape(-1, 5) for m in per_read]
    rows = []
    counts = []
    max_occ = int(opt.max_occ)
    for m in mems:
        c0 = len(rows)
        for x0v, _x1, sv, _qb, _qe in m.tolist():
            step = sv // max_occ if sv > max_occ else 1
            cnt = 0
            k = 0
            while k < sv and cnt < max_occ:
                rows.append(x0v + k)
                k += step
                cnt += 1
        counts.append(len(rows) - c0)
    if rows:
        # pad the SA-walk batch to pow2 (row 0 is always a valid cheap walk)
        npad = 128
        while npad < len(rows):
            npad <<= 1
        rarr = np.zeros(npad, np.int64)
        rarr[:len(rows)] = rows
        out = np.asarray(sa_dev(dg, jnp.asarray(rarr)))[:len(rows)]
    else:
        out = np.zeros(0, np.int64)
    rbegs = []
    off = 0
    for c in counts:
        rbegs.append(out[off:off + c].astype(np.int64))
        off += c
    return mems, rbegs
