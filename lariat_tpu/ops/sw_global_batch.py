"""Batched banded global alignment (ksw_global2) on device.

Scores and traceback matrices computed on device; the CIGAR walk itself is a
cheap host loop over the downloaded direction bytes (one byte per in-band
cell). Same vectorization structure as sw_batch: rows sequential, columns
elementwise + one prefix-max scan for F (gap opens come from the diagonal M).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.int32(-0x40000000)


class GlobalBatchResult(NamedTuple):
    score: jnp.ndarray   # (B,)
    z: jnp.ndarray       # (B, Lt, n_col) uint8 direction bytes
    beg: jnp.ndarray     # (B, Lt) band start per row (for traceback decode)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins", "e_ins",
                                             "n_col"))
def global_batch(query: jnp.ndarray, qlen: jnp.ndarray,
                 target: jnp.ndarray, tlen: jnp.ndarray,
                 mat: jnp.ndarray, w: jnp.ndarray, n_col: int,
                 o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                 e_ins: int = 1) -> GlobalBatchResult:
    """Banded global DP for a batch of tasks; per-task band width w.

    n_col must be >= max(min(qlen_i, 2*w_i+1)); direction bytes for row i are
    stored at columns [0, end_i-beg_i).
    """
    B, Lq = query.shape
    Lt = target.shape[1]
    query = query.astype(jnp.int32)
    target = target.astype(jnp.int32)
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    w = w.astype(jnp.int32)
    mat = mat.astype(jnp.int32)
    gapoe_del = o_del + e_del
    gapoe_ins = o_ins + e_ins

    jidx = jnp.arange(Lq + 1, dtype=jnp.int32)[None, :]
    jr = jnp.arange(Lq, dtype=jnp.int32)[None, :]

    # first row: eh_h[0]=0; eh_h[j] = -(o_ins + e_ins*j) for 1<=j<=min(qlen,w)
    row0 = jnp.where(
        (jidx >= 1) & (jidx <= jnp.minimum(qlen, w)[:, None]),
        -(o_ins + e_ins * jidx), NEG)
    row0 = jnp.where(jidx == 0, 0, row0)
    eh_h0 = row0.astype(jnp.int32)
    eh_e0 = jnp.full((B, Lq + 1), NEG, jnp.int32)

    qsub = mat[:, query.reshape(-1)].reshape(5, B, Lq)

    class _S(NamedTuple):
        eh_h: jnp.ndarray
        eh_e: jnp.ndarray
        z: jnp.ndarray
        begs: jnp.ndarray

    init = _S(eh_h0, eh_e0,
              jnp.zeros((B, Lt, n_col), jnp.uint8),
              jnp.zeros((B, Lt), jnp.int32))

    def row_step(i, s: _S) -> _S:
        i32 = jnp.int32(i)
        in_row = i32 < tlen
        beg = jnp.maximum(i32 - w, 0)
        end = jnp.minimum(i32 + w + 1, qlen)
        band = (jr >= beg[:, None]) & (jr < end[:, None])
        h1_init = jnp.where(beg == 0, -(o_del + e_del * (i32 + 1)), NEG)
        tcode = target[:, jnp.minimum(i32, Lt - 1)]
        sub = jnp.take_along_axis(
            qsub, tcode[None, :, None].astype(jnp.int32), axis=0)[0]
        M = s.eh_h[:, :Lq] + sub
        E = s.eh_e[:, :Lq]
        # F scan (no zero floor; NEG flows)
        a = jnp.where(band, (M - gapoe_ins) + jr * e_ins, NEG)
        run = jax.lax.associative_scan(jnp.maximum, a, axis=1)
        F = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32),
             run[:, :-1] - jr[:, :-1] * e_ins], axis=1)
        F = jnp.where(jr == beg[:, None], NEG, F)
        # bwa-exact: f starts at the FINITE NEG sentinel at band start and
        # decays by e_ins per column; the decayed sentinel can win the strict
        # f>t comparison at the left band edge (flips F-extend bits there)
        F = jnp.maximum(F, NEG - (jr - beg[:, None]) * e_ins)
        d = jnp.where(M >= E, 0, 1).astype(jnp.uint8)
        h = jnp.maximum(M, E)
        d = jnp.where(h >= F, d, jnp.uint8(2))
        h = jnp.maximum(h, F)
        e_ext = E - e_del
        e_open = M - gapoe_del
        d = d | ((e_ext > e_open).astype(jnp.uint8) << 2)
        f_ext = F - e_ins
        f_open = M - gapoe_ins
        # F-extend marker is VALUE 2 at bits 4-5 (C: d |= 2<<4)
        d = d | ((f_ext > f_open).astype(jnp.uint8) << 5)
        d = jnp.where(band, d, jnp.uint8(0))
        # pack the band columns [beg, end) into z[:, i, 0:end-beg] via gather
        cidx = beg[:, None] + jnp.arange(n_col, dtype=jnp.int32)[None, :]
        zrow = jnp.take_along_axis(
            jnp.concatenate([d, jnp.zeros((B, 1), jnp.uint8)], axis=1),
            jnp.clip(cidx, 0, Lq), axis=1)
        zrow = jnp.where(cidx < end[:, None], zrow, jnp.uint8(0))
        # write-back
        h_shift = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), h], axis=1)
        wmask = (jidx > beg[:, None]) & (jidx <= end[:, None])
        eh_h = jnp.where(wmask, h_shift, s.eh_h)
        eh_h = jnp.where(jidx == beg[:, None], h1_init[:, None], eh_h)
        e_new = jnp.maximum(e_ext, e_open)
        e_pad = jnp.concatenate([e_new, jnp.full((B, 1), NEG, jnp.int32)],
                                axis=1)
        emask = (jidx >= beg[:, None]) & (jidx < end[:, None])
        eh_e = jnp.where(emask, e_pad, s.eh_e)
        eh_e = jnp.where(jidx == end[:, None], NEG, eh_e)
        keep = in_row
        return _S(jnp.where(keep[:, None], eh_h, s.eh_h),
                  jnp.where(keep[:, None], eh_e, s.eh_e),
                  s.z.at[:, i, :].set(jnp.where(keep[:, None], zrow,
                                                s.z[:, i, :])),
                  s.begs.at[:, i].set(jnp.where(keep, beg, 0)))

    final = jax.lax.fori_loop(0, Lt, row_step, init)
    score = jnp.take_along_axis(final.eh_h, qlen[:, None], axis=1)[:, 0]
    return GlobalBatchResult(score=score, z=final.z, beg=final.begs)


def traceback_batch(zs: np.ndarray, begs: np.ndarray, qlens, tlens, ws
                    ) -> List[List[Tuple[int, int]]]:
    """CIGAR walks for a batch of band-packed (B, Lt, n_col) z buffers.

    Native C++ walker when built (beg recomputed from w per row, matching
    ``traceback``); Python fallback otherwise.
    """
    B = len(qlens)
    from ..index.suffix import _load_native
    lib = _load_native()
    if lib is not None and hasattr(lib, "ksw_traceback_packed_batch"):
        import ctypes
        z = np.ascontiguousarray(zs[:B], dtype=np.uint8)
        qv = np.asarray(qlens, dtype=np.int32)
        tv = np.asarray(tlens, dtype=np.int32)
        wv = np.asarray(ws, dtype=np.int32)
        cap = int(qv.max() + tv.max() + 2) if B else 1
        cig = np.empty((B, 2 * cap), dtype=np.int32)
        nops = np.empty(B, dtype=np.int32)
        i64 = ctypes.c_int64
        lib.ksw_traceback_packed_batch(
            ctypes.c_void_p(z.ctypes.data), i64(B), i64(z.shape[1]),
            i64(z.shape[2]), ctypes.c_void_p(qv.ctypes.data),
            ctypes.c_void_p(tv.ctypes.data), ctypes.c_void_p(wv.ctypes.data),
            ctypes.c_void_p(cig.ctypes.data), i64(cap),
            ctypes.c_void_p(nops.ctypes.data))
        out = []
        for b in range(B):
            n = int(nops[b])
            if n < 0:
                out.append(traceback(zs[b], begs[b], int(qv[b]), int(tv[b]),
                                     int(wv[b])))
                continue
            flat = cig[b, :2 * n].tolist()
            out.append(list(zip(flat[0::2], flat[1::2])))
        return out
    return [traceback(zs[b], begs[b], int(qlens[b]), int(tlens[b]),
                      int(ws[b])) for b in range(B)]


def traceback(z: np.ndarray, begs: np.ndarray, qlen: int, tlen: int,
              w: int) -> List[Tuple[int, int]]:
    """Host CIGAR walk over one task's direction bytes (ksw_global2 backtrack).

    Ops: 0=M, 1=I (query), 2=D (target).
    """
    cigar: List[Tuple[int, int]] = []

    def push(op, ln):
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + ln)
        else:
            cigar.append((op, ln))

    which = 0
    i = tlen - 1
    k = min(i + w + 1, qlen) - 1
    while i >= 0 and k >= 0:
        beg = int(begs[i])
        which = (int(z[i, k - beg]) >> (which << 1)) & 3
        if which == 0:
            push(0, 1)
            i -= 1
            k -= 1
        elif which == 1:
            push(2, 1)
            i -= 1
        else:
            push(1, 1)
            k -= 1
    if i >= 0:
        push(2, i + 1)
    if k >= 0:
        push(1, k + 1)
    cigar.reverse()
    return cigar
