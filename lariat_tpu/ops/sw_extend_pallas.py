"""Pallas TPU kernel for batched Smith-Waterman extension.

Same math as ``sw_batch.extend_batch`` (ksw_extend2 semantics) but with the
whole DP state resident in VMEM and the row loop inside the kernel.

Layout: TRANSPOSED — tasks on the lane axis (128 per kernel call), query
position on sublanes. Every per-task scalar is then a native (1, 128) row and
reductions over the query run down sublanes; this avoids the degenerate
lane-1 vector layouts that the Mosaic compiler mishandles (multiple (T, 1)
loop carries crash it). The batch is processed in 128-task chunks unrolled at
trace time; all chunks share one compiled kernel.

Pitfalls encoded here (learned the hard way):
 - bare Python ints inside jnp.where become weak int64 scalars under x64 and
   Mosaic cannot lower the s64->s32 scalar convert: use typed jnp.int32
   constants;
 - select between bool arrays lowers to an unsupported i1 truncation: use
   logical ops;
 - dynamic lane/sublane slicing with unaligned traced offsets is rejected:
   extract rows with mask-reduce tricks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw_batch import ExtendBatchResult, _adjust_w

NEG = -0x40000000  # plain int; kernels must not capture traced constants
LANES = 128


def _cummax_sublanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max along axis 0 (log-step shift-max)."""
    n = x.shape[0]
    d = 1
    while d < n:
        shifted = jnp.concatenate(
            [jnp.full((d,) + x.shape[1:], NEG, x.dtype), x[:-d]], axis=0)
        x = jnp.maximum(x, shifted)
        d *= 2
    return x


def _extend_kernel(q_ref, t_ref, params_ref, out_ref, ehh_ref, ehe_ref,
                   *, Lt: int, o_del: int, e_del: int, o_ins: int, e_ins: int,
                   zdrop: int, match_sc: int, mismatch_sc: int, n_sc: int):
    Lq, T = q_ref.shape          # T == LANES
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    qlen = params_ref[0:1, :]    # (1, T)
    tlen = params_ref[1:2, :]
    w = params_ref[2:3, :]
    h0 = params_ref[3:4, :]
    z = jnp.int32(0)
    negv = jnp.int32(NEG)
    one = jnp.int32(1)
    k1024 = jnp.int32(1024)
    jid1 = jax.lax.broadcasted_iota(jnp.int32, (Lq + 1, T), 0)
    jr = jax.lax.broadcasted_iota(jnp.int32, (Lq, T), 0)
    # first row of eh_h: closed form of the scalar init chain
    row0 = h0 - oe_ins - (jid1 - 1) * e_ins
    row0 = jnp.where(row0 > 0, row0, z)
    row0 = jnp.where(jid1 == 0, h0, row0)
    row0 = jnp.where(jid1 <= qlen, row0, z)
    ehh_ref[:] = row0
    ehe_ref[:] = jnp.zeros((Lq + 1, T), jnp.int32)

    state0 = (jnp.where((tlen > 0) & (qlen > 0), one, z),  # alive (1,T) int32
              h0,                                    # max_score
              jnp.full((1, T), -1, jnp.int32),       # max_i
              jnp.full((1, T), -1, jnp.int32),       # max_j
              jnp.full((1, T), -1, jnp.int32),       # max_ie
              jnp.full((1, T), -1, jnp.int32),       # gscore
              jnp.zeros((1, T), jnp.int32))          # max_off

    def row_step(i, st):
        alive, max_score, max_i, max_j, max_ie, gscore, max_off = st
        i32 = jnp.int32(i)
        in_row = (alive != 0) & (i32 < tlen)
        beg = jnp.maximum(i32 - w, z)
        end = jnp.minimum(i32 + w + 1, qlen)
        band = (jr >= beg) & (jr < end)
        h1_init = jnp.where(beg == 0,
                            jnp.maximum(h0 - (o_del + e_del * (i32 + 1)), 0),
                            z)
        # extract target row i via mask-reduce (no dynamic sublane slicing)
        jrt = jax.lax.broadcasted_iota(jnp.int32, (Lt, T), 0)
        tcode = jnp.max(jnp.where(jrt == i32, t_ref[:], z), axis=0,
                        keepdims=True)
        tcode = jnp.where(i32 >= Lt, z, tcode)
        # substitution scores inline (uniform bwa matrix: match/mismatch/N)
        qc = q_ref[:]
        is_n = (qc >= 4) | (tcode >= 4)
        sub = jnp.where(is_n, jnp.int32(n_sc),
                        jnp.where(qc == tcode, jnp.int32(match_sc),
                                  jnp.int32(mismatch_sc)))
        M = ehh_ref[:Lq, :]
        E = ehe_ref[:Lq, :]
        M = jnp.where(M != 0, M + sub, z)
        M = jnp.where(band, M, z)
        mfloor = jnp.maximum(M - oe_ins, 0)
        a = jnp.where(band, mfloor + jr * e_ins, negv)
        run = _cummax_sublanes(a)
        F = jnp.concatenate(
            [jnp.full((1, T), NEG, jnp.int32), run[:-1] - jr[:-1] * e_ins],
            axis=0)
        F = jnp.maximum(F, 0)
        F = jnp.where(jr == beg, z, F)
        h = jnp.maximum(jnp.maximum(M, jnp.where(band, E, z)), F)
        h = jnp.where(band, h, z)
        # gscore at row end-1 when the band reaches qlen (h >= 0)
        lastmask = (jr == jnp.maximum(end - 1, z)).astype(jnp.int32)
        h_last = jnp.max(h * lastmask, axis=0, keepdims=True)
        nonempty = beg < end
        at_qend = in_row & ((nonempty & (end == qlen))
                            | ((~nonempty) & (beg == qlen)))
        h_last = jnp.where(nonempty, h_last, z)
        better_g = at_qend & (gscore < h_last)
        gscore = jnp.where(better_g, h_last, gscore)
        max_ie = jnp.where(better_g, i32, max_ie)
        # single packed max -> row max and its LAST argmax (C tie-break):
        # h >= 0 and Lq < 1024
        pmax = jnp.max(h * k1024 + jr, axis=0, keepdims=True)
        m_best = pmax // k1024
        mj = pmax - m_best * k1024
        improved = in_row & (m_best > max_score)
        new_off = jnp.maximum(max_off, jnp.abs(mj - i32))
        max_off = jnp.where(improved, new_off, max_off)
        max_score_n = jnp.where(improved, m_best, max_score)
        max_i_n = jnp.where(improved, i32, max_i)
        max_j_n = jnp.where(improved, mj, max_j)
        di = i32 - max_i
        dj = mj - max_j
        del_side = di > dj
        zcond = ((del_side & (max_score - m_best - (di - dj) * e_del > zdrop))
                 | ((~del_side)
                    & (max_score - m_best - (dj - di) * e_ins > zdrop)))
        died = in_row & ((m_best == 0) | ((~improved) & zcond))
        alive_n = jnp.where((alive != 0) & (i32 + 1 < tlen) & (~died), one, z)
        # write-backs (masked by in_row)
        h_shift = jnp.concatenate([jnp.zeros((1, T), jnp.int32), h], axis=0)
        wmask = (jid1 > beg) & (jid1 <= end)
        ehh_new = jnp.where(wmask, h_shift, ehh_ref[:])
        ehh_new = jnp.where(jid1 == beg, h1_init, ehh_new)
        e_new = jnp.maximum(E - e_del, jnp.maximum(M - oe_del, 0))
        e_pad = jnp.concatenate([e_new, jnp.zeros((1, T), jnp.int32)], axis=0)
        emask = (jid1 >= beg) & (jid1 < end)
        ehe_new = jnp.where(emask, e_pad, ehe_ref[:])
        ehe_new = jnp.where(jid1 == end, z, ehe_new)
        ehh_ref[:] = jnp.where(in_row, ehh_new, ehh_ref[:])
        ehe_ref[:] = jnp.where(in_row, ehe_new, ehe_ref[:])
        return (jnp.where(in_row, alive_n, alive),
                jnp.where(in_row, max_score_n, max_score),
                jnp.where(in_row, max_i_n, max_i),
                jnp.where(in_row, max_j_n, max_j),
                max_ie, gscore, max_off)

    (alive, max_score, max_i, max_j, max_ie, gscore, max_off) = \
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(Lt), row_step, state0)
    empty = qlen == 0
    rows = [
        jnp.where(empty, h0, max_score),
        jnp.where(empty, z, max_j + 1),
        jnp.where(empty, z, max_i + 1),
        jnp.where(empty, z, max_ie + 1),
        jnp.where(empty, h0, gscore),
        jnp.where(empty, z, max_off),
    ]
    # assemble the (8, T) output via sublane select (concat of (1, T) rows is
    # another degenerate-layout trap)
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, T), 0)
    outv = jnp.zeros((8, T), jnp.int32)
    for k, r in enumerate(rows):
        outv = jnp.where(rid == k, r, outv)
    out_ref[:] = outv


def _extend_kernel_v2(q_ref, t_ref, params_ref, out_ref, ehh_ref, ehe_ref,
                      *, Lt: int, o_del: int, e_del: int, o_ins: int,
                      e_ins: int, zdrop: int, match_sc: int,
                      mismatch_sc: int, n_sc: int):
    """v2 of _extend_kernel: same math, restructured for the chip.

    - t_ref is (Lt//8, 8, T): the row loop walks 8-row groups via dynamic
      LEADING-dim indexing (supported by Mosaic) + static in-group slices,
      replacing v1's per-row (Lt, T) mask-reduce extraction (which cost
      about as much as the DP itself);
    - groups beyond every lane's tlen are skipped with a scalar branch;
    - loop-invariant iotas hoisted.
    Driven by a grid over lane chunks (one pallas_call per wave instead
    of B/128 sequential calls).
    """
    Lq, T = q_ref.shape
    G = t_ref.shape[0]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    qlen = params_ref[0:1, :]
    tlen = params_ref[1:2, :]
    w = params_ref[2:3, :]
    h0 = params_ref[3:4, :]
    z = jnp.int32(0)
    negv = jnp.int32(NEG)
    one = jnp.int32(1)
    k1024 = jnp.int32(1024)
    jid1 = jax.lax.broadcasted_iota(jnp.int32, (Lq + 1, T), 0)
    jr = jax.lax.broadcasted_iota(jnp.int32, (Lq, T), 0)
    row0 = h0 - oe_ins - (jid1 - 1) * e_ins
    row0 = jnp.where(row0 > 0, row0, z)
    row0 = jnp.where(jid1 == 0, h0, row0)
    row0 = jnp.where(jid1 <= qlen, row0, z)
    ehh_ref[:] = row0
    ehe_ref[:] = jnp.zeros((Lq + 1, T), jnp.int32)
    qc = q_ref[:]
    q_is_n = qc >= 4
    tmax = jnp.max(tlen)

    state0 = (jnp.where((tlen > 0) & (qlen > 0), one, z),  # alive
              h0,                                    # max_score
              jnp.full((1, T), -1, jnp.int32),       # max_i
              jnp.full((1, T), -1, jnp.int32),       # max_j
              jnp.full((1, T), -1, jnp.int32),       # max_ie
              jnp.full((1, T), -1, jnp.int32),       # gscore
              jnp.zeros((1, T), jnp.int32))          # max_off

    def row_step(i32, tcode, st):
        alive, max_score, max_i, max_j, max_ie, gscore, max_off = st
        in_row = (alive != 0) & (i32 < tlen)
        beg = jnp.maximum(i32 - w, z)
        end = jnp.minimum(i32 + w + 1, qlen)
        band = (jr >= beg) & (jr < end)
        h1_init = jnp.where(beg == 0,
                            jnp.maximum(h0 - (o_del + e_del * (i32 + 1)), 0),
                            z)
        is_n = q_is_n | (tcode >= 4)
        sub = jnp.where(is_n, jnp.int32(n_sc),
                        jnp.where(qc == tcode, jnp.int32(match_sc),
                                  jnp.int32(mismatch_sc)))
        M = ehh_ref[:Lq, :]
        E = ehe_ref[:Lq, :]
        M = jnp.where(M != 0, M + sub, z)
        M = jnp.where(band, M, z)
        mfloor = jnp.maximum(M - oe_ins, 0)
        a = jnp.where(band, mfloor + jr * e_ins, negv)
        run = _cummax_sublanes(a)
        F = jnp.concatenate(
            [jnp.full((1, T), NEG, jnp.int32), run[:-1] - jr[:-1] * e_ins],
            axis=0)
        F = jnp.maximum(F, 0)
        F = jnp.where(jr == beg, z, F)
        h = jnp.maximum(jnp.maximum(M, jnp.where(band, E, z)), F)
        h = jnp.where(band, h, z)
        lastmask = (jr == jnp.maximum(end - 1, z)).astype(jnp.int32)
        h_last = jnp.max(h * lastmask, axis=0, keepdims=True)
        nonempty = beg < end
        at_qend = in_row & ((nonempty & (end == qlen))
                            | ((~nonempty) & (beg == qlen)))
        h_last = jnp.where(nonempty, h_last, z)
        better_g = at_qend & (gscore < h_last)
        gscore = jnp.where(better_g, h_last, gscore)
        max_ie = jnp.where(better_g, i32, max_ie)
        pmax = jnp.max(h * k1024 + jr, axis=0, keepdims=True)
        m_best = pmax // k1024
        mj = pmax - m_best * k1024
        improved = in_row & (m_best > max_score)
        new_off = jnp.maximum(max_off, jnp.abs(mj - i32))
        max_off = jnp.where(improved, new_off, max_off)
        max_score_n = jnp.where(improved, m_best, max_score)
        max_i_n = jnp.where(improved, i32, max_i)
        max_j_n = jnp.where(improved, mj, max_j)
        di = i32 - max_i
        dj = mj - max_j
        del_side = di > dj
        zcond = ((del_side & (max_score - m_best - (di - dj) * e_del > zdrop))
                 | ((~del_side)
                    & (max_score - m_best - (dj - di) * e_ins > zdrop)))
        died = in_row & ((m_best == 0) | ((~improved) & zcond))
        alive_n = jnp.where((alive != 0) & (i32 + 1 < tlen) & (~died), one, z)
        h_shift = jnp.concatenate([jnp.zeros((1, T), jnp.int32), h], axis=0)
        wmask = (jid1 > beg) & (jid1 <= end)
        ehh_new = jnp.where(wmask, h_shift, ehh_ref[:])
        ehh_new = jnp.where(jid1 == beg, h1_init, ehh_new)
        e_new = jnp.maximum(E - e_del, jnp.maximum(M - oe_del, 0))
        e_pad = jnp.concatenate([e_new, jnp.zeros((1, T), jnp.int32)], axis=0)
        emask = (jid1 >= beg) & (jid1 < end)
        ehe_new = jnp.where(emask, e_pad, ehe_ref[:])
        ehe_new = jnp.where(jid1 == end, z, ehe_new)
        ehh_ref[:] = jnp.where(in_row, ehh_new, ehh_ref[:])
        ehe_ref[:] = jnp.where(in_row, ehe_new, ehe_ref[:])
        return (jnp.where(in_row, alive_n, alive),
                jnp.where(in_row, max_score_n, max_score),
                jnp.where(in_row, max_i_n, max_i),
                jnp.where(in_row, max_j_n, max_j),
                max_ie, gscore, max_off)

    def group_step(g, st):
        t8 = t_ref[g]                      # (8, T) dynamic leading index
        for k in range(8):
            st = row_step(g * 8 + jnp.int32(k), t8[k:k + 1, :], st)
        return st

    del tmax  # dynamic loop bounds recurse in Mosaic tracing; static it is
    out = jax.lax.fori_loop(jnp.int32(0), jnp.int32(G), group_step, state0)
    (alive, max_score, max_i, max_j, max_ie, gscore, max_off) = out
    empty = qlen == 0
    rows = [
        jnp.where(empty, h0, max_score),
        jnp.where(empty, z, max_j + 1),
        jnp.where(empty, z, max_i + 1),
        jnp.where(empty, z, max_ie + 1),
        jnp.where(empty, h0, gscore),
        jnp.where(empty, z, max_off),
    ]
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, T), 0)
    outv = jnp.zeros((8, T), jnp.int32)
    for k, r in enumerate(rows):
        outv = jnp.where(rid == k, r, outv)
    out_ref[:] = outv


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "end_bonus", "zdrop",
                                             "tile_b", "interpret",
                                             "match_sc", "mismatch_sc",
                                             "n_sc", "packed"))
def extend_batch_pallas_v2(query: jnp.ndarray, qlen: jnp.ndarray,
                           target: jnp.ndarray, tlen: jnp.ndarray,
                           mat: jnp.ndarray, w: jnp.ndarray,
                           h0: jnp.ndarray, o_del: int = 6, e_del: int = 1,
                           o_ins: int = 6, e_ins: int = 1,
                           end_bonus: int = 5, zdrop: int = 100,
                           tile_b: int = LANES, interpret: bool = False,
                           match_sc: int = 1, mismatch_sc: int = -4,
                           n_sc: int = -1, packed: bool = False
                           ) -> ExtendBatchResult:
    """Grid-driven v2 of extend_batch_pallas (same results, one
    pallas_call per wave, grouped target rows)."""
    del mat
    B, Lq = query.shape
    Lt = target.shape[1]
    Lt8 = -(-Lt // 8) * 8
    query = query.astype(jnp.int32)
    target = target.astype(jnp.int32)
    if Lt8 != Lt:
        target = jnp.pad(target, ((0, 0), (0, Lt8 - Lt)))
        Lt = Lt8
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    h0 = h0.astype(jnp.int32)
    w = _adjust_w(qlen, w.astype(jnp.int32), jnp.int32(match_sc),
                  end_bonus, o_ins, e_ins, o_del, e_del)
    Bp = (B + tile_b - 1) // tile_b * tile_b
    padn = Bp - B
    if padn:
        query = jnp.pad(query, ((0, padn), (0, 0)))
        target = jnp.pad(target, ((0, padn), (0, 0)))
        qlen = jnp.pad(qlen, (0, padn))
        tlen = jnp.pad(tlen, (0, padn))
        w = jnp.pad(w, (0, padn))
        h0 = jnp.pad(h0, (0, padn))
    params = jnp.zeros((Bp, 8), jnp.int32)
    params = params.at[:, 0].set(qlen).at[:, 1].set(tlen)
    params = params.at[:, 2].set(w).at[:, 3].set(h0)
    kernel = functools.partial(_extend_kernel_v2, Lt=Lt, o_del=o_del,
                               e_del=e_del, o_ins=o_ins, e_ins=e_ins,
                               zdrop=zdrop, match_sc=match_sc,
                               mismatch_sc=mismatch_sc, n_sc=n_sc)
    qT = query.T                                   # (Lq, Bp)
    tT = target.T.reshape(Lt // 8, 8, Bp)          # row groups
    pT = params.T                                  # (8, Bp)
    import numpy as _np
    z32 = _np.int32(0)   # literal 0 traces as i64 under x64 and Mosaic
    # rejects the index-map's (i64, i32) return — type it (numpy scalar:
    # index maps must not capture traced constants)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((Lq, tile_b), lambda i: (z32, i)),
            pl.BlockSpec((Lt // 8, 8, tile_b), lambda i: (z32, z32, i)),
            pl.BlockSpec((8, tile_b), lambda i: (z32, i)),
        ],
        out_specs=pl.BlockSpec((8, tile_b), lambda i: (z32, i)),
        out_shape=jax.ShapeDtypeStruct((8, Bp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Lq + 1, tile_b), jnp.int32),
            pltpu.VMEM((Lq + 1, tile_b), jnp.int32),
        ],
        interpret=interpret,
    )(qT, tT, pT)
    out = out[:, :B]
    if packed:
        return out
    return ExtendBatchResult(score=out[0], qle=out[1], tle=out[2],
                             gtle=out[3], gscore=out[4], max_off=out[5])


def extend_batch_pallas(*args, **kw):
    """Pallas ksw_extend2 over a task batch — dispatches to the chunked v1
    kernel (default) or the grid v2 (LARIAT_EXTEND_V2=1).

    v1 measured faster on chip at the production tier (8192x192x576:
    74.9 ms vs 79.2; mixed tlen 67.2 vs 73.5 — v2's dynamic group skip
    never pays for its leading-dim indexing on this shape set)."""
    import os
    if os.environ.get("LARIAT_EXTEND_V2") == "1":
        return extend_batch_pallas_v2(*args, **kw)
    return _extend_batch_pallas_v1(*args, **kw)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "end_bonus", "zdrop",
                                             "tile_b", "interpret",
                                             "match_sc", "mismatch_sc",
                                             "n_sc", "packed"))
def _extend_batch_pallas_v1(query: jnp.ndarray, qlen: jnp.ndarray,
                            target: jnp.ndarray, tlen: jnp.ndarray,
                            mat: jnp.ndarray, w: jnp.ndarray,
                            h0: jnp.ndarray,
                            o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                            e_ins: int = 1, end_bonus: int = 5,
                            zdrop: int = 100,
                            tile_b: int = LANES, interpret: bool = False,
                            match_sc: int = 1, mismatch_sc: int = -4,
                            n_sc: int = -1, packed: bool = False
                            ) -> ExtendBatchResult:
    """Chunked v1 kernel (one pallas_call per 128-lane chunk).

    ``mat`` must be the uniform bwa matrix implied by match_sc/mismatch_sc/
    n_sc (checked by the equality tests)."""
    del mat
    B, Lq = query.shape
    Lt = target.shape[1]
    query = query.astype(jnp.int32)
    target = target.astype(jnp.int32)
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    h0 = h0.astype(jnp.int32)
    w = _adjust_w(qlen, w.astype(jnp.int32), jnp.int32(match_sc),
                  end_bonus, o_ins, e_ins, o_del, e_del)
    Bp = (B + tile_b - 1) // tile_b * tile_b
    padn = Bp - B
    if padn:
        query = jnp.pad(query, ((0, padn), (0, 0)))
        target = jnp.pad(target, ((0, padn), (0, 0)))
        qlen = jnp.pad(qlen, (0, padn))
        tlen = jnp.pad(tlen, (0, padn))
        w = jnp.pad(w, (0, padn))
        h0 = jnp.pad(h0, (0, padn))
    params = jnp.zeros((Bp, 8), jnp.int32)
    params = params.at[:, 0].set(qlen).at[:, 1].set(tlen)
    params = params.at[:, 2].set(w).at[:, 3].set(h0)
    kernel = functools.partial(_extend_kernel, Lt=Lt, o_del=o_del,
                               e_del=e_del, o_ins=o_ins, e_ins=e_ins,
                               zdrop=zdrop, match_sc=match_sc,
                               mismatch_sc=mismatch_sc, n_sc=n_sc)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, tile_b), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Lq + 1, tile_b), jnp.int32),
            pltpu.VMEM((Lq + 1, tile_b), jnp.int32),
        ],
        interpret=interpret,
    )
    chunks = []
    for c0 in range(0, Bp, tile_b):
        sl = slice(c0, c0 + tile_b)
        chunks.append(call(query[sl].T, target[sl].T, params[sl].T))
    out = jnp.concatenate(chunks, axis=1)[:, :B]   # (8, B)
    if packed:
        # one device buffer: a remote-tunnel caller downloads the whole wave
        # result in a single transfer instead of six (each np.asarray on a
        # separate jit output is its own ~60 ms round trip over the link)
        return out
    return ExtendBatchResult(score=out[0], qle=out[1], tle=out[2],
                             gtle=out[3], gscore=out[4], max_off=out[5])
