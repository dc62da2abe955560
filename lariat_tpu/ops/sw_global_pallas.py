"""Pallas TPU kernel for batched banded global alignment (ksw_global2).

Same math as ``sw_global_batch.global_batch`` but with the DP state in VMEM
and the row loop in-kernel (see sw_extend_pallas for the layout rationale:
tasks on lanes, query position on sublanes, gridless chunked calls).

Differences from that module's XLA version:
 - direction bytes are stored UNPACKED at (row, query_pos) — no band-relative
   column shifting — so the host traceback indexes z[i, j] directly;
 - scores come back packed in a (8, T) int32 row block.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw_extend_pallas import LANES, _cummax_sublanes

NEG = -0x40000000


class GlobalPallasResult(NamedTuple):
    score: jnp.ndarray   # (B,) int32
    z: jnp.ndarray       # (B, Lt, Lq) uint8 direction bytes (unpacked)


class GlobalPallasPacked(NamedTuple):
    score: jnp.ndarray   # (B,) int32
    z: jnp.ndarray       # (B, Lt, n_col) uint8, row i at cols [0, end-beg)
    beg: jnp.ndarray     # (B, Lt) int32 band start per row


def _global_kernel(q_ref, t_ref, params_ref, score_ref, z_ref,
                   ehh_ref, ehe_ref,
                   *, Lt: int, o_del: int, e_del: int, o_ins: int,
                   e_ins: int, match_sc: int, mismatch_sc: int, n_sc: int):
    Lq, T = q_ref.shape
    gapoe_del = o_del + e_del
    gapoe_ins = o_ins + e_ins
    qlen = params_ref[0:1, :]
    tlen = params_ref[1:2, :]
    w = params_ref[2:3, :]
    z = jnp.int32(0)
    negv = jnp.int32(NEG)
    jid1 = jax.lax.broadcasted_iota(jnp.int32, (Lq + 1, T), 0)
    jr = jax.lax.broadcasted_iota(jnp.int32, (Lq, T), 0)
    # first row: eh_h[0]=0; eh_h[j] = -(o_ins+e_ins*j) for 1<=j<=min(qlen,w)
    row0 = jnp.where((jid1 >= 1) & (jid1 <= jnp.minimum(qlen, w)),
                     -(o_ins + e_ins * jid1), negv)
    row0 = jnp.where(jid1 == 0, z, row0)
    ehh_ref[:] = row0
    ehe_ref[:] = jnp.full((Lq + 1, T), NEG, jnp.int32)

    def row_step(i, carry):
        i32 = jnp.int32(i)
        in_row = i32 < tlen
        beg = jnp.maximum(i32 - w, z)
        end = jnp.minimum(i32 + w + 1, qlen)
        band = (jr >= beg) & (jr < end)
        h1_init = jnp.where(beg == 0, -(o_del + e_del * (i32 + 1)), negv)
        jrt = jax.lax.broadcasted_iota(jnp.int32, (Lt, T), 0)
        tcode = jnp.max(jnp.where(jrt == i32, t_ref[:], z), axis=0,
                        keepdims=True)
        tcode = jnp.where(i32 >= Lt, z, tcode)
        qc = q_ref[:]
        is_n = (qc >= 4) | (tcode >= 4)
        sub = jnp.where(is_n, jnp.int32(n_sc),
                        jnp.where(qc == tcode, jnp.int32(match_sc),
                                  jnp.int32(mismatch_sc)))
        M = ehh_ref[:Lq, :] + sub
        E = ehe_ref[:Lq, :]
        F = _cummax_sublanes(
            jnp.where(band, (M - gapoe_ins) + jr * e_ins, negv))
        F = jnp.concatenate(
            [jnp.full((1, T), NEG, jnp.int32), F[:-1] - jr[:-1] * e_ins],
            axis=0)
        F = jnp.where(jr == beg, negv, F)
        # bwa-exact: f starts at the FINITE NEG sentinel at band start and
        # decays by e_ins per column; the decayed sentinel can win the strict
        # f>t comparison at the left band edge (flips F-extend bits there)
        F = jnp.maximum(F, negv - (jr - beg) * e_ins)
        d = jnp.where(M >= E, z, jnp.int32(1))
        h = jnp.maximum(M, E)
        d = jnp.where(h >= F, d, jnp.int32(2))
        h = jnp.maximum(h, F)
        e_ext = E - e_del
        e_open = M - gapoe_del
        d = d | (jnp.where(e_ext > e_open, jnp.int32(1), z) << 2)
        f_ext = F - e_ins
        f_open = M - gapoe_ins
        d = d | (jnp.where(f_ext > f_open, jnp.int32(2), z) << 4)
        d = jnp.where(band, d, z)
        # direction bytes for 4 consecutive rows pack into ONE int32 plane:
        # a per-row uint8 store lowers to a read-modify-write of packed
        # 8-bit tiles and cost ~170x the DP math (311 ms vs ~3 ms of
        # vector work per 2048x192x192 wave, measured); the int32 store is
        # a native tile write. Row i lands in byte (i & 3) of z_ref[i>>2];
        # intermediate stores of a partially-filled word are simply
        # overwritten by the final one.
        sub_i = i32 & jnp.int32(3)
        acc = jnp.where(sub_i == 0, d, carry | (d << (8 * sub_i)))
        z_ref[i32 >> 2] = acc
        # write-backs
        h_shift = jnp.concatenate([jnp.zeros((1, T), jnp.int32), h], axis=0)
        wmask = (jid1 > beg) & (jid1 <= end)
        ehh_new = jnp.where(wmask, h_shift, ehh_ref[:])
        ehh_new = jnp.where(jid1 == beg, h1_init, ehh_new)
        e_new = jnp.maximum(e_ext, e_open)
        e_pad = jnp.concatenate([e_new, jnp.full((1, T), NEG, jnp.int32)],
                                axis=0)
        emask = (jid1 >= beg) & (jid1 < end)
        ehe_new = jnp.where(emask, e_pad, ehe_ref[:])
        ehe_new = jnp.where(jid1 == end, negv, ehe_new)
        ehh_ref[:] = jnp.where(in_row, ehh_new, ehh_ref[:])
        ehe_ref[:] = jnp.where(in_row, ehe_new, ehe_ref[:])
        return acc

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(Lt), row_step,
                      jnp.zeros((Lq, T), jnp.int32))
    # score = eh_h[qlen] (invariant: holds H(tlen-1, qlen-1))
    lastmask = (jid1 == qlen).astype(jnp.int32)
    score = jnp.max(jnp.where(lastmask != 0, ehh_ref[:], negv), axis=0,
                    keepdims=True)
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, T), 0)
    score_ref[:] = jnp.where(rid == 0, score, z)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "tile_b", "interpret",
                                             "match_sc", "mismatch_sc",
                                             "n_sc"))
def global_batch_pallas(query: jnp.ndarray, qlen: jnp.ndarray,
                        target: jnp.ndarray, tlen: jnp.ndarray,
                        mat: jnp.ndarray, w: jnp.ndarray,
                        o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                        e_ins: int = 1, tile_b: int = LANES,
                        interpret: bool = False,
                        match_sc: int = 1, mismatch_sc: int = -4,
                        n_sc: int = -1) -> GlobalPallasResult:
    """Banded global DP for a batch; returns scores + unpacked z bytes."""
    del mat
    B, Lq = query.shape
    Lt = target.shape[1]
    query = query.astype(jnp.int32)
    target = target.astype(jnp.int32)
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    w = w.astype(jnp.int32)
    Bp = (B + tile_b - 1) // tile_b * tile_b
    padn = Bp - B
    if padn:
        query = jnp.pad(query, ((0, padn), (0, 0)))
        target = jnp.pad(target, ((0, padn), (0, 0)))
        qlen = jnp.pad(qlen, (0, padn), constant_values=1)
        tlen = jnp.pad(tlen, (0, padn), constant_values=1)
        w = jnp.pad(w, (0, padn), constant_values=1)
    params = jnp.zeros((Bp, 8), jnp.int32)
    params = params.at[:, 0].set(qlen).at[:, 1].set(tlen).at[:, 2].set(w)
    kernel = functools.partial(_global_kernel, Lt=Lt, o_del=o_del,
                               e_del=e_del, o_ins=o_ins, e_ins=e_ins,
                               match_sc=match_sc, mismatch_sc=mismatch_sc,
                               n_sc=n_sc)
    Lt4 = (Lt + 3) // 4
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((8, tile_b), jnp.int32),
                   jax.ShapeDtypeStruct((Lt4, Lq, tile_b), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((Lq + 1, tile_b), jnp.int32),
            pltpu.VMEM((Lq + 1, tile_b), jnp.int32),
        ],
        interpret=interpret,
    )
    scores = []
    zs = []
    shifts = (jnp.arange(4, dtype=jnp.int32) * 8)[None, :, None, None]
    for c0 in range(0, Bp, tile_b):
        sl = slice(c0, c0 + tile_b)
        s8, z32 = call(query[sl].T, target[sl].T, params[sl].T)
        scores.append(s8[0])
        # unpack the 4-rows-per-int32 planes back to per-row bytes in XLA
        # (vector shifts — the kernel-side uint8 store this replaces was
        # the whole kernel's bottleneck)
        zb = ((z32[:, None] >> shifts) & 0xFF).astype(jnp.uint8)
        zs.append(zb.reshape(Lt4 * 4, Lq, tile_b)[:Lt])
    score = jnp.concatenate(scores)[:B]
    # (n_chunks, Lt, Lq, tile) -> (B, Lt, Lq)
    z = jnp.concatenate([zz.transpose(2, 0, 1) for zz in zs], axis=0)[:B]
    return GlobalPallasResult(score=score, z=z)


@functools.partial(jax.jit, static_argnames=("n_col",))
def _pack_band(z: jnp.ndarray, w: jnp.ndarray, n_col: int):
    """Gather band columns [beg_i, beg_i + n_col) of each row on device.

    Shrinks the device->host transfer by ~Lq/n_col (the traceback only ever
    reads in-band bytes; out-of-band bytes are zero anyway).
    """
    B, Lt, Lq = z.shape
    iidx = jnp.arange(Lt, dtype=jnp.int32)[None, :, None]
    beg = jnp.maximum(iidx - w[:, None, None].astype(jnp.int32), 0)
    cidx = beg + jnp.arange(n_col, dtype=jnp.int32)[None, None, :]
    packed = jnp.take_along_axis(z, jnp.minimum(cidx, Lq - 1), axis=2)
    packed = jnp.where(cidx <= Lq - 1, packed, jnp.uint8(0))
    return packed, beg[:, :, 0]


def global_batch_pallas_packed(query, qlen, target, tlen, mat, w, **kw
                               ) -> GlobalPallasPacked:
    """global_batch_pallas + on-device band packing (small host download).

    Walk the result with ``sw_global_batch.traceback_batch`` (packed layout).
    """
    res = global_batch_pallas(query, qlen, target, tlen, mat, w, **kw)
    Lq = query.shape[1]
    # round up to a 64 multiple so the jitted pack op doesn't retrace per
    # distinct band width (extra columns are never read by the walker)
    n_col = int(min(Lq, -(-(2 * int(np.max(np.asarray(w))) + 1) // 64) * 64))
    zp, beg = _pack_band(res.z, jnp.asarray(w), n_col)
    return GlobalPallasPacked(score=res.score, z=zp, beg=beg)


@functools.partial(jax.jit, static_argnames=("S", "pack", "packed_layout"))
def traceback_ops_device(zp: jnp.ndarray, qlen: jnp.ndarray,
                         tlen: jnp.ndarray, w: jnp.ndarray, S: int,
                         pack: bool = False, packed_layout: bool = True):
    """Walk the band-packed direction bytes ON DEVICE for a whole batch.

    The walk is the exact ksw_global2 backtrack (same bit reads as the host
    walkers), vectorized over tasks with masked lanes; only the per-step op
    stream (B, S) uint8 and the final (i, k) cursors come back to the host —
    ~Lq/2 bytes per task instead of the full z matrix. Ops are emitted in
    walk (reverse-alignment) order; 255 marks end-of-walk. S must be >=
    Lt + Lq (a step consumes at least one of i/k).

    ``packed_layout=False`` walks an UNPACKED (B, Lt, Lq) z directly
    (column index = absolute query position). Skipping the band pack
    matters: the take_along_axis band gather costs ~10x the DP kernel on
    TPU, and the pack only ever existed to shrink a host download that the
    on-device walk already eliminated.
    """
    B, Lt, n_col = zp.shape
    zflat = zp.reshape(B, Lt * n_col).astype(jnp.int32)
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    w = w.astype(jnp.int32)
    i0 = tlen - 1
    k0 = jnp.minimum(i0 + w + 1, qlen) - 1

    def step(s, carry):
        i, k, which, buf = carry
        active = (i >= 0) & (k >= 0)
        beg = (jnp.maximum(i - w, 0) if packed_layout
               else jnp.zeros_like(i))
        col = jnp.clip(k - beg, 0, n_col - 1)
        row = jnp.clip(i, 0, Lt - 1)
        d = jnp.take_along_axis(zflat, (row * n_col + col)[:, None],
                                axis=1)[:, 0]
        which_new = (d >> (which << 1)) & 3
        op = jnp.where(which_new == 0, 0, jnp.where(which_new == 1, 2, 1))
        di = jnp.where(which_new == 2, 0, 1)   # I consumes no target row
        dk = jnp.where(which_new == 1, 0, 1)   # D consumes no query col
        buf = buf.at[:, s].set(
            jnp.where(active, op, 255).astype(jnp.uint8))
        i = jnp.where(active, i - di, i)
        k = jnp.where(active, k - dk, k)
        which = jnp.where(active, which_new, which)
        return (i, k, which, buf)

    buf0 = jnp.full((B, S), 255, jnp.uint8)
    i, k, which, buf = jax.lax.fori_loop(
        0, S, step, (i0, k0, jnp.zeros_like(i0), buf0))
    if pack:
        # 4 two-bit ops per byte (LSB-first): ops are 0/1/2 and the 255
        # end-marker folds to 3 under & 3 — a 4x smaller tunnel download
        # (the op download dominates reg2aln wave latency over remote links)
        assert S % 4 == 0, "pack requires S % 4 == 0"
        p = (buf & 3).reshape(B, S // 4, 4).astype(jnp.uint8)
        packed = (p[:, :, 0] | (p[:, :, 1] << 2) | (p[:, :, 2] << 4)
                  | (p[:, :, 3] << 6))
        return packed, i, k
    return buf, i, k


@functools.partial(jax.jit, static_argnames=("S", "packed_layout"))
def traceback_ops_fused(zp: jnp.ndarray, qlen: jnp.ndarray, tlen: jnp.ndarray,
                        w: jnp.ndarray, score: jnp.ndarray, S: int,
                        packed_layout: bool = True):
    """Device traceback + bit-pack + single-buffer marshalling.

    Returns ONE (B, S//4 + 12) uint8 array: the packed op stream followed by
    score, i_fin, k_fin as little-endian int32 bytes — so a whole reg2aln
    wave costs exactly one device->host transfer (the transfer count, not
    the DP, dominates wave latency over remote tunnels)."""
    packed, i, k = traceback_ops_device(zp, qlen, tlen, w, S=S, pack=True,
                                        packed_layout=packed_layout)

    def b32(x):
        v = x.astype(jnp.int32)[:, None]
        return jax.lax.bitcast_convert_type(v, jnp.uint8).reshape(-1, 4)

    return jnp.concatenate([packed, b32(score), b32(i), b32(k)], axis=1)


def split_traceback_blob(blob: np.ndarray, S: int):
    """Host-side unpack of traceback_ops_fused's buffer."""
    P = S // 4
    packed = blob[:, :P]
    score = np.ascontiguousarray(blob[:, P:P + 4]).view(np.int32).ravel()
    i_fin = np.ascontiguousarray(blob[:, P + 4:P + 8]).view(np.int32).ravel()
    k_fin = np.ascontiguousarray(blob[:, P + 8:P + 12]).view(np.int32).ravel()
    return packed, score, i_fin, k_fin


def cigars_from_ops_raw(ops: np.ndarray, i_fin: np.ndarray,
                        k_fin: np.ndarray):
    """Native RLE finish returning the packed ((B, 2*cap) int32 matrix,
    nops) pair directly — the layout Reg2AlnSession.feed consumes with zero
    per-task Python. None when the native helper is unavailable."""
    B, S = ops.shape
    from ..index.suffix import _load_native
    lib = _load_native()
    if lib is None or not hasattr(lib, "ksw_cigar_from_ops_batch"):
        return None
    import ctypes
    o = np.ascontiguousarray(ops, dtype=np.uint8)
    iv = np.asarray(i_fin, dtype=np.int32)
    kv = np.asarray(k_fin, dtype=np.int32)
    cap = S + 2
    cig = np.empty((B, 2 * cap), dtype=np.int32)
    nops = np.empty(B, dtype=np.int32)
    i64 = ctypes.c_int64
    lib.ksw_cigar_from_ops_batch(
        ctypes.c_void_p(o.ctypes.data), i64(B), i64(S),
        ctypes.c_void_p(iv.ctypes.data), ctypes.c_void_p(kv.ctypes.data),
        ctypes.c_void_p(cig.ctypes.data), i64(cap),
        ctypes.c_void_p(nops.ctypes.data))
    return cig, nops


def cigars_from_ops_packed(packed: np.ndarray, i_fin: np.ndarray,
                           k_fin: np.ndarray, S: int):
    """Native RLE finish for the bit-packed (B, S//4) op stream produced by
    ``traceback_ops_device(..., pack=True)``. None without the native lib."""
    B = packed.shape[0]
    from ..index.suffix import _load_native
    lib = _load_native()
    if lib is None or not hasattr(lib, "ksw_cigar_from_ops_packed_batch"):
        return None
    import ctypes
    o = np.ascontiguousarray(packed, dtype=np.uint8)
    iv = np.asarray(i_fin, dtype=np.int32)
    kv = np.asarray(k_fin, dtype=np.int32)
    cap = S + 2
    cig = np.empty((B, 2 * cap), dtype=np.int32)
    nops = np.empty(B, dtype=np.int32)
    i64 = ctypes.c_int64
    lib.ksw_cigar_from_ops_packed_batch(
        ctypes.c_void_p(o.ctypes.data), i64(B), i64(S),
        ctypes.c_void_p(iv.ctypes.data), ctypes.c_void_p(kv.ctypes.data),
        ctypes.c_void_p(cig.ctypes.data), i64(cap),
        ctypes.c_void_p(nops.ctypes.data))
    return cig, nops


def cigars_from_ops(ops: np.ndarray, i_fin: np.ndarray, k_fin: np.ndarray
                    ) -> List[List[Tuple[int, int]]]:
    """Host finish of the device walk: RLE-merge ops + tails, reversed.

    Identical output to the z-matrix walkers; uses the native C++ helper
    when built.
    """
    B, S = ops.shape
    raw = cigars_from_ops_raw(ops, i_fin, k_fin)
    if raw is not None:
        cig, nops = raw
        out = []
        for b in range(B):
            n = int(nops[b])
            flat = cig[b, :2 * n].tolist()
            out.append(list(zip(flat[0::2], flat[1::2])))
        return out
    out = []
    for b in range(B):
        cigar: List[Tuple[int, int]] = []

        def push(op, ln):
            if cigar and cigar[-1][0] == op:
                cigar[-1] = (op, cigar[-1][1] + ln)
            else:
                cigar.append((op, ln))

        for s in range(S):
            v = int(ops[b, s])
            if v == 255:
                break
            push(v, 1)
        if int(i_fin[b]) >= 0:
            push(2, int(i_fin[b]) + 1)
        if int(k_fin[b]) >= 0:
            push(1, int(k_fin[b]) + 1)
        cigar.reverse()
        out.append([tuple(c) for c in cigar])
    return out


def traceback_unpacked_batch(zs: np.ndarray, qlens, tlens, ws
                             ) -> List[List[Tuple[int, int]]]:
    """CIGAR walks for a batch of unpacked (B, Lt, Lq) z buffers.

    Dispatches to the native C++ walker when built; falls back to the
    per-task Python walk below.
    """
    B = len(qlens)
    from ..index.suffix import _load_native
    lib = _load_native()
    if lib is not None and hasattr(lib, "ksw_traceback_unpacked_batch"):
        import ctypes
        z = np.ascontiguousarray(zs[:B], dtype=np.uint8)
        qv = np.asarray(qlens, dtype=np.int32)
        tv = np.asarray(tlens, dtype=np.int32)
        wv = np.asarray(ws, dtype=np.int32)
        cap = int(qv.max() + tv.max() + 2) if B else 1
        cig = np.empty((B, 2 * cap), dtype=np.int32)
        nops = np.empty(B, dtype=np.int32)
        i64 = ctypes.c_int64
        lib.ksw_traceback_unpacked_batch(
            ctypes.c_void_p(z.ctypes.data), i64(B), i64(z.shape[1]),
            i64(z.shape[2]), ctypes.c_void_p(qv.ctypes.data),
            ctypes.c_void_p(tv.ctypes.data), ctypes.c_void_p(wv.ctypes.data),
            ctypes.c_void_p(cig.ctypes.data), i64(cap),
            ctypes.c_void_p(nops.ctypes.data))
        out = []
        for b in range(B):
            n = int(nops[b])
            if n < 0:   # cap overflow: impossible with cap>=qlen+tlen+2
                out.append(traceback_unpacked(zs[b], int(qv[b]), int(tv[b]),
                                              int(wv[b])))
                continue
            flat = cig[b, :2 * n].tolist()
            out.append(list(zip(flat[0::2], flat[1::2])))
        return out
    return [traceback_unpacked(zs[b], int(qlens[b]), int(tlens[b]),
                               int(ws[b])) for b in range(B)]


def traceback_unpacked(z: np.ndarray, qlen: int, tlen: int, w: int
                       ) -> List[Tuple[int, int]]:
    """Host CIGAR walk over unpacked (Lt, Lq) direction bytes."""
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
        which = (int(z[i, k]) >> (which << 1)) & 3
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
