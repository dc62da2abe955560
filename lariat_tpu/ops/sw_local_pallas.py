"""Pallas TPU kernel for batched local Smith-Waterman (mate rescue DP).

Same math as ``sw_local_batch.local_batch`` (the forward direction of
ksw_align2, bwa's mem_matesw DP — reference use gobwa.go:287-324) with the
whole DP state resident in VMEM.

Layout: TRANSPOSED like the extend kernel — tasks on the lane axis (128 per
call), query position on sublanes; per-task scalars are native (1, 128) rows.
The per-column maxima live in a (Lt, 128) VMEM scratch so the second-best
candidate scan (bwa's merged ``b`` array with its stored-index quirk) runs
on device too — nothing but the (8, 128) result row leaves the chip.

The second-best radius test avoids integer division (Mosaic): column ci is
inside the excluded window iff |ci - te| * max_sc <= gmax + max_sc - 1,
which equals |ci - te| <= ceil(gmax / max_sc).

See sw_extend_pallas.py for the Mosaic pitfalls this file inherits (typed
int32 constants, no bool selects, mask-reduce row extraction, no (T, 1)
layouts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw_local_batch import LocalBatchResult

NEG = -0x40000000
LANES = 128
PACK = 1024  # row-packing base for (value, index) maxima; requires Lq < 1024


def _cummax_sublanes(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[0]
    d = 1
    while d < n:
        shifted = jnp.concatenate(
            [jnp.full((d,) + x.shape[1:], NEG, x.dtype), x[:-d]], axis=0)
        x = jnp.maximum(x, shifted)
        d *= 2
    return x


def _local_kernel(q_ref, t_ref, params_ref, out_ref, hh_ref, ee_ref, cm_ref,
                  *, Lt: int, o_del: int, e_del: int, o_ins: int, e_ins: int,
                  match_sc: int, mismatch_sc: int, n_sc: int, max_sc: int):
    Lq, T = q_ref.shape
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    qlen = params_ref[0:1, :]
    tlen = params_ref[1:2, :]
    minsc = params_ref[2:3, :]
    z = jnp.int32(0)
    negv = jnp.int32(NEG)
    kpack = jnp.int32(PACK)
    jr = jax.lax.broadcasted_iota(jnp.int32, (Lq, T), 0)
    qvalid = jr < qlen
    hh_ref[:] = jnp.zeros((Lq, T), jnp.int32)
    ee_ref[:] = jnp.zeros((Lq, T), jnp.int32)
    qc = q_ref[:]

    state0 = (z + jnp.zeros((1, T), jnp.int32),      # gmax
              jnp.full((1, T), -1, jnp.int32),       # te
              jnp.full((1, T), -1, jnp.int32))       # qe

    def row_step(i, st):
        gmax, te, qe = st
        i32 = jnp.int32(i)
        in_row = i32 < tlen
        jrt = jax.lax.broadcasted_iota(jnp.int32, (Lt, T), 0)
        tcode = jnp.max(jnp.where(jrt == i32, t_ref[:], z), axis=0,
                        keepdims=True)
        is_n = (qc >= 4) | (tcode >= 4)
        sub = jnp.where(is_n, jnp.int32(n_sc),
                        jnp.where(qc == tcode, jnp.int32(match_sc),
                                  jnp.int32(mismatch_sc)))
        H = hh_ref[:]
        E = ee_ref[:]
        diag = jnp.concatenate([jnp.zeros((1, T), jnp.int32), H[:-1]], axis=0)
        M = diag + sub
        H0 = jnp.maximum(jnp.maximum(M, E), z)
        src = jnp.maximum(H0 - oe_ins, z)
        a = src + jr * e_ins
        run = _cummax_sublanes(a)
        F = jnp.concatenate(
            [jnp.full((1, T), NEG, jnp.int32), run[:-1] - jr[:-1] * e_ins],
            axis=0)
        F = jnp.maximum(F, z)
        Hn = jnp.maximum(H0, F)
        Hn = jnp.where(qvalid, Hn, z)
        En = jnp.maximum(jnp.maximum(E - e_del, Hn - oe_del), z)
        # packed max -> column max and its FIRST argmax (np.argmax tie-break)
        pmax = jnp.max(Hn * kpack + (kpack - 1 - jr), axis=0, keepdims=True)
        m_best = pmax // kpack
        qe_row = kpack - 1 - (pmax - m_best * kpack)
        m_best = jnp.where(in_row, m_best, z)
        cm_ref[:] = jnp.where(jrt == i32, m_best, cm_ref[:])
        improved = in_row & (m_best > gmax)
        hh_ref[:] = jnp.where(in_row, Hn, H)
        ee_ref[:] = jnp.where(in_row, En, E)
        return (jnp.where(improved, m_best, gmax),
                jnp.where(improved, i32, te),
                jnp.where(improved, qe_row, qe))

    gmax, te, qe = jax.lax.fori_loop(jnp.int32(0), jnp.int32(Lt), row_step,
                                     state0)

    # ---- second-best candidate scan over the stored column maxima ----
    # inside-window test without division: |ci - te| * max_sc <= gmax + max_sc-1
    thr = gmax + jnp.int32(max_sc - 1)

    def outside(ci):
        d = jnp.abs(ci - te)
        return d * jnp.int32(max_sc) > thr

    def col_step(i, st):
        run_max, run_idx, best2, te2 = st
        i32 = jnp.int32(i)
        jrt = jax.lax.broadcasted_iota(jnp.int32, (Lt, T), 0)
        cm = jnp.max(jnp.where(jrt == i32, cm_ref[:], negv), axis=0,
                     keepdims=True)
        valid = (i32 < tlen) & (cm >= minsc)
        is_new = valid & (run_idx + 1 != i32)
        use = is_new & (run_idx >= 0) & outside(run_idx) & (run_max > best2)
        best2 = jnp.where(use, run_max, best2)
        te2 = jnp.where(use, run_idx, te2)
        raises = valid & (~is_new) & (run_max < cm)
        run_max_n = jnp.where(is_new | raises, cm, run_max)
        run_idx_n = jnp.where(is_new | raises, i32, run_idx)
        return run_max_n, run_idx_n, best2, te2

    run_max, run_idx, best2, te2 = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(Lt), col_step,
        (jnp.full((1, T), -1, jnp.int32), jnp.full((1, T), -2, jnp.int32),
         jnp.full((1, T), -1, jnp.int32), jnp.full((1, T), -1, jnp.int32)))
    use = (run_idx >= 0) & outside(run_idx) & (run_max > best2)
    best2 = jnp.where(use, run_max, best2)
    te2 = jnp.where(use, run_idx, te2)

    z = jnp.int32(0)
    none = te < 0
    rows = [
        jnp.where(none, z, gmax),
        te,
        jnp.where(none, jnp.int32(-1), qe),
        best2,
        te2,
    ]
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, T), 0)
    outv = jnp.zeros((8, T), jnp.int32)
    for k, r in enumerate(rows):
        outv = jnp.where(rid == k, r, outv)
    out_ref[:] = outv


def _run_local(query, qlen, target, tlen, minsc, *, o_del, e_del, o_ins,
               e_ins, match_sc, mismatch_sc, n_sc, tile_b, interpret):
    """One forward local-SW pass over a (B, Lq)/(B, Lt) batch -> (8, B)."""
    B, Lq = query.shape
    Lt = target.shape[1]
    if Lq >= PACK:
        raise ValueError(f"Lq={Lq} exceeds the packed-argmax base {PACK}")
    query = query.astype(jnp.int32)
    target = target.astype(jnp.int32)
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    minsc = minsc.astype(jnp.int32)
    Bp = (B + tile_b - 1) // tile_b * tile_b
    padn = Bp - B
    if padn:
        query = jnp.pad(query, ((0, padn), (0, 0)))
        target = jnp.pad(target, ((0, padn), (0, 0)))
        qlen = jnp.pad(qlen, (0, padn))
        tlen = jnp.pad(tlen, (0, padn))
        minsc = jnp.pad(minsc, (0, padn), constant_values=1 << 30)
    params = jnp.zeros((Bp, 8), jnp.int32)
    params = params.at[:, 0].set(qlen).at[:, 1].set(tlen)
    params = params.at[:, 2].set(minsc)
    kernel = functools.partial(_local_kernel, Lt=Lt, o_del=o_del,
                               e_del=e_del, o_ins=o_ins, e_ins=e_ins,
                               match_sc=match_sc, mismatch_sc=mismatch_sc,
                               n_sc=n_sc, max_sc=max(match_sc, 1))
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, tile_b), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Lq, tile_b), jnp.int32),
            pltpu.VMEM((Lq, tile_b), jnp.int32),
            pltpu.VMEM((Lt, tile_b), jnp.int32),
        ],
        interpret=interpret,
    )
    chunks = []
    for c0 in range(0, Bp, tile_b):
        sl = slice(c0, c0 + tile_b)
        chunks.append(call(query[sl].T, target[sl].T, params[sl].T))
    return jnp.concatenate(chunks, axis=1)[:, :B]


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "match_sc",
                                             "mismatch_sc", "n_sc",
                                             "tile_b", "interpret"))
def local_batch_pallas(query: jnp.ndarray, qlen: jnp.ndarray,
                       target: jnp.ndarray, tlen: jnp.ndarray,
                       minsc: jnp.ndarray,
                       o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                       e_ins: int = 1, match_sc: int = 1,
                       mismatch_sc: int = -4, n_sc: int = -1,
                       tile_b: int = LANES,
                       interpret: bool = False) -> LocalBatchResult:
    """Pallas-accelerated batched forward local SW (see local_batch)."""
    out = _run_local(query, qlen, target, tlen, minsc, o_del=o_del,
                     e_del=e_del, o_ins=o_ins, e_ins=e_ins,
                     match_sc=match_sc, mismatch_sc=mismatch_sc, n_sc=n_sc,
                     tile_b=tile_b, interpret=interpret)
    return LocalBatchResult(score=out[0], te=out[1], qe=out[2],
                            score2=out[3], te2=out[4])


def _rev_prefix(x: jnp.ndarray, end: jnp.ndarray) -> jnp.ndarray:
    """rev[b, j] = x[b, end[b] - j] for j <= end[b], else 0 (end inclusive)."""
    L = x.shape[1]
    idx = end[:, None] - jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    take = jnp.take_along_axis(x, jnp.clip(idx, 0, L - 1), axis=1)
    return jnp.where(idx >= 0, take, 0)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "match_sc",
                                             "mismatch_sc", "n_sc",
                                             "tile_b", "interpret"))
def local_two_pass_pallas(query: jnp.ndarray, qlen: jnp.ndarray,
                          target: jnp.ndarray, tlen: jnp.ndarray,
                          minsc: jnp.ndarray,
                          o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                          e_ins: int = 1, match_sc: int = 1,
                          mismatch_sc: int = -4, n_sc: int = -1,
                          tile_b: int = LANES,
                          interpret: bool = False) -> jnp.ndarray:
    """Full ksw_align2 (mate-rescue DP) in ONE device dispatch.

    Runs the forward pass, builds the reversed-prefix inputs on device
    (no host round trip), runs the start-coordinate pass, and returns a
    single packed (8, B) int32 buffer so a remote-tunnel caller pays one
    transfer for the whole rescue wave:

        rows: score, te, qe, score2, te2, qe_r, te_r, scored(0/1)

    Bit-identical per task to ksw.local_align's two _local_core calls
    (the second pass runs speculatively on every scored task; unscored
    tasks run with zero lengths and are masked by the ``scored`` row).
    """
    kw = dict(o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
              match_sc=match_sc, mismatch_sc=mismatch_sc, n_sc=n_sc,
              tile_b=tile_b, interpret=interpret)
    query = query.astype(jnp.int32)
    target = target.astype(jnp.int32)
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    minsc = minsc.astype(jnp.int32)
    out1 = _run_local(query, qlen, target, tlen, minsc, **kw)
    score, te, qe = out1[0], out1[1], out1[2]
    scored = (te >= 0) & (score >= minsc)
    q2 = _rev_prefix(query, qe)
    t2 = _rev_prefix(target, te)
    qlen2 = jnp.where(scored, qe + 1, 0)
    tlen2 = jnp.where(scored, te + 1, 0)
    big = jnp.full_like(minsc, 1 << 30)
    out2 = _run_local(q2, qlen2, t2, tlen2, big, **kw)
    rid = jax.lax.broadcasted_iota(jnp.int32, out1.shape, 0)
    out = jnp.where(rid < 5, out1, 0)
    out = out.at[5].set(out2[2])           # qe_r
    out = out.at[6].set(out2[1])           # te_r
    out = out.at[7].set(scored.astype(jnp.int32))
    return out
