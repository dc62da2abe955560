"""Ablation timing for the Pallas extend kernel (VERDICT r5 perf work).

The production kernel (ops/sw_extend_pallas.py) measures ~1% of VPU SOL;
the vector-op count predicts ~75x less. This tool times modified copies
of the kernel with individual cost centers disabled (results are WRONG —
timing only) to locate the wall:

  baseline       the real kernel
  no_cummax      F prefix-max replaced by identity
  no_trow        target-row mask-reduce replaced by a constant row
  no_writeback   eh write-back masks dropped (plain store)
  minimal        all three off
  rows_288       Lt halved (row-count scaling)

Usage: python tools/extend_ablate.py   (needs the TPU; one tunnel client)
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0x40000000
LANES = 128


def _cummax_sublanes(x):
    n = x.shape[0]
    d = 1
    while d < n:
        shifted = jnp.concatenate(
            [jnp.full((d,) + x.shape[1:], NEG, x.dtype), x[:-d]], axis=0)
        x = jnp.maximum(x, shifted)
        d *= 2
    return x


def make_kernel(Lt, *, cummax=True, trow=True, writeback=True,
                o_del=6, e_del=1, o_ins=6, e_ins=1, zdrop=100,
                match_sc=1, mismatch_sc=-4, n_sc=-1):
    def kern(q_ref, t_ref, params_ref, out_ref, ehh_ref, ehe_ref):
        Lq, T = q_ref.shape
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

        state0 = (jnp.where((tlen > 0) & (qlen > 0), one, z), h0,
                  jnp.full((1, T), -1, jnp.int32),
                  jnp.full((1, T), -1, jnp.int32),
                  jnp.full((1, T), -1, jnp.int32),
                  jnp.full((1, T), -1, jnp.int32),
                  jnp.zeros((1, T), jnp.int32))

        def row_step(i, st):
            alive, max_score, max_i, max_j, max_ie, gscore, max_off = st
            i32 = jnp.int32(i)
            in_row = (alive != 0) & (i32 < tlen)
            beg = jnp.maximum(i32 - w, z)
            end = jnp.minimum(i32 + w + 1, qlen)
            band = (jr >= beg) & (jr < end)
            h1_init = jnp.where(
                beg == 0,
                jnp.maximum(h0 - (o_del + e_del * (i32 + 1)), 0), z)
            if trow:
                jrt = jax.lax.broadcasted_iota(jnp.int32, (Lt, T), 0)
                tcode = jnp.max(jnp.where(jrt == i32, t_ref[:], z), axis=0,
                                keepdims=True)
                tcode = jnp.where(i32 >= Lt, z, tcode)
            else:
                tcode = t_ref[0:1, :]
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
            if cummax:
                run = _cummax_sublanes(a)
            else:
                run = a
            F = jnp.concatenate(
                [jnp.full((1, T), NEG, jnp.int32),
                 run[:-1] - jr[:-1] * e_ins], axis=0)
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
            zcond = ((del_side
                      & (max_score - m_best - (di - dj) * e_del > zdrop))
                     | ((~del_side)
                        & (max_score - m_best - (dj - di) * e_ins > zdrop)))
            died = in_row & ((m_best == 0) | ((~improved) & zcond))
            alive_n = jnp.where((alive != 0) & (i32 + 1 < tlen) & (~died),
                                one, z)
            h_shift = jnp.concatenate([jnp.zeros((1, T), jnp.int32), h],
                                      axis=0)
            e_new = jnp.maximum(E - e_del, jnp.maximum(M - oe_del, 0))
            e_pad = jnp.concatenate([e_new, jnp.zeros((1, T), jnp.int32)],
                                    axis=0)
            if writeback:
                wmask = (jid1 > beg) & (jid1 <= end)
                ehh_new = jnp.where(wmask, h_shift, ehh_ref[:])
                ehh_new = jnp.where(jid1 == beg, h1_init, ehh_new)
                emask = (jid1 >= beg) & (jid1 < end)
                ehe_new = jnp.where(emask, e_pad, ehe_ref[:])
                ehe_new = jnp.where(jid1 == end, z, ehe_new)
                ehh_ref[:] = jnp.where(in_row, ehh_new, ehh_ref[:])
                ehe_ref[:] = jnp.where(in_row, ehe_new, ehe_ref[:])
            else:
                ehh_ref[:] = h_shift
                ehe_ref[:] = e_pad
            return (jnp.where(in_row, alive_n, alive),
                    jnp.where(in_row, max_score_n, max_score),
                    jnp.where(in_row, max_i_n, max_i),
                    jnp.where(in_row, max_j_n, max_j),
                    max_ie, gscore, max_off)

        out = jax.lax.fori_loop(jnp.int32(0), jnp.int32(Lt), row_step,
                                state0)
        rid = jax.lax.broadcasted_iota(jnp.int32, (8, T), 0)
        outv = jnp.zeros((8, T), jnp.int32)
        for k, r in enumerate(out[:6]):
            outv = jnp.where(rid == k, r, outv)
        out_ref[:] = outv
    return kern


@functools.partial(jax.jit,
                   static_argnames=("Lt", "cummax", "trow", "writeback"))
def run_variant(q, t, params, Lt, cummax=True, trow=True, writeback=True):
    B, Lq = q.shape
    kern = make_kernel(Lt, cummax=cummax, trow=trow, writeback=writeback)
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Lq + 1, LANES), jnp.int32),
            pltpu.VMEM((Lq + 1, LANES), jnp.int32),
        ])
    chunks = []
    for c0 in range(0, B, LANES):
        sl = slice(c0, c0 + LANES)
        chunks.append(call(q[sl].T, t[sl, :Lt].T, params[sl].T))
    return jnp.concatenate(chunks, axis=1)


def main():
    rng = np.random.default_rng(5)
    B, Lq, Lt = 8192, 192, 576
    q = jnp.asarray(rng.integers(0, 4, (B, Lq)).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 4, (B, Lt)).astype(np.int32))
    params = np.zeros((B, 8), np.int32)
    params[:, 0] = 151
    params[:, 1] = 400
    params[:, 2] = 100
    params[:, 3] = 30
    params = jnp.asarray(params)

    def timeit(fn, iters=3):
        np.asarray(fn())  # materialize: block_until_ready is unreliable
        t0 = time.time()  # over the axon tunnel (returns before exec)
        for _ in range(iters):
            np.asarray(fn())
        return (time.time() - t0) / iters

    res = {"device": str(jax.devices()[0])}
    variants = [
        ("baseline", dict()),
        ("no_cummax", dict(cummax=False)),
        ("no_trow", dict(trow=False)),
        ("no_writeback", dict(writeback=False)),
        ("minimal", dict(cummax=False, trow=False, writeback=False)),
    ]
    for name, kw in variants:
        dt = timeit(lambda: run_variant(q, t, params, Lt, **kw))
        res[name] = {"ms": round(dt * 1e3, 1),
                     "cells_per_s": round(B * Lq * Lt / dt)}
        print(json.dumps({name: res[name]}), flush=True)
    dt = timeit(lambda: run_variant(q, t, params, 288))
    res["rows_288"] = {"ms": round(dt * 1e3, 1)}
    print(json.dumps({"rows_288": res["rows_288"]}), flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
