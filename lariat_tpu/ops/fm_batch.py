"""Batched FM-index rank queries and bidirectional extension on device.

Device-resident index layout (built once from the host FMIndex):
 - ``bwt_packed``: (n_words,) uint32, 16 2-bit codes per word, base 0 in the
   high bits (same packing as the on-disk format);
 - ``occ_ckpt``: (n_blocks+1, 4) int32 ranks before each 128-base block;
 - L2 (5,), primary, seq_len scalars.

occ4 for a batch of row indices is: one checkpoint gather + an in-block count
over 8 words, evaluated with vectorized popcount-style masking — no data-
dependent shapes, so it jits and shards cleanly. The SMEM state machines in
``smem_batch`` run batch-synchronously with lane masking.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmindex import FMIndex, OCC_INTERVAL

WORDS_PER_BLOCK = OCC_INTERVAL // 16  # 8


class DeviceFMIndex(NamedTuple):
    bwt_words: jnp.ndarray   # (n_blocks, 8) uint32 padded to block boundary
    occ_ckpt: jnp.ndarray    # (n_blocks+1, 4) int32
    L2: jnp.ndarray          # (5,) int32/int64
    primary: jnp.ndarray     # () int
    seq_len: jnp.ndarray     # () int

    @classmethod
    def from_host(cls, fm: FMIndex) -> "DeviceFMIndex":
        n = len(fm.bwt_codes)
        n_blocks = (n + OCC_INTERVAL - 1) // OCC_INTERVAL
        pad = np.zeros(n_blocks * OCC_INTERVAL, dtype=np.uint8)
        pad[:n] = fm.bwt_codes
        # pad tail with code 0? must not contaminate counts — in-block masks
        # below always clamp to the true remainder, so padding value is moot
        q = pad.reshape(-1, 16).astype(np.uint32)
        shifts = (np.arange(15, -1, -1, dtype=np.uint32) * 2)
        words = np.zeros(q.shape[0], dtype=np.uint32)
        for k in range(16):
            words |= q[:, k] << shifts[k]
        return cls(
            bwt_words=jnp.asarray(words.reshape(n_blocks, WORDS_PER_BLOCK)),
            occ_ckpt=jnp.asarray(fm.occ_ckpt.astype(np.int32)),
            L2=jnp.asarray(fm.L2.astype(np.int64)),
            primary=jnp.asarray(np.int64(fm.primary)),
            seq_len=jnp.asarray(np.int64(fm.seq_len)))


def _block_counts(words: jnp.ndarray, rem: jnp.ndarray) -> jnp.ndarray:
    """Count codes 0..3 among the first ``rem`` bases of each 8-word block.

    words: (..., 8) uint32; rem: (...,) int32 in [0, 128].
    Returns (..., 4) int32.
    """
    shifts = jnp.arange(15, -1, -1, dtype=jnp.uint32) * 2
    # (..., 8, 16) codes
    codes = (words[..., :, None] >> shifts[None, :]) & 3
    base_idx = (jnp.arange(WORDS_PER_BLOCK, dtype=jnp.int32)[:, None] * 16
                + jnp.arange(16, dtype=jnp.int32)[None, :])
    valid = base_idx < rem[..., None, None]
    counts = []
    for c in range(4):
        counts.append(jnp.sum(((codes == c) & valid), axis=(-1, -2),
                              dtype=jnp.int32))
    return jnp.stack(counts, axis=-1)


def occ4_batch(fmd: DeviceFMIndex, k: jnp.ndarray) -> jnp.ndarray:
    """Batched occ4: counts of each code in physical BWT rows [0..k].

    k: (...,) int64 row indices in [-1, seq_len]. Returns (..., 4) int64.
    """
    k = k.astype(jnp.int64)
    is_total = k == fmd.seq_len
    is_neg = k < 0
    kk = jnp.where(k >= fmd.primary, k - 1, k)
    kk = jnp.clip(kk, 0, fmd.seq_len - 1)
    blk = (kk + 1) // OCC_INTERVAL
    rem = ((kk + 1) % OCC_INTERVAL).astype(jnp.int32)
    base = fmd.occ_ckpt[blk].astype(jnp.int64)          # (..., 4)
    nb = fmd.bwt_words.shape[0]
    words = fmd.bwt_words[jnp.clip(blk, 0, nb - 1)]     # (..., 8)
    inblock = _block_counts(words, rem).astype(jnp.int64)
    out = base + inblock
    total = (fmd.L2[1:5] - fmd.L2[0:4]).astype(jnp.int64)
    out = jnp.where(is_total[..., None], total, out)
    out = jnp.where(is_neg[..., None], 0, out)
    return out


def backward_ext_batch(fmd: DeviceFMIndex, k: jnp.ndarray, l: jnp.ndarray,
                       c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched backward search step on [k, l] inclusive intervals.

    k, l, c: (...,) arrays; c int codes 0..3.
    """
    occ_km1 = occ4_batch(fmd, k - 1)
    occ_l = occ4_batch(fmd, l)
    l2c = fmd.L2[c].astype(jnp.int64)
    cm = c[..., None].astype(jnp.int32)
    nk = l2c + jnp.take_along_axis(occ_km1, cm, axis=-1)[..., 0] + 1
    nl = l2c + jnp.take_along_axis(occ_l, cm, axis=-1)[..., 0]
    return nk, nl


def bwt_extend_batch(fmd: DeviceFMIndex, x0: jnp.ndarray, x1: jnp.ndarray,
                     s: jnp.ndarray, is_back: bool
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched bidirectional extension: intervals for all four codes.

    Returns (ok0, ok1, oks) each of shape (..., 4) — indexed by the
    rank-query base, like the host ``seeding.bwt_extend``.
    """
    qpos = x0 if is_back else x1
    tk = occ4_batch(fmd, qpos - 1)
    tl = occ4_batch(fmd, qpos - 1 + s)
    sizes = tl - tk
    starts = fmd.L2[:4].astype(jnp.int64)[None, :] + 1 + tk
    crosses = ((qpos <= fmd.primary)
               & (qpos + s - 1 >= fmd.primary)).astype(jnp.int64)
    other_base = x1 if is_back else x0
    o3 = other_base + crosses
    o2 = o3 + sizes[..., 3]
    o1 = o2 + sizes[..., 2]
    o0 = o1 + sizes[..., 1]
    other = jnp.stack([o0, o1, o2, o3], axis=-1)
    if is_back:
        return starts, other, sizes
    return other, starts, sizes


@functools.partial(jax.jit, static_argnames=())
def exact_match_batch(fmd: DeviceFMIndex, reads: jnp.ndarray,
                      lens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched full-read exact-match backward search.

    reads: (B, L) codes (0..4); lens: (B,). Returns (k, l) inclusive
    intervals (empty when k > l).
    """
    B, L = reads.shape
    k0 = jnp.zeros((B,), jnp.int64)
    l0 = jnp.full((B,), fmd.seq_len, dtype=jnp.int64)

    def step(t, kl):
        k, l = kl
        # process base at position len-1-t for each read
        idx = jnp.clip(lens - 1 - t, 0, L - 1)
        c = jnp.take_along_axis(reads, idx[:, None].astype(jnp.int32),
                                axis=1)[:, 0].astype(jnp.int32)
        active = (t < lens) & (k <= l) & (c < 4)
        nk, nl = backward_ext_batch(fmd, k, l, jnp.clip(c, 0, 3))
        ambiguous = (t < lens) & (c >= 4)
        k = jnp.where(active, nk, k)
        l = jnp.where(active, nl, jnp.where(ambiguous, k - 1, l))
        return (k, l)

    k, l = jax.lax.fori_loop(0, L, step, (k0, l0))
    return k, l
