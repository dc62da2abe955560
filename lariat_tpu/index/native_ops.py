"""ctypes wrappers for the native (C++) seeding and SA-lookup hot paths."""

from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

from . import suffix

_c_i64p = ctypes.POINTER(ctypes.c_int64)
_c_u32p = ctypes.POINTER(ctypes.c_uint32)
_c_u8p = ctypes.POINTER(ctypes.c_uint8)

N_THREADS = 4


def _views(fm):
    return (fm.packed_words.ctypes.data_as(_c_u32p),
            np.ascontiguousarray(fm.occ_ckpt).ctypes.data_as(_c_i64p),
            fm.L2.ctypes.data_as(_c_i64p),
            fm.sa_samples.ctypes.data_as(_c_i64p),
            ctypes.c_int64(fm.primary), ctypes.c_int64(fm.seq_len),
            ctypes.c_int64(fm.sa_intv))


def _occ_contig(fm):
    occ = getattr(fm, "_occ_contig_cache", None)
    if occ is None:
        occ = np.ascontiguousarray(fm.occ_ckpt)
        fm._occ_contig_cache = occ
    return occ


def collect_seeds_batch(fm, reads: List[np.ndarray], opt
                        ) -> Optional[List[np.ndarray]]:
    """Batched mem_collect_intv; returns per-read (n, 5) int64 arrays
    [x0, x1, s, qb, qe], or None when the native library is unavailable."""
    lib = suffix._load_native()
    if lib is None or not hasattr(lib, "fm_collect_seeds_batch"):
        return None
    n = len(reads)
    if n == 0:
        return []
    offsets = np.zeros(n + 1, dtype=np.int64)
    for i, r in enumerate(reads):
        offsets[i + 1] = offsets[i] + len(r)
    flat = np.concatenate([np.asarray(r, dtype=np.uint8) for r in reads]) \
        if offsets[-1] else np.zeros(1, np.uint8)
    occ = _occ_contig(fm)
    cap = int(offsets[-1]) * 2 + 64 * n + 64
    out = np.zeros((cap, 5), dtype=np.int64)
    counts = np.zeros(n, dtype=np.int64)
    offs = np.zeros(n, dtype=np.int64)
    while True:
        total = lib.fm_collect_seeds_batch(
            fm.packed_words.ctypes.data_as(_c_u32p),
            occ.ctypes.data_as(_c_i64p),
            fm.L2.ctypes.data_as(_c_i64p),
            fm.sa_samples.ctypes.data_as(_c_i64p),
            ctypes.c_int64(fm.primary), ctypes.c_int64(fm.seq_len),
            ctypes.c_int64(fm.sa_intv),
            flat.ctypes.data_as(_c_u8p), offsets.ctypes.data_as(_c_i64p),
            ctypes.c_int64(n), ctypes.c_int(opt.min_seed_len),
            ctypes.c_double(opt.split_factor), ctypes.c_int(opt.split_width),
            ctypes.c_int64(opt.max_mem_intv),
            out.ctypes.data_as(_c_i64p), ctypes.c_int64(cap),
            counts.ctypes.data_as(_c_i64p), offs.ctypes.data_as(_c_i64p),
            ctypes.c_int(N_THREADS))
        if total >= 0:
            break
        cap *= 4
        out = np.zeros((cap, 5), dtype=np.int64)
    return [out[offs[i]:offs[i] + counts[i]].copy() for i in range(n)]


def sa_lookup_batch(fm, rows: np.ndarray) -> Optional[np.ndarray]:
    lib = suffix._load_native()
    if lib is None or not hasattr(lib, "fm_sa_lookup_batch"):
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    out = np.zeros(len(rows), dtype=np.int64)
    occ = _occ_contig(fm)
    lib.fm_sa_lookup_batch(
        fm.packed_words.ctypes.data_as(_c_u32p),
        occ.ctypes.data_as(_c_i64p),
        fm.L2.ctypes.data_as(_c_i64p),
        fm.sa_samples.ctypes.data_as(_c_i64p),
        ctypes.c_int64(fm.primary), ctypes.c_int64(fm.seq_len),
        ctypes.c_int64(fm.sa_intv),
        rows.ctypes.data_as(_c_i64p), ctypes.c_int64(len(rows)),
        out.ctypes.data_as(_c_i64p), ctypes.c_int(N_THREADS))
    return out
