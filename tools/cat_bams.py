#!/usr/bin/env python3
"""Concatenate position-bucketed BAM chunks (the `samtools cat` step).

The reference's position-bucketed output naming
(``NNNNNN-contig_OFFSET_pos_bucketed.bam``, bamwriter.go:133-191) exists so a
downstream ``samtools cat`` can merge per-chunk outputs into one coordinate-
compatible BAM. This tool performs that merge natively: it keeps the first
file's header and appends the BGZF record payloads of the rest (all files
must share the same reference set, which holds for chunked runs of the same
genome).

Usage:
  python tools/cat_bams.py -o merged.bam out1/*_pos_bucketed.bam [sorted...]
  python tools/cat_bams.py -o merged.bam --auto outdir1 outdir2 ...
"""

from __future__ import annotations

import argparse
import glob
import gzip
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lariat_tpu.io.bgzf import BGZFWriter  # noqa: E402


def _records_payload(path: str) -> bytes:
    """Decompress a BAM and return the bytes after the header block."""
    with gzip.open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"BAM\x01", path
    l_text = struct.unpack_from("<i", data, 4)[0]
    off = 8 + l_text
    n_ref = struct.unpack_from("<i", data, off)[0]
    off += 4
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", data, off)[0]
        off += 8 + l_name
    return data[off:]


def _header_bytes(path: str) -> bytes:
    with gzip.open(path, "rb") as f:
        data = f.read()
    l_text = struct.unpack_from("<i", data, 4)[0]
    off = 8 + l_text
    n_ref = struct.unpack_from("<i", data, off)[0]
    off += 4
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", data, off)[0]
        off += 8 + l_name
    return data[:off]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--auto", action="store_true",
                   help="arguments are output DIRECTORIES; merge their "
                        "position-bucketed BAMs in name order")
    p.add_argument("inputs", nargs="+")
    args = p.parse_args(argv)
    if args.auto:
        files = []
        # chunk outputs interleave by bucket name so coordinates stay sorted
        buckets = {}
        for d in args.inputs:
            for f in glob.glob(os.path.join(d, "*_pos_bucketed.bam")):
                buckets.setdefault(os.path.basename(f), []).append(f)
        for name in sorted(buckets):
            files.extend(sorted(buckets[name]))
    else:
        files = args.inputs
    if not files:
        print("no input BAMs found", file=sys.stderr)
        return 1
    with open(args.output, "wb") as out:
        w = BGZFWriter(out)
        w.write(_header_bytes(files[0]))
        for f in files:
            w.write(_records_payload(f))
        w.close()
    print(f"merged {len(files)} BAMs -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
