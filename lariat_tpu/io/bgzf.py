"""BGZF (blocked gzip) writer — the BAM container format.

Replaces the role of the reference's biogo.bam BGZF layer (consumed at
``inference/bamwriter.go:6,117``). Pure-Python zlib implementation; each
block holds up to 64 KiB of uncompressed data and carries the BC extra field
with the compressed block size, closing with the standard EOF marker.
"""

from __future__ import annotations

import struct
import zlib
from typing import BinaryIO

MAX_BLOCK = 65280  # keep compressed size safely under 65536
BGZF_EOF = bytes([
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00])


class BGZFWriter:
    def __init__(self, fh: BinaryIO, level: int = 2):
        self._fh = fh
        self._level = level
        self._buf = bytearray()

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= MAX_BLOCK:
            self._flush_block(MAX_BLOCK)

    def _flush_block(self, n: int) -> None:
        chunk = bytes(self._buf[:n])
        del self._buf[:n]
        co = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        comp = co.compress(chunk) + co.flush()
        bsize = len(comp) + 25 + 1  # header(18) + comp + crc(4) + isize(4) - 1
        header = struct.pack(
            "<BBBBIBBHBBHH",
            0x1f, 0x8b, 8, 4,     # gzip magic, deflate, FEXTRA
            0, 0, 0xff,           # mtime, xfl, os
            6,                    # XLEN
            66, 67, 2,            # SI1='B', SI2='C', SLEN=2
            bsize)
        self._fh.write(header)
        self._fh.write(comp)
        self._fh.write(struct.pack("<II", zlib.crc32(chunk),
                                   len(chunk) & 0xffffffff))

    def close(self) -> None:
        while self._buf:
            self._flush_block(min(len(self._buf), MAX_BLOCK))
        self._fh.write(BGZF_EOF)
        self._fh.flush()


def bgzf_decompress(path: str) -> bytes:
    """Read back a BGZF file (for tests); gzip module handles member chains."""
    import gzip
    with gzip.open(path, "rb") as f:
        return f.read()
