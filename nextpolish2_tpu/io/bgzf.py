"""BGZF (blocked gzip) writer.

BAM requires BGZF framing: a series of gzip members each <= 64 KiB of raw data,
carrying a BC extra subfield with the compressed block size, terminated by a fixed
28-byte EOF marker. Reading needs no special code (BGZF is valid multi-member gzip,
which Python's gzip module streams transparently); this module provides the writer.
"""

from __future__ import annotations

import struct
import zlib

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)
_MAX_BLOCK = 65280  # uncompressed payload per block


class BgzfWriter:
    def __init__(self, fileobj, level: int = 6):
        self._f = fileobj
        self._level = level
        self._buf = bytearray()

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= _MAX_BLOCK:
            self._flush_block(self._buf[:_MAX_BLOCK])
            del self._buf[:_MAX_BLOCK]

    def _flush_block(self, payload: bytes) -> None:
        co = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        cdata = co.compress(payload) + co.flush()
        # BSIZE = total block length - 1 (SAMv1 spec 4.1): total is
        # header(12) + xlen(6) + cdata + crc(4) + isize(4) = len(cdata) + 26.
        bsize = len(cdata) + 25
        header = struct.pack(
            "<4BI2BH2BHH",
            0x1F, 0x8B, 0x08, 0x04,  # gzip magic, deflate, FEXTRA
            0,                        # mtime
            0, 0xFF,                  # xfl, os
            6,                        # xlen
            0x42, 0x43,               # 'B' 'C'
            2,                        # subfield length
            bsize,                    # BSIZE - 1
        )
        self._f.write(header)
        self._f.write(cdata)
        self._f.write(struct.pack("<II", zlib.crc32(payload), len(payload) & 0xFFFFFFFF))

    def close(self) -> None:
        if self._buf:
            self._flush_block(bytes(self._buf))
            self._buf.clear()
        self._f.write(BGZF_EOF)
        self._f.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
