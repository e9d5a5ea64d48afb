"""Compressed tile I/O (S7) — src/vector_tile_compression.hpp:18-72,
.ipp:15-89: magic-byte sniffing for zlib/gzip, inflate either, deflate
to zlib (or gzip on request). One call per tile payload, never per-row.
"""

from __future__ import annotations

import gzip
import zlib


def is_zlib_compressed(data: bytes) -> bool:
    return len(data) > 1 and data[0] == 0x78 and data[1] in (0x01, 0x5E, 0x9C, 0xDA)


def is_gzip_compressed(data: bytes) -> bool:
    return len(data) > 1 and data[0] == 0x1F and data[1] == 0x8B


def decompress(data: bytes) -> bytes:
    if is_gzip_compressed(data):
        return gzip.decompress(data)
    if is_zlib_compressed(data):
        return zlib.decompress(data)
    return data


def compress(data: bytes, level: int = 6, use_gzip: bool = False) -> bytes:
    if use_gzip:
        return gzip.compress(data, compresslevel=level, mtime=0)
    return zlib.compress(data, level)
