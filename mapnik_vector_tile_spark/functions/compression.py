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


_ADLER_BASE = 65521


def adler32_combine(ad1: int, ad2: int, len2: int) -> int:
    """zlib's adler32_combine: checksum of A+B from adler32(A),
    adler32(B), len(B) — lets independently-checksummed segments form
    one valid zlib stream without re-reading the bytes (the parallel
    salted-encode assemble, operators/encode.py)."""
    rem = len2 % _ADLER_BASE
    sum1 = ad1 & 0xFFFF
    sum2 = (rem * sum1) % _ADLER_BASE
    sum1 += (ad2 & 0xFFFF) + _ADLER_BASE - 1
    sum2 += ((ad1 >> 16) & 0xFFFF) + ((ad2 >> 16) & 0xFFFF) + _ADLER_BASE - rem
    if sum1 >= _ADLER_BASE:
        sum1 -= _ADLER_BASE
    if sum1 >= _ADLER_BASE:
        sum1 -= _ADLER_BASE
    if sum2 >= 2 * _ADLER_BASE:
        sum2 -= 2 * _ADLER_BASE
    if sum2 >= _ADLER_BASE:
        sum2 -= _ADLER_BASE
    return sum1 | (sum2 << 16)


def deflate_segment(data: bytes, level: int = 6) -> bytes:
    """Raw-deflate ``data`` as a NON-final segment (Z_FULL_FLUSH): the
    output byte-aligns on a block boundary with the dictionary reset, so
    independently-produced segments concatenate into one valid deflate
    stream (terminated by deflate_stream_tail)."""
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush(zlib.Z_FULL_FLUSH)


def deflate_stream_tail() -> bytes:
    """The final (BFINAL=1) empty block closing a segmented stream."""
    co = zlib.compressobj(1, zlib.DEFLATED, -15)
    return co.compress(b"") + co.flush(zlib.Z_FINISH)


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
