"""Compression round-trips (test/unit/compression/compression.cpp:6-460
semantics) + tile I/O sniffing."""

from __future__ import annotations

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions import compression as Z
from mapnik_vector_tile_spark.functions import pbf


@pytest.mark.parametrize("payload", [b"", b"x", b"hello world" * 100, bytes(range(256)) * 50])
def test_zlib_roundtrip_and_sniff(payload):
    z = Z.compress(payload)
    assert Z.is_zlib_compressed(z) and not Z.is_gzip_compressed(z)
    assert Z.decompress(z) == payload


@pytest.mark.parametrize("payload", [b"", b"tile data" * 123])
def test_gzip_roundtrip_and_sniff(payload):
    g = Z.compress(payload, use_gzip=True)
    assert Z.is_gzip_compressed(g) and not Z.is_zlib_compressed(g)
    assert Z.decompress(g) == payload


def test_uncompressed_passthrough():
    raw = pbf.encode_tile([pbf.encode_layer("l", [], ["k"], [], version=2)])
    assert Z.decompress(raw) == raw  # merge_from_compressed_buffer sniff path


def test_compression_levels_all_decode():
    payload = b"abcdef" * 1000
    for level in range(1, 10):
        assert Z.decompress(Z.compress(payload, level=level)) == payload


def test_varint_stream_truncation_detected():
    buf = bytearray()
    pbf.write_varint(buf, 300)
    with pytest.raises(ValueError):
        pbf.decode_varints_vec(bytes(buf[:-1]) + b"\x80")  # ends mid-varint


def test_varint_matrix_roundtrip_random():
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 2**62, 5000, dtype=np.int64).astype(np.uint64)
    m, l = pbf.varint_matrix(vals)
    flat = m[np.arange(m.shape[1])[None, :] < l[:, None]].tobytes()
    back = pbf.decode_varints_vec(flat)
    np.testing.assert_array_equal(back, vals)
