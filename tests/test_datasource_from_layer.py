"""Layer->datasource construction semantics.

Ports test/unit/datasource-pbf/from_layer.cpp (all 20 sections) against
decode_layer_rows — the engine's equivalent of constructing a
tile_datasource_pbf from one layer message and pulling its featureset.
Coordinate goldens are the reference's literal WKT values."""

from __future__ import annotations

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions import commands as Cmd
from mapnik_vector_tile_spark.functions import pbf
from mapnik_vector_tile_spark.operators import decode


def _layer_bytes(
    name: str | None = None,
    version: int | None = None,
    extent: int | None = None,
    features: list[bytes] = (),
) -> bytes:
    """Hand-built Tile_Layer message (SerializePartialToString twin:
    only explicitly-set fields are emitted)."""
    buf = bytearray()
    if name is not None:
        pbf.add_len_field(buf, 1, name.encode())
    for f in features:
        pbf.add_len_field(buf, 2, f)
    if extent is not None:
        pbf.add_varint_field(buf, 5, extent)
    if version is not None:
        pbf.add_varint_field(buf, 15, version)
    return bytes(buf)


def _point_feature(px: int, py: int) -> bytes:
    geom = [9, Cmd.zigzag32(px), Cmd.zigzag32(py)]
    return pbf.encode_feature(None, [], 1, geom)


@pytest.mark.parametrize("version", [1, 2])
def test_layer_without_name_rejected(version):
    """from_layer.cpp:21-58: name is required in both spec versions."""
    blob = _layer_bytes(version=version)
    with pytest.raises(ValueError, match="name"):
        decode.decode_layer_rows(0, 0, 0, blob)


def test_v1_layer_without_extent_defaults_4096():
    """from_layer.cpp:60-76 + 140-156: v1 extent defaults to 4096 and
    the decoded point matches the reference's WKT golden."""
    blob = _layer_bytes(name="test_name", version=1, features=[_point_feature(5, 5)])
    rows = decode.decode_layer_rows(0, 0, 0, blob)
    assert len(rows) == 1
    wkt = rows[0][6]
    x, y = (float(v) for v in wkt[len("POINT(") : -1].split())
    assert np.isclose(x, -19988588.6446867, atol=1e-4)
    assert np.isclose(y, 19988588.6446867, atol=1e-4)


def test_v2_layer_without_extent_rejected():
    """from_layer.cpp:78-92: a v2 layer with no declared extent does not
    comply; the scan yields no features for it (the reference throws at
    datasource construction)."""
    blob = _layer_bytes(name="test_name", version=2, features=[_point_feature(5, 5)])
    assert decode.decode_layer_rows(0, 0, 0, blob) == []


@pytest.mark.parametrize("version", [1, 2])
def test_layer_with_name_and_extent_constructs(version):
    """from_layer.cpp:96-122."""
    blob = _layer_bytes(
        name="test_name", version=version, extent=4096,
        features=[_point_feature(5, 5)],
    )
    rows = decode.decode_layer_rows(0, 0, 0, blob)
    assert len(rows) == 1 and rows[0][3] == "test_name"


def test_extent_scales_features():
    """from_layer.cpp:158-173: halving the extent doubles the ground
    size of one tile px (reference WKT literal)."""
    blob = _layer_bytes(
        name="test_name", version=1, extent=2048,
        features=[_point_feature(5, 5)],
    )
    rows = decode.decode_layer_rows(0, 0, 0, blob)
    x, y = (float(v) for v in rows[0][6][len("POINT(") : -1].split())
    assert np.isclose(x, -19939668.9465842, atol=1e-4)
    assert np.isclose(y, 19939668.9465842, atol=1e-4)


@pytest.mark.parametrize("version", [1, 2])
def test_empty_layer_yields_no_features(version):
    """from_layer.cpp:177-214 (+ the features_at_point twin :241-273):
    a feature-less layer produces an empty featureset."""
    blob = _layer_bytes(name="test_name", version=version, extent=4096)
    assert decode.decode_layer_rows(0, 0, 0, blob) == []
    tiny = (-0.0001, -0.0001, 0.0001, 0.0001)
    assert decode.decode_layer_rows(0, 0, 0, blob, bbox=tiny) == []


def test_unknown_version_skipped():
    """from_layer.cpp:216-239 + :275-297: version 3 layers yield no
    features (spec: consumer MAY skip; SHOULD continue with subsequent
    layers) — and a sibling v2 layer in the same tile still decodes."""
    v3 = _layer_bytes(
        name="skip_me", version=3, extent=4096, features=[_point_feature(5, 5)]
    )
    assert decode.decode_layer_rows(0, 0, 0, v3) == []
    tiny = (-0.0001, -0.0001, 0.0001, 0.0001)
    assert decode.decode_layer_rows(0, 0, 0, v3, bbox=tiny) == []
    ok = _layer_bytes(
        name="keep_me", version=2, extent=4096, features=[_point_feature(5, 5)]
    )
    tile = pbf.encode_tile([v3, ok])
    rows = decode.decode_tile_rows(0, 0, 0, tile)
    assert [r[3] for r in rows] == ["keep_me"]
