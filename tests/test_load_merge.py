"""merge_from_compressed_buffer over the reference's real tile fixtures.

Ports test/unit/load/merge.cpp: test/data/0.0.0.vector.mvt is a v1
"water" layer from a foreign (Mapbox) encoder, image.mvt a v2 raster
tile — both merged with first-wins / validate / upgrade semantics and
checked layer-valid, byte sizes pinned to the reference's REQUIREs."""

from __future__ import annotations

import os

import pytest

from mapnik_vector_tile_spark.functions import compression as Z
from mapnik_vector_tile_spark.functions import pbf, raster as R
from mapnik_vector_tile_spark.operators import composite, decode, validity

DATA = "/root/reference/test/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test data not mounted"
)


@pytest.fixture(scope="module")
def water_buf():
    buf = open(f"{DATA}/0.0.0.vector.mvt", "rb").read()
    assert len(buf) == 3812  # merge.cpp:18
    return buf


def test_merge_vector_first_wins(water_buf):
    layers = composite.merge_from_compressed_buffer([], water_buf)
    assert [n for n, _ in layers] == ["water"]
    errors, meta = validity._layer_walk(layers[0][1])
    assert errors == set() and meta["version"] == 1

    # re-adding silently skips the existing layer name (merge.cpp:42-44)
    composite.merge_from_compressed_buffer(layers, water_buf)
    assert len(layers) == 1

    # re-adding under validate throws on the duplicate (merge.cpp:46-47)
    with pytest.raises(ValueError, match="TILE_REPEATED_LAYER_NAMES"):
        composite.merge_from_compressed_buffer(layers, water_buf, validate=True)


def test_merge_vector_upgrade_v1_to_v2(water_buf):
    """merge.cpp:49-67: validate+upgrade yields a valid v2 water layer."""
    layers = composite.merge_from_compressed_buffer(
        [], water_buf, validate=True, upgrade=True
    )
    assert [n for n, _ in layers] == ["water"]
    errors, meta = validity._layer_walk(layers[0][1])
    assert errors == set(), errors
    assert meta["version"] == 2

    # the upgrade drops exactly the degenerate v1 features (this foreign
    # tile encodes points as MoveTo+zero-LineTo+Close pseudo-polygons,
    # which v2 forbids and the reference's re-encode also rejects) and
    # keeps every feature with a real ring, geometry types intact
    from mapnik_vector_tile_spark.functions import geometry as G

    v1_rows = decode.decode_layer_rows(
        0, 0, 0, pbf.decode_tile(Z.decompress(water_buf))[0]
    )
    assert len(v1_rows) == 23  # all features decode under v1 leniency

    def n_distinct(wkt):
        kind, val = G.from_wkt(wkt)
        rings = val if kind == "polygon" else [r for p in val for r in p]
        return max(len({(p[0], p[1]) for p in map(tuple, r)}) for r in rings)

    survivors = [r for r in v1_rows if r[6] and n_distinct(r[6]) >= 3]
    v2_rows = decode.decode_layer_rows(0, 0, 0, layers[0][1])
    assert len(v2_rows) == len(survivors) > 0
    assert [r[5] for r in v2_rows] == [r[5] for r in survivors]  # geom_type


def test_merge_raster_tile():
    """merge.cpp:69-95: image.mvt merges validate+upgrade into one valid
    v2 'layer' whose feature carries decodable raster bytes."""
    buf = open(f"{DATA}/image.mvt", "rb").read()
    assert len(buf) == 146098  # merge.cpp:74
    layers = composite.merge_from_compressed_buffer(
        [], buf, validate=True, upgrade=True
    )
    assert [n for n, _ in layers] == ["layer"]
    errors, meta = validity._layer_walk(layers[0][1])
    assert errors == set(), errors
    assert meta["version"] == 2
    rasters = [
        f["raster"]
        for f in (pbf.decode_feature(m) for m in meta["features"])
        if f["raster"]
    ]
    assert len(rasters) == 1
    img = R.decode_image(bytes(rasters[0]))  # sniff + decode the payload
    assert img.ndim == 3 and img.shape[0] > 0


def test_foreign_water_tile_decodes():
    """The foreign v1 tile decodes through the scan: nonempty polygon
    features inside the z0 tile extent."""
    buf = open(f"{DATA}/0.0.0.vector.mvt", "rb").read()
    rows = decode.decode_tile_rows(0, 0, 0, buf)
    assert len(rows) > 0
    assert all(r[3] == "water" for r in rows)
    kinds = {r[5] for r in rows}
    assert 3 in kinds  # polygons present


def test_merge_variant_b_two_sources():
    """0.0.0.vector-b.mvt + 0.0.0.vector.mvt: distinct-name layers
    accumulate, same-name layers first-win across sources."""
    a = open(f"{DATA}/0.0.0.vector.mvt", "rb").read()
    b = open(f"{DATA}/0.0.0.vector-b.mvt", "rb").read()
    names_b = [
        validity._layer_walk(lb)[1]["name"]
        for lb in pbf.decode_tile(Z.decompress(b))
    ]
    layers = composite.merge_from_compressed_buffer([], a)
    composite.merge_from_compressed_buffer(layers, b)
    got = [n for n, _ in layers]
    assert got[0] == "water"
    expected_extra = [n for n in names_b if n != "water"]
    assert got[1:] == expected_extra
