"""GeoJSON source (S8): file -> WKT rows -> the tile pipeline."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mapnik_vector_tile_spark.functions import geometry as G
from mapnik_vector_tile_spark.sources import geojson as GJ


def test_geojson_obj_shapes():
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1, 2]},
             "properties": {"name": "a"}},
            {"type": "Feature",
             "geometry": {"type": "Polygon",
                          "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]},
             "properties": {"name": "b", "rank": 3}},
            {"type": "Feature",
             "geometry": {"type": "MultiLineString",
                          "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]]},
             "properties": None},
        ],
    }
    rows = GJ.geojson_obj_to_rows(fc)
    assert len(rows) == 3
    kinds = [G.from_wkt(w)[0] for w, _p in rows]
    assert kinds == ["point", "polygon", "multilinestring"]
    assert json.loads(rows[1][1]) == {"name": "b", "rank": 3}


def test_read_geojson_to_tiles(spark, tmp_path):
    from mapnik_vector_tile_spark.operators import decode, geom_tiles

    h = 20037508.342789244 / 4.0
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "LineString",
                          "coordinates": [[-h, 1000], [h, 1000]]},
             "properties": {"gid": "line"}},
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [h * 1.5, -h * 1.5]},
             "properties": {"gid": "pt"}},
        ],
    }
    p = tmp_path / "data.geojson"
    p.write_text(json.dumps(fc))
    df = GJ.read_geojson(spark, str(p))
    rows = df.withColumn(
        "gid", F.get_json_object("properties", "$.gid")
    ).select("gid", "geom_wkt")
    assert rows.count() == 2
    tiles = geom_tiles.build_geom_tiles(rows, ["gid"], z=3, id_col="gid")
    decoded = decode.decode_tiles(tiles).toPandas()
    assert len(decoded) >= 2
    assert {m["gid"] for m in decoded["props"]} == {"line", "pt"}


def test_geometrycollection_flattened_to_member_rows():
    """ADVICE r2: a GeometryCollection feature must not crash the tiling
    pipeline — members are flattened into individual rows sharing the
    feature's properties (clipper visits each member:
    vector_tile_geometry_clipper.hpp:122-128)."""
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "GeometryCollection", "geometries": [
                 {"type": "Point", "coordinates": [1, 2]},
                 {"type": "LineString", "coordinates": [[0, 0], [5, 5]]},
                 {"type": "GeometryCollection", "geometries": [
                     {"type": "Polygon",
                      "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 0]]]},
                 ]},
             ]},
             "properties": {"gid": "gc"}},
        ],
    }
    rows = GJ.geojson_obj_to_rows(fc)
    assert len(rows) == 3
    kinds = sorted(G.from_wkt(w)[0] for w, _p in rows)
    assert kinds == ["linestring", "point", "polygon"]
    assert all(json.loads(p) == {"gid": "gc"} for _w, p in rows)
    # bare-document form too
    bare = {"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [9, 9]}]}
    assert GJ.geojson_obj_to_rows(bare) == [("POINT(9 9)", "{}")]


def test_geometrycollection_through_geom_tiles(spark, tmp_path):
    """End-to-end: GC member rows pack, envelope, and tile without error."""
    from mapnik_vector_tile_spark.operators import decode, geom_tiles

    h = 20037508.342789244 / 4.0
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "GeometryCollection", "geometries": [
                 {"type": "Point", "coordinates": [h * 1.5, -h * 1.5]},
                 {"type": "LineString", "coordinates": [[-h, 1000], [h, 1000]]},
             ]},
             "properties": {"gid": "gc"}},
        ],
    }
    p = tmp_path / "gc.geojson"
    p.write_text(json.dumps(fc))
    df = GJ.read_geojson(spark, str(p))
    rows = df.withColumn(
        "gid", F.get_json_object("properties", "$.gid")
    ).select("gid", "geom_wkt")
    assert rows.count() == 2
    tiles = geom_tiles.build_geom_tiles(rows, ["gid"], z=3, id_col="gid")
    decoded = decode.decode_tiles(tiles).toPandas()
    assert len(decoded) >= 2


def test_linestrings_and_point_system_port(spark):
    """Port of 'pbf vector tile from linestring geojson'
    (test/vector_tile_pbf.cpp:573-645): the reference's own fixture
    through source -> reproject -> z0 tile -> decode. Pins: one layer,
    exactly 3 features (2 linestrings + 1 point), and the point feature
    carrying typed x=0 / y=10 / pbool=false through the Value-variant
    encode (encode_value int/bool legs)."""
    import os

    from mapnik_vector_tile_spark.operators import decode, geom_tiles

    path = "/root/reference/test/data/linestrings_and_point.geojson"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference checkout not mounted")
    df = GJ.read_geojson(spark, path)
    rows = df.select(
        F.get_json_object("properties", "$.x").cast("int").alias("x"),
        F.get_json_object("properties", "$.y").cast("int").alias("y"),
        F.get_json_object("properties", "$.pbool").cast("boolean").alias("pbool"),
        F.monotonically_increasing_id().cast("string").alias("fid"),
        "geom_wkt",
    )
    merc = geom_tiles.reproject_geoms(
        rows, "+init=epsg:4326", "+init=epsg:3857", emit="gpack"
    )
    tiles = geom_tiles.build_geom_tiles(merc, ["x", "y", "pbool", "fid"], z=0,
                                        id_col="fid")
    tp = tiles.toPandas()
    assert len(tp) == 1 and bool(tp.iloc[0]["painted"])
    dec = decode.decode_tiles(tiles).toPandas()
    assert len(dec) == 3
    assert sorted(dec["geom_type"]) == [1, 2, 2]  # 2 linestrings + 1 point
    assert set(dec["layer"]) == {"layer"}
    pt = dec[dec["geom_type"] == 1].iloc[0]
    assert pt["props"]["x"] == "0"
    assert pt["props"]["y"] == "10"
    assert pt["props"]["pbool"] == "False"
    assert pt["geom_wkt"].startswith("POINT(")
    # the two linestrings decode with >=2 vertices each
    for _, r in dec[dec["geom_type"] == 2].iterrows():
        assert r["geom_wkt"].startswith(("LINESTRING(", "MULTILINESTRING("))
