"""Distributed general-geometry tiles, validity checker, general-polygon
PIP refine, buffered assignment."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapnik_vector_tile_spark import tilemath
from mapnik_vector_tile_spark.functions import geometry as G
from mapnik_vector_tile_spark.operators import assign, decode, geom_tiles, pip, validity
from mapnik_vector_tile_spark.sources import images as IMG


@pytest.fixture(scope="module")
def geoms(spark):
    """Mercator-space WKT fixtures: a line crossing several z3 tiles, a
    polygon inside one tile, a point."""
    h = tilemath.HALF_OF_EQUATOR
    q = h / 4.0
    rows = [
        ("line_eq", f"LINESTRING(-{2.5*q} 1000,{2.5*q} 1000)"),       # crosses 6 z3 tiles
        ("poly_one", f"POLYGON(({q*0.1} {q*0.1},{q*0.9} {q*0.1},{q*0.9} {q*0.9},{q*0.1} {q*0.9},{q*0.1} {q*0.1}))"),
        ("pt", f"POINT({q*1.5} -{q*1.5})"),
    ]
    return spark.createDataFrame(rows, "gid string, geom_wkt string")


def test_envelope_assignment_explodes_crossing_line(spark, geoms):
    enveloped = geom_tiles.with_envelope(geoms)
    assigned = geom_tiles.assign_tiles_by_envelope(enveloped, 3)
    counts = {r["gid"]: r["n"] for r in assigned.groupBy("gid").agg(F.count("*").alias("n")).collect()}
    assert counts["pt"] == 1
    assert counts["poly_one"] == 1
    assert counts["line_eq"] >= 5  # spans most of the equator row


def test_geom_tiles_clip_and_roundtrip(spark, geoms):
    tiles = geom_tiles.build_geom_tiles(
        geoms, prop_cols=["gid"], z=3, id_col="gid"
    ).cache()
    assert tiles.where(F.col("painted")).count() >= 7
    decoded = decode.decode_tiles(tiles).toPandas()
    # every decoded piece of the line stays within its tile's bbox
    for _, row in decoded.iterrows():
        if row["props"]["gid"] != "line_eq":
            continue
        kind, val = G.from_wkt(row["geom_wkt"])
        assert kind in ("linestring", "multilinestring")
        minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(row["x"], row["y"], row["z"])
        arr = val if kind == "linestring" else np.vstack(val)
        ts = (maxx - minx) / 4096.0
        assert arr[:, 0].min() >= minx - ts and arr[:, 0].max() <= maxx + ts
    # polygon decodes as polygon with 5 ring points (square)
    poly_rows = [r for _, r in decoded.iterrows() if r["props"]["gid"] == "poly_one"]
    assert len(poly_rows) == 1 and poly_rows[0]["geom_type"] == 3


def test_geom_tiles_simplification_applies(spark):
    h = tilemath.HALF_OF_EQUATOR
    q = h / 4.0
    # zigzag line with sub-tolerance wiggles -> simplified to 2 points
    pts = ",".join(f"{q*0.1 + i*q*0.05} {1000 + (i % 2)}" for i in range(10))
    df = spark.createDataFrame([("zig", f"LINESTRING({pts})")], "gid string, geom_wkt string")
    tiles = geom_tiles.build_geom_tiles(df, ["gid"], z=3, simplify_distance=50.0, id_col="gid")
    decoded = decode.decode_tiles(tiles).toPandas()
    kind, val = G.from_wkt(decoded.iloc[0]["geom_wkt"])
    assert kind == "linestring" and len(val) == 2


def test_validity_clean_tiles(spark, images_small):
    located = IMG.with_location(images_small.limit(300))
    from mapnik_vector_tile_spark.operators import encode

    tiles = encode.build_point_tiles(
        assign.assign_tiles(located, 3), ["image_id"], order_col="image_id"
    )
    findings, stats = validity.validate_tiles(tiles)
    assert findings.count() == 0
    st = stats.toPandas()
    assert st["n_point"].sum() == 300
    assert (st["version"] == 2).all() and (st["extent"] == 4096).all()


def test_validity_flags_corrupt_tile(spark):
    import zlib

    from mapnik_vector_tile_spark.functions import pbf

    # layer without required name; feature with OOB tag + bad geometry
    bad_feature = pbf.encode_feature(7, [5, 9], 1, [0])  # zero-count MoveTo
    buf = bytearray()
    pbf.add_len_field(buf, 2, bad_feature)
    pbf.add_varint_field(buf, 15, 2)
    noname_layer = bytes(buf)
    named = pbf.encode_layer("ok", [bad_feature], ["k"], [pbf.encode_value("v")])
    tile = zlib.compress(pbf.encode_tile([noname_layer, named]))
    df = spark.createDataFrame([(0, 0, 0, tile)], "z int, x long, y long, tile binary")
    findings, _ = validity.validate_tiles(df)
    codes = {r["code"] for r in findings.collect()}
    assert "LAYER_HAS_NO_NAME" in codes and "LAYER_HAS_NO_EXTENT" in codes
    assert "FEATURE_TAG_KEY_OOB" in codes and "FEATURE_TAG_VALUE_OOB" in codes
    assert "FEATURE_GEOMETRY_INVALID" in codes


def test_validity_full_enum_cases():
    """The reference's 25-code enum, exercised message by message
    (ports test/unit/is_valid/{feature,value}_is_valid.cpp cases)."""
    from mapnik_vector_tile_spark.functions import pbf

    # --- value_is_valid ---
    assert validity.value_is_valid(b"") == {"VALUE_NO_VALUE"}
    assert validity.value_is_valid(pbf.encode_value("ok")) == set()
    two = pbf.encode_value("a") + pbf.encode_value("b")
    assert validity.value_is_valid(two) == {"VALUE_MULTIPLE_VALUES"}
    unk = bytearray()
    pbf.add_varint_field(unk, 9, 3)  # unknown Value field 9
    # reference semantics: an unknown tag never sets has_value, so
    # VALUE_NO_VALUE accompanies it (is_valid.hpp:239-270)
    assert validity.value_is_valid(bytes(unk)) == {
        "VALUE_HAS_UNKNOWN_TAG", "VALUE_NO_VALUE"
    }

    # --- feature_is_valid ---
    cnt = {"pt": 0, "ln": 0, "pg": 0, "uk": 0, "ra": 0}
    ok_feat = pbf.encode_feature(1, [0, 0], 1, [9, 2, 2])
    assert validity.feature_is_valid(ok_feat, cnt) == set()
    assert cnt["pt"] == 1
    assert validity.feature_is_valid(b"", cnt) == {"FEATURE_IS_EMPTY"}
    # geometry but no type
    buf = bytearray()
    pbf.add_len_field(buf, 4, pbf.pack_varints([9, 2, 2]))
    assert "FEATURE_NO_GEOM_TYPE" in validity.feature_is_valid(bytes(buf), cnt)
    # duplicate ids / tags / geoms
    dup = bytearray()
    pbf.add_varint_field(dup, 1, 1)
    pbf.add_varint_field(dup, 1, 2)
    errs = validity.feature_is_valid(bytes(dup), cnt)
    assert "FEATURE_MULTIPLE_ID" in errs
    dupg = bytearray()
    pbf.add_varint_field(dupg, 3, 1)
    pbf.add_len_field(dupg, 4, pbf.pack_varints([9, 2, 2]))
    pbf.add_len_field(dupg, 4, pbf.pack_varints([9, 2, 2]))
    assert "FEATURE_MULTIPLE_GEOM" in validity.feature_is_valid(bytes(dupg), cnt)
    # raster + geometry exclusivity, invalid type, unknown tag
    rg = bytearray()
    pbf.add_len_field(rg, 4, pbf.pack_varints([9, 2, 2]))
    pbf.add_len_field(rg, 5, b"px")
    assert "FEATURE_RASTER_AND_GEOM" in validity.feature_is_valid(bytes(rg), cnt)
    badt = bytearray()
    pbf.add_varint_field(badt, 3, 9)
    pbf.add_len_field(badt, 4, pbf.pack_varints([9, 2, 2]))
    assert "FEATURE_HAS_INVALID_GEOM_TYPE" in validity.feature_is_valid(bytes(badt), cnt)
    unkf = bytearray()
    pbf.add_varint_field(unkf, 11, 1)
    assert "FEATURE_HAS_UNKNOWN_TAG" in validity.feature_is_valid(bytes(unkf), cnt)


def test_validity_tile_and_layer_codes(spark):
    import zlib

    from mapnik_vector_tile_spark.functions import pbf

    feat = pbf.encode_feature(1, [0, 0], 1, [9, 2, 2])
    # duplicate layer names + differing versions + unknown tile tag
    l1 = pbf.encode_layer("dup", [feat], ["k"], [pbf.encode_value("v")], version=1)
    l2 = pbf.encode_layer("dup", [feat], ["k"], [pbf.encode_value("v")], version=2)
    tile_buf = bytearray(pbf.encode_tile([l1, l2]))
    pbf.add_varint_field(tile_buf, 9, 7)  # unknown Tile field
    df = spark.createDataFrame(
        [(0, 0, 0, zlib.compress(bytes(tile_buf)))],
        "z int, x long, y long, tile binary",
    )
    findings, _ = validity.validate_tiles(df)
    codes = {r["code"] for r in findings.collect()}
    assert "TILE_REPEATED_LAYER_NAMES" in codes
    assert "TILE_HAS_DIFFERENT_VERSIONS" in codes
    assert "TILE_HAS_UNKNOWN_TAG" in codes

    # multiple name/extent/version + unsupported version + raster+vector
    lb = bytearray()
    pbf.add_len_field(lb, 1, b"a")
    pbf.add_len_field(lb, 1, b"b")
    pbf.add_varint_field(lb, 5, 4096)
    pbf.add_varint_field(lb, 5, 4096)
    pbf.add_varint_field(lb, 15, 7)
    pbf.add_varint_field(lb, 15, 7)
    rast = bytearray()
    pbf.add_len_field(rast, 5, b"img")
    pbf.add_len_field(lb, 2, bytes(rast))
    pbf.add_len_field(lb, 2, feat)
    df2 = spark.createDataFrame(
        [(0, 0, 0, zlib.compress(pbf.encode_tile([bytes(lb)])))],
        "z int, x long, y long, tile binary",
    )
    findings2, stats2 = validity.validate_tiles(df2)
    codes2 = {r["code"] for r in findings2.collect()}
    for expected in (
        "LAYER_HAS_MULTIPLE_NAME", "LAYER_HAS_MULTIPLE_EXTENT",
        "LAYER_HAS_MULTIPLE_VERSION", "LAYER_HAS_UNSUPPORTED_VERSION",
        "LAYER_HAS_RASTER_AND_VECTOR",
    ):
        assert expected in codes2, (expected, codes2)
    st = stats2.toPandas()
    assert st.iloc[0]["n_raster"] == 1 and st.iloc[0]["n_point"] == 1


def test_pip_refine_general_polygon(spark):
    """Filter-and-refine against a non-rectangular polygon (triangle)."""
    tri_x = [0.0, 10.0, 5.0, 0.0]
    tri_y = [0.0, 0.0, 10.0, 0.0]
    pts = [
        ("in_center", 5.0, 3.0),
        ("out_left", 1.0, 8.0),
        ("out_right", 9.0, 8.0),
        ("in_low", 2.0, 1.0),
    ]
    pdf = spark.createDataFrame(
        [(pid, x, y, 1, tri_x, tri_y) for pid, x, y in pts],
        "pid string, mx double, my double, poly_id int, ring_x array<double>, ring_y array<double>",
    )
    out = pip.pip_refine_polygons(pdf, None).toPandas().set_index("pid")
    assert bool(out.loc["in_center", "inside"]) is True
    assert bool(out.loc["in_low", "inside"]) is True
    assert bool(out.loc["out_left", "inside"]) is False
    assert bool(out.loc["out_right", "inside"]) is False


def test_buffered_assignment_includes_neighbors(spark):
    """A point just inside a tile edge also lands in the neighbour when
    the buffer covers it (reference buffered-extent rule)."""
    z = 3
    minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(4, 3, z)
    # point 1/10000 of a tile inside the left edge of tile (4,3)
    eps = (maxx - minx) / 10000.0
    lon = float(np.degrees((minx + eps) / tilemath.EARTH_RADIUS))
    lat = 5.0
    df = spark.createDataFrame([("p1", lon, lat)], "pid string, lon double, lat double")
    no_buf = assign.assign_tiles_buffered(df, z, buffer_px=0).select("x", "y").collect()
    assert {(r["x"], r["y"]) for r in no_buf} == {(4, 3)}
    buffered = assign.assign_tiles_buffered(df, z, buffer_px=128).select("x", "y").collect()
    cells = {(r["x"], r["y"]) for r in buffered}
    assert (4, 3) in cells and (3, 3) in cells  # neighbour across the edge


def test_pip_join_matches_numpy_oracle_with_buffers(spark, images_small):
    """FIXTURES §5 expected_join_rows: PIP against tile_boundaries at
    buffer 0 and 128 px, pinned by a pure-numpy oracle."""
    located = IMG.with_location(images_small).cache()
    src = located.select("image_id", "lon", "lat").toPandas()
    mx, my = tilemath.mercator_np(src["lon"].to_numpy(), src["lat"].to_numpy())

    for buffer_px in (0, 128):
        boundaries = IMG.tile_boundaries(spark, zooms=(3,), buffer_px=buffer_px)
        got = (
            pip.pip_join_rect(located, boundaries, z=3)
            .select("image_id", "x", "y", "inside")
            .toPandas()
            .sort_values(["image_id", "x", "y"])
            .reset_index(drop=True)
        )
        # numpy oracle: containment in the buffered bbox of the point's
        # own z3 cell (the join is cell-keyed, so exactly one row each)
        xt, yt = tilemath.lonlat_to_tile_np(src["lon"].to_numpy(), src["lat"].to_numpy(), 3)
        minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(xt, yt, 3)
        buf = buffer_px / 4096.0 * (maxx - minx)
        inside = (
            (mx >= minx - buf) & (mx < maxx + buf) & (my >= miny - buf) & (my < maxy + buf)
        )
        exp = (
            pd.DataFrame({"image_id": src["image_id"], "x": xt, "y": yt, "inside": inside})
            .sort_values(["image_id", "x", "y"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) == 2000
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        if buffer_px == 0:
            assert got["inside"].all()  # a point is inside its own cell
