"""General-geometry slow-path merge (operators.composite.
merge_tiles_reencode_geom): the reference's composite re-encode leg
(src/vector_tile_composite.hpp:78-97 + vector_tile_load_tile.hpp:53-137)
— mixed point/line/polygon layers across sources, first-wins per layer
name (src/vector_tile_tile.ipp:19-43), Value variant types preserved.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.functions import compression as Z
from mapnik_vector_tile_spark.functions import pbf
from mapnik_vector_tile_spark.operators import composite, decode, geom_tiles


def _geoms(spark, seed: int, kind: str, n: int = 40):
    rng = np.random.default_rng(seed)
    half = 2.0037508342789244e7
    rows = []
    for i in range(n):
        cx = float(rng.uniform(-half * 0.8, half * 0.8))
        cy = float(rng.uniform(-half * 0.5, half * 0.5))
        s = float(rng.uniform(half / 256, half / 64))
        if kind == "line":
            wkt = f"LINESTRING({cx} {cy},{cx + s} {cy + s},{cx + 2 * s} {cy})"
        elif kind == "poly":
            wkt = (f"POLYGON(({cx} {cy},{cx + s} {cy},{cx + s} {cy + s},"
                   f"{cx} {cy + s},{cx} {cy}))")
        else:
            wkt = f"POINT({cx} {cy})"
        rows.append((f"{kind}{i:03d}", wkt))
    return spark.createDataFrame(rows, "gid string, geom_wkt string")


@pytest.fixture(scope="module")
def sources(spark):
    """source 0: roads(lines)+parks(polys); source 1: roads(OTHER lines,
    must lose)+pois(points). All at z2."""
    z = 2
    roads0 = geom_tiles.build_geom_tiles(
        _geoms(spark, 1, "line"), ["gid"], z=z, layer_name="roads", id_col="gid"
    )
    parks0 = geom_tiles.build_geom_tiles(
        _geoms(spark, 2, "poly"), ["gid"], z=z, layer_name="parks", id_col="gid"
    )
    roads1 = geom_tiles.build_geom_tiles(
        _geoms(spark, 3, "line"), ["gid"], z=z, layer_name="roads", id_col="gid"
    )
    pois1 = geom_tiles.build_geom_tiles(
        _geoms(spark, 4, "point"), ["gid"], z=z, layer_name="pois", id_col="gid"
    )
    src0 = composite.merge_tiles_fast(
        roads0.withColumn("source", F.lit(0)).unionByName(
            parks0.withColumn("source", F.lit(0))
        ).select("z", "x", "y", "tile", "source")
    ).withColumn("source", F.lit(0))
    src1 = composite.merge_tiles_fast(
        roads1.withColumn("source", F.lit(1)).unionByName(
            pois1.withColumn("source", F.lit(1))
        ).select("z", "x", "y", "tile", "source")
    ).withColumn("source", F.lit(1))
    both = src0.select("z", "x", "y", "tile", "source").unionByName(
        src1.select("z", "x", "y", "tile", "source")
    ).cache()
    both.count()
    return {"z": z, "tiles": both, "winners": {"roads": roads0, "parks": parks0,
                                               "pois": pois1}}


def _decoded_key_set(df):
    pdf = decode.decode_tiles_packed(df).toPandas()
    out = set()
    for r in pdf.itertuples():
        xs = None if r.xs is None else tuple(round(float(v), 3) for v in r.xs)
        out.add((r.z, r.x, r.y, r.layer, r.props.get("gid"), r.kind, xs))
    return out


def test_merge_geom_first_wins_and_conservation(spark, sources):
    merged = composite.merge_tiles_reencode_geom(sources["tiles"]).cache()
    mp = merged.toPandas()
    assert (mp["n_layers"] > 0).any()
    got = _decoded_key_set(merged)
    want = set()
    for lname, src in sources["winners"].items():
        for k in _decoded_key_set(src):
            want.add(k)
    # every winning-source feature survives with identical quantized
    # geometry; no losing-source feature appears
    assert got == want
    lose = _decoded_key_set(
        composite.merge_tiles_reencode_geom(
            sources["tiles"].withColumn(  # flip source order -> roads1 wins
                "source", F.lit(1) - F.col("source")
            )
        )
    )
    assert lose != want  # the flipped merge picks the other roads


def test_merge_geom_layer_order_and_names(spark, sources):
    merged = composite.merge_tiles_reencode_geom(sources["tiles"])
    pdf = merged.where(F.col("n_layers") >= 2).toPandas()
    assert len(pdf) > 0
    saw_orders = set()
    for r in pdf.itertuples():
        names = [
            pbf.decode_layer(lb)["name"]
            for lb in pbf.decode_tile(Z.decompress(bytes(r.tile)))
        ]
        assert len(names) == len(set(names))  # no duplicate layer names
        saw_orders.add(tuple(names))
        # source-0 layers precede source-1 layers
        if "pois" in names:
            assert names.index("pois") > max(
                names.index(n) for n in names if n != "pois"
            ) or names == ["pois"]
    assert any(len(o) >= 2 for o in saw_orders)


def test_merge_geom_preserves_value_types_and_ids(spark):
    """int (with nulls) / double / bool / string props come back as the
    same Value variant family after the merge re-encode."""
    half = 2.0037508342789244e7
    rows = [
        ("a", 7, 1.5, True, "x", f"LINESTRING(0 0,{half/8} {half/8})"),
        ("b", None, 2.5, False, "y",
         f"POLYGON((0 0,{half/8} 0,{half/8} {half/8},0 0))"),
        ("c", 9, 3.5, True, "z", f"POINT({half/16} {half/16})"),
    ]
    df = spark.createDataFrame(
        rows, "gid string, rank int, score double, flag boolean, tag string, "
              "geom_wkt string"
    )
    tiles = geom_tiles.build_geom_tiles(
        df, ["gid", "rank", "score", "flag", "tag"], z=0, id_col="gid"
    ).withColumn("source", F.lit(0))
    merged = composite.merge_tiles_reencode_geom(tiles).toPandas()
    assert len(merged) == 1
    lay = pbf.decode_layer(pbf.decode_tile(Z.decompress(bytes(merged["tile"][0])))[0])
    by_type = {}
    for v in lay["values"]:
        by_type.setdefault(type(v).__name__, set()).add(v)
    assert {7, 9} <= by_type.get("int", set())
    assert {1.5, 2.5, 3.5} <= by_type.get("float", set())
    assert {True, False} <= by_type.get("bool", set())
    assert {"a", "b", "c", "x", "y", "z"} <= by_type.get("str", set())
    # null rank on 'b' is a dropped tag, not a value
    feats = [pbf.decode_feature(m) for m in lay["features"]]
    tag_counts = sorted(len(f["tags"]) // 2 for f in feats)
    assert tag_counts == [4, 5, 5]


def test_merge_geom_preserves_raster_features(spark):
    """Feature.raster bytes survive the re-encode merge: point+raster
    features keep geometry AND raster; a raster-only feature (no
    geometry) re-encodes as a geometry-less UNKNOWN-type feature
    (raster_to_feature semantics, vector_tile_geometry_feature.hpp:23-34)."""
    from mapnik_vector_tile_spark.operators import assign, encode as E

    pts = [
        ("r0", -10.0, 10.0, bytearray(b"\x89PNG-fake-0")),
        ("r1", 40.0, -20.0, bytearray(b"\x89PNG-fake-1")),
        ("g2", 100.0, 30.0, None),
    ]
    df = spark.createDataFrame(
        pts, "gid string, lon double, lat double, patch binary"
    )
    t_pts = E.build_point_tiles(
        assign.assign_tiles(df, 1), ["gid"], layer_name="imgs",
        raster_col="patch", order_col="gid",
    )
    # plus a hand-built tile holding a raster-ONLY feature (type 0, no
    # geometry) in its own layer — the foreign-tile shape
    ro_feat = pbf.encode_feature(7, [0, 0], 0, [], raster=b"RAW-raster-bytes")
    ro_layer = pbf.encode_layer(
        "radar", [ro_feat], ["kind"], [pbf.encode_value("precip")]
    )
    ro_tile = Z.compress(pbf.encode_tile([ro_layer]))
    extra = spark.createDataFrame(
        [(1, 0, 0, bytearray(ro_tile))], "z int, x long, y long, tile binary"
    )
    merged = composite.merge_tiles_reencode_geom(
        t_pts.select("z", "x", "y", "tile").withColumn("source", F.lit(0))
        .unionByName(extra.withColumn("source", F.lit(0)))
    ).cache()
    dec = decode.decode_tiles_packed(merged).toPandas()
    by_layer = {}
    for r in dec.itertuples():
        by_layer.setdefault(r.layer, []).append(r)
    imgs = by_layer["imgs"]
    assert len(imgs) == 3
    got = {r.props["gid"]: (None if r.raster is None else bytes(r.raster),
                            r.kind) for r in imgs}
    assert got["r0"] == (b"\x89PNG-fake-0", "multipoint")
    assert got["r1"] == (b"\x89PNG-fake-1", "multipoint")
    assert got["g2"] == (None, "multipoint")
    radar = by_layer["radar"]
    assert len(radar) == 1
    assert bytes(radar[0].raster) == b"RAW-raster-bytes"
    assert radar[0].kind is None  # geometry-less raster feature
    assert radar[0].props == {"kind": "precip"}
    assert radar[0].feature_id == 7  # id preserved
    assert radar[0].geom_type == 0


def test_merge_geom_single_source_roundtrip(spark, sources):
    """Merging ONE source re-encodes to the same decoded feature set."""
    one = sources["tiles"].where(F.col("source") == 0)
    merged = composite.merge_tiles_reencode_geom(one)
    assert _decoded_key_set(merged) == _decoded_key_set(one)
