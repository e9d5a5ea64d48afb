"""Non-SQL-expressible operators exposed to the driver (rows-only checks).

Each callable (spark, sf_dir) -> DataFrame exercises a pipeline stage the
DuckDB oracle can't express: pbf encode/decode round-trip, geometry
kernel goldens, raster invariants, composite merge. Full semantic
assertions live in tests/; these return deterministic row sets so the
driver can at least pin row counts + schemas across rounds.

They run on the deterministic images fixture (FIXTURES.md §1), not the
TPC-H tables — sf_dir only scales the fixture row count.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_FIXTURE_ROWS = {"sf0.001": 1000, "sf0.01": 4000, "sf0.1": 10000}


def _fixture_rows(sf_dir: str) -> int:
    for k, v in _FIXTURE_ROWS.items():
        if k in sf_dir:
            return v
    return 2000


def _located(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapnik_vector_tile_spark.sources import images as IMG

    path = IMG.ensure_images(spark, _fixture_rows(sf_dir))
    return IMG.with_location(spark.read.parquet(path))


def q_tile_encode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images -> z13 tiles (pbf+zlib) -> decode -> per-tile feature counts.
    Round-trip conservation: sum(n_decoded) == fixture rows."""
    from mapnik_vector_tile_spark.operators import assign, decode, encode

    located = _located(spark, sf_dir)
    assigned = assign.assign_tiles(located, 13)
    tiles = encode.build_point_tiles(
        assigned, prop_cols=["image_id", "caption", "fmt"], order_col="image_id"
    )
    decoded = decode.decode_tiles(tiles)
    return (
        decoded.groupBy("z", "x", "y", "layer")
        .agg(F.count("*").alias("n_decoded"), F.min("feature_id").alias("min_fid"))
    )


def q_geom_kernel_goldens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's round-trip WKT goldens evaluated through the
    kernels (transform -> simplify -> clip -> encode -> decode)."""
    from mapnik_vector_tile_spark.functions import commands as C
    from mapnik_vector_tile_spark.functions import geometry as G

    vt = G.ViewTransform(-180.0, -90.0, 180.0, 90.0, 256000, 256000)
    clip = (0, 0, 256000, 256000)
    cases = [
        ("rt_point", "POINT(0 0)", 0.0),
        ("rt_line", "LINESTRING(0 0,100 100)", 0.0),
        ("simp_point", "POINT(-122 48)", 500.0),
        ("simp_mpoint", "MULTIPOINT(-122 48,-123 49)", 500.0),
        ("simp_line_dp", "LINESTRING(0 0,1 1,2 2,100 100)", 500.0),
        (
            "simp_poly_hole",
            "POLYGON((0 0,-10 0,-10 10,0 10,0 0),(-7 7,-7 3,-3 3,-3 7,-7 7))",
            500.0,
        ),
        ("simp_line_oob", "LINESTRING(-10000 0,-10000.1 0,100000 0)", 100.0),
    ]
    rows = []
    for case_id, wkt, simp in cases:
        tg = G.world_to_tile_geom(G.from_wkt(wkt), vt, clip, simplify_distance=simp)
        gtype, cmds = C.encode_geometry(tg)
        decoded = (
            G.to_wkt(
                C.decode_geometry(cmds, gtype, version=2, scale_x=1000.0, scale_y=-1000.0)
            )
            if gtype
            else None
        )
        rows.append((case_id, wkt, simp, decoded))
    return spark.createDataFrame(
        rows, "case_id string, input_wkt string, simplify double, decoded_wkt string"
    )


def q_raster_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster patch association: decode -> (passthrough | bilinear) ->
    re-encode per image; PSNR + caption equality per row
    (BASELINE.json per-row invariant). Runs on a deterministic slice."""
    from mapnik_vector_tile_spark.operators import raster_assoc

    located = _located(spark, sf_dir).limit(300)
    return raster_assoc.raster_patch_invariants(located)


def q_composite_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 fast path: merge two layer-disjoint tile sets per (z,x,y)."""
    from mapnik_vector_tile_spark.operators import assign, composite, encode

    located = _located(spark, sf_dir)
    assigned = assign.assign_tiles(located, 3)
    t1 = encode.build_point_tiles(assigned, ["image_id"], layer_name="a", order_col="image_id")
    t2 = encode.build_point_tiles(assigned, ["image_id"], layer_name="b", order_col="image_id")
    merged = composite.merge_tiles_fast(
        t1.withColumn("source", F.lit(1)).unionByName(t2.withColumn("source", F.lit(2)))
    )
    return merged.select("z", "x", "y", "n_features", "n_layers", "painted")


def q_knn_ring_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 scale path: cell-ring-expansion kNN on the images fixture;
    exactness asserted against brute force in tests/test_knn.py."""
    from mapnik_vector_tile_spark.operators import knn

    located = _located(spark, sf_dir)
    queries = located.orderBy("image_id").limit(20).select("image_id", "lon", "lat")
    return knn.knn_ring_expansion(located, queries, k=5, z=9)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN (scale path); exactness vs brute force is
    pinned in tests — here the driver pins rows/schema."""
    from mapnik_vector_tile_spark.operators import ann

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = vecs.orderBy("vec_id").limit(10).select("vec_id")
    return ann.lsh_topk(vecs, qs, k=5, n_planes=4, n_tables=6)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapnik_vector_tile_spark.operators import ann

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = vecs.orderBy("vec_id").limit(10).select("vec_id")
    return ann.ivf_topk(vecs, qs, k=5, n_lists=16, nprobe=4)


def q_dedup_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapnik_vector_tile_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_candidates(docs, n_perm=8, bands=4)


def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapnik_vector_tile_spark.operators import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textops.language_id(textops.quality_score(textops.token_count(docs)))
    return out.select(
        "doc_id", "n_tokens_ws", "n_tokens_bpe_est", "punct_ratio",
        "quality", "lang_pred",
    )


def q_build_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition lineage rows of a tile build (north rule)."""
    from mapnik_vector_tile_spark.operators import assign, encode
    from mapnik_vector_tile_spark.plans import lineage as L
    from mapnik_vector_tile_spark.sources import images as IMG

    path = IMG.ensure_images(spark, _fixture_rows(sf_dir))
    located = IMG.with_location(spark.read.parquet(path))
    tiles = encode.build_point_tiles(
        assign.assign_tiles(located, 13),
        prop_cols=["image_id", "caption", "fmt"], order_col="image_id",
    )
    snap = L.input_snapshot_id(spark, path)
    _, lineage = L.tiles_with_lineage(tiles, snap)
    return lineage


def q_geom_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General-geometry (WKT) tile pipeline: transform/simplify/clip/
    encode distributed, then decode round-trip counts per tile."""
    from mapnik_vector_tile_spark import tilemath
    from mapnik_vector_tile_spark.operators import decode, geom_tiles

    h = tilemath.HALF_OF_EQUATOR
    q = h / 4.0
    rows = [
        ("line_eq", f"LINESTRING(-{2.5 * q} 1000,{2.5 * q} 1000)"),
        ("poly_one", f"POLYGON(({q * 0.1} {q * 0.1},{q * 0.9} {q * 0.1},"
                     f"{q * 0.9} {q * 0.9},{q * 0.1} {q * 0.9},{q * 0.1} {q * 0.1}))"),
        ("pt", f"POINT({q * 1.5} -{q * 1.5})"),
        ("zig", "LINESTRING(" + ",".join(
            f"{q * 0.1 + i * q * 0.05} {1000 + (i % 2)}" for i in range(10)) + ")"),
    ]
    geoms = spark.createDataFrame(rows, "gid string, geom_wkt string")
    tiles = geom_tiles.build_geom_tiles(
        geoms, ["gid"], z=3, simplify_distance=50.0, id_col="gid"
    )
    return (
        decode.decode_tiles(tiles)
        .groupBy("z", "x", "y", "geom_type")
        .agg(F.count("*").alias("n"))
    )


def q_tile_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K12 validity checker over freshly built tiles: per-layer feature-
    type counters (findings asserted empty in tests)."""
    from mapnik_vector_tile_spark.operators import assign, encode, validity

    located = _located(spark, sf_dir)
    tiles = encode.build_point_tiles(
        assign.assign_tiles(located, 3), ["image_id"], order_col="image_id"
    )
    _findings, stats = validity.validate_tiles(tiles)
    return stats


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "geom_tiles_roundtrip": q_geom_tiles,
    "tile_validity_stats": q_tile_validity,
    "tile_encode_roundtrip": q_tile_encode_roundtrip,
    "geom_kernel_goldens": q_geom_kernel_goldens,
    "raster_invariants": q_raster_invariants,
    "composite_merge": q_composite_merge,
    "knn_ring_expansion": q_knn_ring_expansion,
    "ann_lsh_topk": q_ann_lsh,
    "ann_ivf_topk": q_ann_ivf,
    "dedup_lsh_candidates": q_dedup_lsh_candidates,
    "text_features": q_text_features,
    "build_lineage": q_build_lineage,
}
