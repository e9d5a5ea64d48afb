"""GeoJSON source (S8 — the reference's mapnik geojson datasource,
test/system/*geojson* inputs). Reads FeatureCollection / Feature /
bare-geometry documents into (geom_wkt, properties...) rows.

Spark-first shape: the FILE LISTING is distributed (spark.read.text
with wholetext per file), the per-document parse is stdlib json inside
mapInPandas — no GDAL. Coordinates pass through unchanged; pair with
geom_tiles.reproject_geoms for non-4326 pipelines (GeoJSON is 4326 by
spec) and build_geom_tiles for tiling.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _coords_to_wkt(gtype: str, coords) -> str:
    def pt(c):
        return f"{c[0]} {c[1]}"

    def seq(cs):
        return ",".join(pt(c) for c in cs)

    gtype = gtype.lower()
    if gtype == "point":
        return f"POINT({pt(coords)})"
    if gtype == "multipoint":
        return f"MULTIPOINT({seq(coords)})"
    if gtype == "linestring":
        return f"LINESTRING({seq(coords)})"
    if gtype == "multilinestring":
        return "MULTILINESTRING(" + ",".join(f"({seq(l)})" for l in coords) + ")"
    if gtype == "polygon":
        return "POLYGON(" + ",".join(f"({seq(r)})" for r in coords) + ")"
    if gtype == "multipolygon":
        return (
            "MULTIPOLYGON("
            + ",".join("(" + ",".join(f"({seq(r)})" for r in poly) + ")" for poly in coords)
            + ")"
        )
    raise ValueError(f"unsupported GeoJSON geometry {gtype!r}")


def geojson_obj_to_rows(obj: dict) -> list[tuple[str, str]]:
    """One parsed GeoJSON document -> [(geom_wkt, properties_json)]."""
    t = str(obj.get("type", "")).lower()
    if t == "featurecollection":
        out = []
        for feat in obj.get("features", []):
            out.extend(geojson_obj_to_rows(feat))
        return out
    if t == "feature":
        geom = obj.get("geometry")
        if geom is None:
            return []
        props = json.dumps(obj.get("properties") or {}, sort_keys=True)
        return [(wkt, props) for wkt in _geom_to_wkts(geom)]
    # bare geometry document (incl. GeometryCollection)
    if t in ("point", "multipoint", "linestring", "multilinestring",
             "polygon", "multipolygon", "geometrycollection"):
        return [(wkt, "{}") for wkt in _geom_to_wkts(obj)]
    raise ValueError(f"unsupported GeoJSON document type {obj.get('type')!r}")


def _geom_to_wkts(geom: dict) -> list[str]:
    """Flatten a GeoJSON geometry into one-or-more WKT strings.

    GeometryCollections are flattened into their member geometries (one
    row per member, shared properties) — the reference's clipper visits
    each member individually (vector_tile_geometry_clipper.hpp:122-128),
    so member-rows give identical tiling output while keeping every
    downstream stage (gpack/with_envelope) single-kind."""
    t = str(geom.get("type", "")).lower()
    if not t:
        return []
    if t == "geometrycollection":
        out: list[str] = []
        for g in geom.get("geometries", []):
            out.extend(_geom_to_wkts(g))
        return out
    return [_coords_to_wkt(geom["type"], geom["coordinates"])]


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """-> DataFrame(geom_wkt string, properties string, source_file
    string). One task per file; property access via get_json_object /
    from_json downstream (schema-on-read, like the reference's datasource
    descriptors)."""
    files = spark.read.text(path, wholetext=True).selectExpr(
        "value", "input_file_name() as source_file"
    )

    def kernel(iterator):
        for pdf in iterator:
            rows = []
            for doc, src in zip(pdf["value"], pdf["source_file"]):
                for wkt, props in geojson_obj_to_rows(json.loads(doc)):
                    rows.append((wkt, props, src))
            if rows:
                yield pd.DataFrame(rows, columns=["geom_wkt", "properties", "source_file"])

    return files.mapInPandas(
        kernel, schema="geom_wkt string, properties string, source_file string"
    )
