"""Tile validity checker (K12 — src/vector_tile_is_valid.hpp:19-377).

The reference enumerates 25 structural error codes over
tile/layer/feature/value; this module reproduces the checks that apply
to our byte format as a batch operator: tile binary -> one row per
finding (empty result = valid), plus per-tile feature-type counters
(A5, is_valid.hpp:122-237).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from mapnik_vector_tile_spark.functions import commands as Cmd
from mapnik_vector_tile_spark.functions import compression as Z
from mapnik_vector_tile_spark.functions import pbf

VALIDITY_SCHEMA = (
    "z int, x long, y long, layer string, feature_id long, code string, detail string"
)
STATS_SCHEMA = (
    "z int, x long, y long, layer string, n_point int, n_linestring int, "
    "n_polygon int, n_unknown int, n_raster int, n_features int, "
    "n_keys int, n_values int, version int, extent int"
)


def validate_tile(z: int, x: int, y: int, tile: bytes) -> tuple[list, list]:
    """-> (findings, stats) rows for one tile."""
    findings: list[tuple] = []
    stats: list[tuple] = []
    if not tile:
        return findings, stats
    try:
        data = Z.decompress(bytes(tile))
    except Exception as exc:
        return [(z, x, y, None, None, "TILE_DECOMPRESS_ERROR", str(exc)[:100])], stats
    try:
        layers = pbf.decode_tile(data)
    except Exception as exc:
        return [(z, x, y, None, None, "TILE_PBF_ERROR", str(exc)[:100])], stats
    seen_names = set()
    for layer_bytes in layers:
        try:
            layer = pbf.decode_layer(layer_bytes)
        except ValueError as exc:  # missing required name
            findings.append((z, x, y, None, None, "LAYER_MISSING_NAME", str(exc)[:100]))
            continue
        name = layer["name"]
        if name in seen_names:  # duplicate layer names invalid (is_valid.hpp)
            findings.append((z, x, y, name, None, "TILE_REPEATED_LAYER_NAMES", ""))
        seen_names.add(name)
        if layer["version"] not in (1, 2):
            findings.append((z, x, y, name, None, "LAYER_UNSUPPORTED_VERSION", str(layer["version"])))
        if not layer["features"]:
            findings.append((z, x, y, name, None, "LAYER_HAS_NO_FEATURES", ""))
        counters = {"pt": 0, "ln": 0, "pg": 0, "uk": 0, "ra": 0}
        nkeys, nvals = len(layer["keys"]), len(layer["values"])
        for fmsg in layer["features"]:
            feat = pbf.decode_feature(fmsg)
            fid = feat["id"]
            gtype = feat["type"]
            if feat["raster"] is not None:
                counters["ra"] += 1
            if gtype == Cmd.POINT:
                counters["pt"] += 1
            elif gtype == Cmd.LINESTRING:
                counters["ln"] += 1
            elif gtype == Cmd.POLYGON:
                counters["pg"] += 1
            else:
                counters["uk"] += 1
                if feat["raster"] is None:
                    findings.append(
                        (z, x, y, name, fid, "FEATURE_HAS_INVALID_GEOM_TYPE", str(gtype))
                    )
            if not feat["geometry"] and feat["raster"] is None:
                findings.append((z, x, y, name, fid, "FEATURE_NO_GEOM_OR_RASTER", ""))
            tags = feat["tags"]
            if len(tags) % 2 != 0:
                findings.append((z, x, y, name, fid, "FEATURE_ODD_TAG_COUNT", str(len(tags))))
            for i in range(0, len(tags) - 1, 2):
                if tags[i] >= nkeys:
                    findings.append((z, x, y, name, fid, "FEATURE_TAG_KEY_OOB", str(tags[i])))
                if tags[i + 1] >= nvals:
                    findings.append((z, x, y, name, fid, "FEATURE_TAG_VALUE_OOB", str(tags[i + 1])))
            if feat["geometry"]:
                try:
                    Cmd.decode_geometry(feat["geometry"], gtype, version=layer["version"])
                except Cmd.DecodeError as exc:
                    findings.append(
                        (z, x, y, name, fid, "FEATURE_GEOMETRY_INVALID", str(exc)[:100])
                    )
        stats.append(
            (
                z, x, y, name, counters["pt"], counters["ln"], counters["pg"],
                counters["uk"], counters["ra"], len(layer["features"]),
                nkeys, nvals, layer["version"], layer["extent"],
            )
        )
    return findings, stats


def validate_tiles(tiles: DataFrame) -> tuple[DataFrame, DataFrame]:
    """-> (findings_df, stats_df) over a tile DataFrame."""

    def run(iterator, idx):
        for pdf in iterator:
            out = []
            for _, row in pdf.iterrows():
                res = validate_tile(int(row["z"]), int(row["x"]), int(row["y"]), row["tile"])
                out.extend(res[idx])
            if out:
                cols = (
                    ["z", "x", "y", "layer", "feature_id", "code", "detail"]
                    if idx == 0
                    else [
                        "z", "x", "y", "layer", "n_point", "n_linestring", "n_polygon",
                        "n_unknown", "n_raster", "n_features", "n_keys", "n_values",
                        "version", "extent",
                    ]
                )
                yield pd.DataFrame(out, columns=cols)

    slim = tiles.select("z", "x", "y", "tile")
    findings = slim.mapInPandas(lambda it: run(it, 0), schema=VALIDITY_SCHEMA)
    stats = slim.mapInPandas(lambda it: run(it, 1), schema=STATS_SCHEMA)
    return findings, stats
