"""Tile decode — mapInPandas inverse of operators.encode (S2/S3, K6/K7).

The reference's tile_datasource_pbf + tile_featureset_pbf pull model
(src/vector_tile_datasource_pbf.ipp:35-194,
src/vector_tile_featureset_pbf.ipp:113-325) becomes a batch kernel:
tile binary -> feature rows with decoded mercator lon/lat (or WKT) and
stringified properties. Used for round-trip verification and as the
decode scan of composite's slow path.

Decode applies tile_x/tile_y/scale like the reference:
scale = extent / tile_mercator_size(z); decoded coord =
tile_origin + px / scale (datasource_pbf.ipp:150-170).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from mapnik_vector_tile_spark import tilemath
from mapnik_vector_tile_spark.functions import commands as Cmd
from mapnik_vector_tile_spark.functions import compression as Z
from mapnik_vector_tile_spark.functions import geometry as G
from mapnik_vector_tile_spark.functions import pbf

DECODED_SCHEMA = (
    "z int, x long, y long, layer string, feature_id long, geom_type int, "
    "geom_wkt string, props map<string,string>, raster binary"
)


def decode_tile_rows(z: int, x: int, y: int, tile: bytes, bbox=None) -> list[tuple]:
    """One tile -> decoded feature rows (mercator coordinates)."""
    if not tile:
        return []
    data = Z.decompress(bytes(tile))
    minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(x, y, z)
    rows = []
    for layer_bytes in pbf.decode_tile(data):
        layer = pbf.decode_layer(layer_bytes)
        extent = layer["extent"]
        # decode transform: px -> mercator (datasource_pbf scale semantics)
        scale = extent / (float(maxx) - float(minx))
        for fmsg in layer["features"]:
            feat = pbf.decode_feature(fmsg)
            props = {}
            tags = feat["tags"]
            for i in range(0, len(tags) - 1, 2):
                k = layer["keys"][tags[i]]
                v = layer["values"][tags[i + 1]]
                props[k] = None if v is None else str(v)
            if feat["geometry"]:
                g = Cmd.decode_geometry(
                    feat["geometry"],
                    feat["type"],
                    version=layer["version"],
                    tile_x=float(minx),
                    tile_y=float(maxy),
                    scale_x=scale,
                    scale_y=-scale,  # y down in tile space
                    bbox=bbox,
                )
                wkt = G.to_wkt(g) if g[0] != "empty" else None
            else:
                wkt = None
            rows.append(
                (
                    z, x, y, layer["name"], feat["id"], feat["type"],
                    wkt, props, feat["raster"],
                )
            )
    return rows


def decode_tiles(tiles: DataFrame) -> DataFrame:
    """tiles: (z, x, y, tile binary, ...) -> decoded feature rows."""

    def kernel(iterator):
        for pdf in iterator:
            out = []
            for _, row in pdf.iterrows():
                out.extend(decode_tile_rows(int(row["z"]), int(row["x"]), int(row["y"]), row["tile"]))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "z", "x", "y", "layer", "feature_id", "geom_type",
                        "geom_wkt", "props", "raster",
                    ],
                )

    return tiles.select("z", "x", "y", "tile").mapInPandas(kernel, schema=DECODED_SCHEMA)


def features_at_point(tiles: DataFrame, lon: float, lat: float, tol_merc: float = 0.0) -> DataFrame:
    """S4: point-lookup scan over encoded tiles — decode with a tiny bbox
    pushed *into* the decoder (the reference's filter_at_point,
    src/vector_tile_datasource_pbf.ipp:196-216)."""
    mx, my = tilemath.mercator_np(lon, lat)
    bbox = (float(mx) - tol_merc, float(my) - tol_merc, float(mx) + tol_merc, float(my) + tol_merc)

    def kernel(iterator):
        for pdf in iterator:
            out = []
            for _, row in pdf.iterrows():
                out.extend(
                    decode_tile_rows(int(row["z"]), int(row["x"]), int(row["y"]), row["tile"], bbox=bbox)
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "z", "x", "y", "layer", "feature_id", "geom_type",
                        "geom_wkt", "props", "raster",
                    ],
                )

    return tiles.select("z", "x", "y", "tile").mapInPandas(kernel, schema=DECODED_SCHEMA)
