"""Tile encode — groupBy(z,x,y).applyInPandas (SURVEY.md §2.10 tile_encode).

Replaces the reference's per-tile pull pipeline
(processor::create_tile -> layer_builder_pbf, src/vector_tile_processor.ipp
+ src/vector_tile_layer.ipp:84-126) with one shuffle-to-tile stage:

  assigned rows --shuffle on (z,x,y[,salt])--> per-group kernel:
      mercator -> tile px (vectorized quantize, std::round semantics)
      -> in-buffer mask (transform_visitor envelope check)
      -> first-seen key/value dictionaries (row-major scan order, exactly
         the builder's insertion order, vector_tile_layer.ipp:92-124)
      -> per-feature command streams (points vectorized; paths via the
         geometry kernel)
      -> layer pbf -> tile pbf -> zlib (S5 + S7)

Skew: pass salt_buckets > 1 to pre-encode hotspot tiles per salt and
merge with operators.composite (the reference's composite slow path,
src/vector_tile_composite.hpp:78-97) — two-phase encode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from mapnik_vector_tile_spark import tilemath
from mapnik_vector_tile_spark.functions import commands as Cmd
from mapnik_vector_tile_spark.functions import compression as Z
from mapnik_vector_tile_spark.functions import geometry as G
from mapnik_vector_tile_spark.functions import pbf

TILE_SCHEMA = "z int, x long, y long, tile binary, n_features long, n_layers int, painted boolean"


def build_value_dicts(pdf: pd.DataFrame, prop_cols: list[str]):
    """First-seen (row-major, column-within-row) key/value dictionaries —
    byte-order parity with layer_builder_pbf::add_feature
    (vector_tile_layer.ipp:84-126). Returns (keys, value_list, tags_array)
    where tags_array is (n_rows, 2*n_cols) uint32 (key_idx, val_idx pairs),
    with -1 marking dropped nulls."""
    n = len(pdf)
    ncols = len(prop_cols)
    keys = list(prop_cols)  # key dict = column order (fixed schema)
    val_index: dict[tuple, int] = {}
    values: list = []
    tags = np.full((n, 2 * ncols), -1, dtype=np.int64)
    # column-wise factorize, then assign dict slots in row-major first-seen order
    col_codes = []
    col_uniques = []
    for c in prop_cols:
        codes, uniques = pd.factorize(pdf[c], use_na_sentinel=True)
        col_codes.append(codes)
        col_uniques.append(list(uniques))
    # first occurrence rank of each (col, code): row*ncols + col
    order = []
    for j in range(ncols):
        codes = col_codes[j]
        seen = {}
        for i, code in enumerate(codes):
            if code >= 0 and code not in seen:
                seen[code] = i * ncols + j
        order.extend(((rank, j, code) for code, rank in seen.items()))
    order.sort()
    slot_of: dict[tuple[int, int], int] = {}
    for rank, j, code in order:
        v = col_uniques[j][code]
        tagged = (pbf.value_type_tag(v), v)
        if tagged not in val_index:
            val_index[tagged] = len(values)
            values.append(v)
        slot_of[(j, code)] = val_index[tagged]
    for j in range(ncols):
        codes = col_codes[j]
        valid = codes >= 0
        tags[valid, 2 * j] = j
        tags[valid, 2 * j + 1] = [slot_of[(j, c)] for c in codes[valid]]
    return keys, values, tags


def encode_point_layer(
    pdf: pd.DataFrame,
    z: int,
    x: int,
    y: int,
    layer_name: str,
    prop_cols: list[str],
    extent: int = 4096,
    buffer_px: int = 0,
    id_col: str | None = None,
    raster_col: str | None = None,
    version: int = 2,
) -> tuple[bytes, int]:
    """One tile-layer from point rows (mx, my mercator cols required).
    Returns (layer_bytes, n_features). Fully vectorized — points need no
    per-feature geometry loop."""
    minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(x, y, z)
    vt = G.ViewTransform(float(minx), float(miny), float(maxx), float(maxy), extent, extent)
    coords = np.column_stack([pdf["mx"].to_numpy(), pdf["my"].to_numpy()])
    px, ok = G.quantize(coords, vt)
    # transform_visitor buffered-envelope check (strategy.hpp:133-150)
    inbuf = (
        (px[:, 0] >= -buffer_px)
        & (px[:, 0] <= extent + buffer_px)
        & (px[:, 1] >= -buffer_px)
        & (px[:, 1] <= extent + buffer_px)
    )
    keep = ok & inbuf
    pdf = pdf.loc[keep].reset_index(drop=True)
    px = px[keep]
    if len(pdf) == 0:
        return b"", 0
    keys, values, tags = build_value_dicts(pdf, prop_cols)
    zz = Cmd.zigzag32(px)  # (n, 2) uint32 — whole-layer vectorized
    feats = []
    ids = pdf[id_col].to_numpy() if id_col else None
    rasters = pdf[raster_col] if raster_col else None
    for i in range(len(pdf)):
        trow = tags[i]
        tag_list = [int(t) for t in trow[trow >= 0]]
        feats.append(
            pbf.encode_feature(
                int(ids[i]) if ids is not None else None,
                tag_list,
                Cmd.POINT,
                [9, int(zz[i, 0]), int(zz[i, 1])],
                raster=bytes(rasters.iloc[i]) if rasters is not None and rasters.iloc[i] is not None else None,
            )
        )
    vals = [pbf.encode_value(v) for v in values]
    layer = pbf.encode_layer(layer_name, feats, keys, vals, extent=extent, version=version)
    return layer, len(feats)


def encode_geom_layer(
    pdf: pd.DataFrame,
    z: int,
    x: int,
    y: int,
    layer_name: str,
    prop_cols: list[str],
    wkt_col: str = "geom_wkt",
    extent: int = 4096,
    buffer_px: int = 0,
    simplify_distance: float = 0.0,
    area_threshold: float = 0.1,
    id_col: str | None = None,
    version: int = 2,
) -> tuple[bytes, int]:
    """General-geometry layer: WKT (mercator coords) per row through the
    fused transform/simplify/clip kernel then command-stream encode."""
    minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(x, y, z)
    vt = G.ViewTransform(float(minx), float(miny), float(maxx), float(maxy), extent, extent)
    clip_box = tilemath.buffered_tile_px_box(extent, buffer_px)
    keys, values, tags = build_value_dicts(pdf, prop_cols)
    feats = []
    ids = pdf[id_col].to_numpy() if id_col else None
    kept_rows = 0
    for i, wkt in enumerate(pdf[wkt_col]):
        g = G.from_wkt(wkt)
        tg = G.world_to_tile_geom(
            g, vt, clip_box, simplify_distance=simplify_distance, area_threshold=area_threshold
        )
        gtype, cmds = Cmd.encode_geometry(tg)
        if gtype is None:
            continue
        trow = tags[i]
        tag_list = [int(t) for t in trow[trow >= 0]]
        feats.append(
            pbf.encode_feature(
                int(ids[i]) if ids is not None else None, tag_list, gtype, cmds
            )
        )
        kept_rows += 1
    if not feats:
        return b"", 0
    vals = [pbf.encode_value(v) for v in values]
    layer = pbf.encode_layer(layer_name, feats, keys, vals, extent=extent, version=version)
    return layer, kept_rows


def build_point_tiles(
    assigned: DataFrame,
    prop_cols: list[str],
    layer_name: str = "layer",
    extent: int = 4096,
    buffer_px: int = 0,
    id_col: str | None = None,
    raster_col: str | None = None,
    compress_tiles: bool = True,
    order_col: str | None = None,
) -> DataFrame:
    """assigned: DataFrame with z,x,y + lon/lat + prop columns.
    One output row per tile: zlib'd Tile pbf + painted stats (A4)."""
    from mapnik_vector_tile_spark.operators.assign import _mercator_cols

    mx, my = _mercator_cols("lon", "lat")
    slim_cols = ["z", "x", "y", *prop_cols]
    if id_col:
        slim_cols.append(id_col)
    if raster_col:
        slim_cols.append(raster_col)
    if order_col and order_col not in slim_cols:
        slim_cols.append(order_col)
    slim = assigned.withColumn("mx", mx).withColumn("my", my).select(*slim_cols, "mx", "my")
    sort_col = order_col or id_col

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = int(key[0]), int(key[1]), int(key[2])
        if sort_col:  # deterministic feature order (SURVEY.md §2.5)
            pdf = pdf.sort_values(sort_col, kind="mergesort").reset_index(drop=True)
        layer, n = encode_point_layer(
            pdf, z, x, y, layer_name, prop_cols,
            extent=extent, buffer_px=buffer_px, id_col=None, raster_col=raster_col,
        )
        if n == 0:
            tile = b""
            painted = False
        else:
            tile = pbf.encode_tile([layer])
            if compress_tiles:
                tile = Z.compress(tile)
            painted = True
        return pd.DataFrame(
            [(z, x, y, tile, n, 1 if painted else 0, painted)],
            columns=["z", "x", "y", "tile", "n_features", "n_layers", "painted"],
        )

    return slim.groupBy("z", "x", "y").applyInPandas(kernel, schema=TILE_SCHEMA)
