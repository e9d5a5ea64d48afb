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


def decode_layer_rows(
    z: int, x: int, y: int, layer_bytes: bytes, bbox=None, bounds=None
) -> list[tuple]:
    """One layer message -> decoded feature rows (mercator coordinates).
    `bounds` is the tile mercator bbox (computed from z/x/y if absent) —
    passing it lets callers amortize it across a tile's layers."""
    if bounds is None:
        bounds = tilemath.tile_mercator_bbox_np(x, y, z)
    minx, miny, maxx, maxy = bounds
    layer = pbf.decode_layer(bytes(layer_bytes))
    # datasource_pbf construction semantics (test/unit/datasource-pbf/
    # from_layer.cpp): an unknown layer version yields no features but
    # processing continues with subsequent layers; a v2 layer without a
    # declared extent is rejected (the reference throws — the scan skips
    # it so one hostile layer cannot fail a distributed decode; the
    # validity checker carries the LAYER_HAS_NO_EXTENT finding).
    if layer["version"] not in (1, 2):
        return []
    if layer["version"] == 2 and not layer["has_extent"]:
        return []
    extent = layer["extent"]
    # decode transform: px -> mercator (datasource_pbf scale semantics)
    scale = extent / (float(maxx) - float(minx))
    n_keys, n_vals = len(layer["keys"]), len(layer["values"])
    feats = pbf.decode_features_batch(layer["features"])
    if feats is None:  # exotic wire shapes: parse each feature alone
        feats = [pbf.decode_feature_arrays(fmsg) for fmsg in layer["features"]]
    dec_args = dict(
        version=layer["version"],
        tile_x=float(minx),
        tile_y=float(maxy),
        scale_x=scale,
        scale_y=-scale,  # y down in tile space
        bbox=bbox,
    )
    # batch-decode every feature's geometry in one ragged pass (the
    # dominant real-world tile shape is thousands of SMALL features —
    # per-feature numpy setup would cost more than the decode); the
    # batch declines per feature, falling back to the per-feature
    # vectorized/scalar paths that own the exact v1/v2 error matrix
    geoms_in = [f["geometry"] for f in feats]
    gtypes = [f["type"] for f in feats]
    batched = Cmd.decode_geometry_vec_batch(geoms_in, gtypes, **dec_args)
    rows = []
    for fi, feat in enumerate(feats):
        props = {}
        tags = feat["tags"]
        for i in range(0, len(tags) - 1, 2):
            # out-of-range indices are silently skipped, like the
            # reference featureset (vector_tile_featureset_pbf.ipp:147-148)
            if tags[i] >= n_keys or tags[i + 1] >= n_vals:
                continue
            k = layer["keys"][tags[i]]
            v = layer["values"][tags[i + 1]]
            props[k] = None if v is None else str(v)
        if len(feat["geometry"]):
            g = batched[fi]
            if g is None and len(feat["geometry"]) >= 64:
                g = Cmd.decode_geometry_vec(feat["geometry"], feat["type"], **dec_args)
            if g is None:
                g = Cmd.decode_geometry(feat["geometry"], feat["type"], **dec_args)
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


def decode_tile_rows(z: int, x: int, y: int, tile: bytes, bbox=None) -> list[tuple]:
    """One tile -> decoded feature rows (mercator coordinates)."""
    if not tile:
        return []
    data = Z.decompress(bytes(tile))
    bounds = tilemath.tile_mercator_bbox_np(x, y, z)
    rows = []
    for layer_bytes in pbf.decode_tile(data):
        rows.extend(decode_layer_rows(z, x, y, layer_bytes, bbox=bbox, bounds=bounds))
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


PACKED_SCHEMA = (
    "z int, x long, y long, layer string, feature_id long, geom_type int, "
    "kind string, xs array<double>, ys array<double>, offsets array<long>, "
    "exterior array<boolean>, props map<string,string>"
)


def decode_tiles_packed(tiles: DataFrame) -> DataFrame:
    """Decode scan with RAGGED geometry output: flat xs/ys + part
    offsets per feature (Arrow list columns), never a per-part Python
    object or a WKT string. This is the scale form of S2/S3 — a feature
    with 168k line parts (the reference's multi_line bench tile) is
    three arrays here, and downstream Spark ops explode/aggregate the
    list columns JVM-side. Non-canonical features fall back through the
    scalar decoder and are re-packed from its part lists."""

    def kernel(iterator):
        for pdf in iterator:
            out = []
            for _, row in pdf.iterrows():
                z, x, y = int(row["z"]), int(row["x"]), int(row["y"])
                if not row["tile"]:
                    continue
                data = Z.decompress(bytes(row["tile"]))
                bounds = tilemath.tile_mercator_bbox_np(x, y, z)
                minx, miny, maxx, maxy = bounds
                for layer_bytes in pbf.decode_tile(data):
                    layer = pbf.decode_layer(bytes(layer_bytes))
                    if layer["version"] not in (1, 2):
                        continue
                    if layer["version"] == 2 and not layer["has_extent"]:
                        continue
                    scale = layer["extent"] / (float(maxx) - float(minx))
                    kw = dict(
                        version=layer["version"], tile_x=float(minx),
                        tile_y=float(maxy), scale_x=scale, scale_y=-scale,
                    )
                    feats = pbf.decode_features_batch(layer["features"])
                    if feats is None:
                        feats = [
                            pbf.decode_feature_arrays(m) for m in layer["features"]
                        ]
                    batched = Cmd.decode_geometry_vec_batch(
                        [f["geometry"] for f in feats],
                        [f["type"] for f in feats], **kw,
                    )
                    for fi, feat in enumerate(feats):
                        props = {}
                        tags = feat["tags"]
                        for i in range(0, len(tags) - 1, 2):
                            if (tags[i] >= len(layer["keys"])
                                    or tags[i + 1] >= len(layer["values"])):
                                continue  # featureset_pbf.ipp:147-148 skip
                            v = layer["values"][tags[i + 1]]
                            props[layer["keys"][tags[i]]] = (
                                None if v is None else str(v)
                            )
                        if not len(feat["geometry"]):
                            continue
                        g = batched[fi]
                        if g is not None:
                            pk = _pack_from_parts(g)
                        else:
                            pk = Cmd.decode_geometry_vec(
                                feat["geometry"], feat["type"], packed=True, **kw
                            )
                            if pk is None:
                                pk = _pack_from_parts(
                                    Cmd.decode_geometry(
                                        feat["geometry"], feat["type"], **kw
                                    )
                                )
                        if pk[0] == "empty":
                            continue
                        d = pk[1]
                        out.append(
                            (
                                z, x, y, layer["name"], feat["id"], feat["type"],
                                d["kind"], d["xs"], d["ys"], d["offsets"],
                                d.get("exterior"), props,
                            )
                        )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "z", "x", "y", "layer", "feature_id", "geom_type",
                        "kind", "xs", "ys", "offsets", "exterior", "props",
                    ],
                )

    return tiles.select("z", "x", "y", "tile").mapInPandas(kernel, schema=PACKED_SCHEMA)


def _pack_from_parts(geom) -> tuple:
    """Scalar-decoder output -> the packed dict form."""
    kind, val = geom
    if kind == "empty":
        return ("empty", None)
    if kind == "point":
        parts, out_kind, ext = [np.atleast_2d(val)], "multipoint", None
    elif kind == "multipoint":
        parts, out_kind, ext = [np.atleast_2d(val)], "multipoint", None
    elif kind == "linestring":
        parts, out_kind, ext = [np.asarray(val)], "multilinestring", None
    elif kind == "multilinestring":
        parts, out_kind, ext = [np.asarray(p) for p in val], "multilinestring", None
    elif kind == "polygon":
        parts = [np.asarray(r) for r in val]
        out_kind = "multipolygon"
        ext = np.array([True] + [False] * (len(parts) - 1), dtype=bool)
    else:  # multipolygon
        parts = [np.asarray(r) for p in val for r in p]
        out_kind = "multipolygon"
        ext = np.concatenate(
            [[True] + [False] * (len(p) - 1) for p in val]
        ).astype(bool)
    lens = np.asarray([len(p) for p in parts], dtype=np.int64)
    flat = parts[0] if len(parts) == 1 else np.vstack(parts)
    return ("packed", {
        "kind": out_kind, "xs": flat[:, 0].astype(np.float64),
        "ys": flat[:, 1].astype(np.float64),
        "offsets": np.concatenate([[0], np.cumsum(lens)]).astype(np.int64),
        "exterior": ext,
    })


def features_at_point(tiles: DataFrame, lon: float, lat: float, tol_merc: float = 0.0) -> DataFrame:
    """S4: point-lookup scan over encoded tiles — decode with a tiny bbox
    pushed *into* the decoder (the reference's filter_at_point,
    src/vector_tile_datasource_pbf.ipp:196-216).

    Cell pruning happens BEFORE any decode: only tiles whose mercator
    bbox (grown by the tolerance) contains the query point survive the
    Column filter, so a z-keyed/partitioned tile store prunes to O(1)
    tiles per zoom instead of scanning the world."""
    from pyspark.sql import functions as F

    mx, my = tilemath.mercator_np(lon, lat)
    bbox = (float(mx) - tol_merc, float(my) - tol_merc, float(mx) + tol_merc, float(my) + tol_merc)

    minx, miny, maxx, maxy = tilemath.tile_bbox_cols(
        F.col("z"), F.col("x"), F.col("y")
    )
    tiles = tiles.where(
        (F.lit(bbox[2]) >= minx) & (F.lit(bbox[0]) < maxx)
        & (F.lit(bbox[3]) >= miny) & (F.lit(bbox[1]) < maxy)
    )

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


# ---------------------------------------------------------------------------
# vectorized point-layer decode (matches the reference's decode-throughput
# benchmark direction, bench/readme.md:24-30)
# ---------------------------------------------------------------------------

def _wkt_point_xy(wkt) -> tuple[float, float]:
    """POINT(x y) -> (x, y); anything else -> (nan, nan)."""
    if isinstance(wkt, str) and wkt.startswith("POINT"):
        lp, rp = wkt.find("("), wkt.rfind(")")
        if 0 < lp < rp:
            parts = wkt[lp + 1 : rp].split()
            if len(parts) == 2:
                try:
                    return float(parts[0]), float(parts[1])
                except ValueError:
                    pass
    return (float("nan"), float("nan"))


def _packed_rows_ok(m: np.ndarray, ml: np.ndarray, c: int) -> np.ndarray:
    """Per-row structural verification of the packed point framing.

    Beyond the constant frame bytes, every declared length (feature,
    tags, geometry) is checked against the actual varint byte lengths,
    and tag key indices must equal their column position — so a foreign
    layer whose byte stream merely *parses* as varints cannot slip
    through the reshape (closes the layer_features_region early-return
    trust gap)."""
    mi = m.astype(np.int64, copy=False)
    ok = (
        (mi[:, 0] == 0x12)
        & (mi[:, 2] == 0x12)
        & (mi[:, 4 + 2 * c] == 0x18)
        & (mi[:, 5 + 2 * c] == Cmd.POINT)
        & (mi[:, 6 + 2 * c] == 0x22)
        & (mi[:, 8 + 2 * c] == 0x09)
        # declared feature length == bytes of everything after its varint
        & (mi[:, 1] == ml[:, 2:].sum(axis=1))
        # declared tags length == bytes of the 2c tag varints
        & (mi[:, 3] == ml[:, 4 : 4 + 2 * c].sum(axis=1))
        # declared geometry length == MoveTo byte + zigzag coord bytes
        & (mi[:, 7 + 2 * c] == 1 + ml[:, 9 + 2 * c] + ml[:, 10 + 2 * c])
    )
    for j in range(c):
        ok &= mi[:, 4 + 2 * j] == j
    return ok


def decode_point_layer_vec(layer: dict, region: bytes):
    """Uniform point layers (this engine's packed framing) decode as one
    varint stream + reshape: per feature
    [0x12 flen 0x12 tlen tags*(2c) 0x18 0x01 0x22 glen 0x09 zzx zzy].
    Returns (tags (n,2c) int64, px, py int64) or None if the layer is
    not uniform (caller falls back to the per-feature walk)."""
    c = len(layer["keys"])
    if c == 0 or region is None:
        return None
    try:
        vals, vlens = pbf.decode_varints_vec(region, return_lengths=True)
    except ValueError:
        return None
    w = 11 + 2 * c
    if len(vals) == 0 or len(vals) % w != 0:
        return None
    m = vals.reshape(-1, w)
    ml = vlens.reshape(-1, w)
    if not _packed_rows_ok(m, ml, c).all():
        return None
    tags = m[:, 4 : 4 + 2 * c].astype(np.int64)
    zz = m[:, 9 + 2 * c : 11 + 2 * c].astype(np.uint32)
    px = Cmd.unzigzag32(zz[:, 0]).astype(np.int64)
    py = Cmd.unzigzag32(zz[:, 1]).astype(np.int64)
    return tags, px, py


def decode_tiles_columnar(tiles: DataFrame, prop_keys: list[str]) -> DataFrame:
    """Scale-path decode: point tiles -> columnar rows (one column per
    property key). The per-tile varint streams of a whole Arrow batch
    concatenate into ONE vectorized decode + reshape (tiny tiles cost
    ~zlib only); non-uniform layers fall back to the generic walk."""
    out_schema = (
        "z int, x long, y long, layer string, mx double, my double, "
        + ", ".join(f"`{k}` string" for k in prop_keys)
    )
    kernel = columnar_kernel(prop_keys)
    return tiles.select("z", "x", "y", "tile").mapInPandas(kernel, schema=out_schema)


def columnar_kernel(prop_keys: list[str]):
    """The mapInPandas kernel of decode_tiles_columnar, exposed so the
    bench harness can drive the exact distributed stages single-core
    (the dense-tile decode anchor)."""
    c_expected = len(prop_keys)
    w = 11 + 2 * c_expected

    def kernel(iterator):
        for pdf in iterator:
            n_tiles = len(pdf)
            if n_tiles == 0:
                continue
            zs = pdf["z"].to_numpy()
            xs = pdf["x"].to_numpy()
            ys = pdf["y"].to_numpy()
            tiles_col = pdf["tile"].to_numpy()
            blob_tile: list[int] = []
            blobs: list[bytes] = []
            fallback_rows: list[tuple] = []
            for t in range(n_tiles):
                tile = tiles_col[t]
                if not tile:
                    continue
                data = Z.decompress(bytes(tile))
                for layer_bytes in pbf.decode_tile(data):
                    blobs.append(layer_bytes)  # already a bytes slice
                    blob_tile.append(t)
            frames = []
            nlay = len(blobs)
            if nlay:
                # one vectorized header walk for the whole batch (the
                # per-layer Python walk was ~75% of worst-case decode);
                # a batch-global parse failure (hostile bytes) routes
                # every layer through the strict per-layer parser
                try:
                    meta = pbf.parse_layers_batch(blobs)
                except Exception:
                    meta = None
            if nlay and meta is None:
                for i, lb in enumerate(blobs):
                    t = blob_tile[i]
                    fallback_rows.extend(
                        decode_layer_rows(int(zs[t]), int(xs[t]), int(ys[t]), lb)
                    )
                nlay = 0
            if nlay:
                buf = meta["buf"]
                ltile = np.asarray(blob_tile, dtype=np.int64)

                key_counts = np.bincount(
                    meta["key_layer"], minlength=nlay
                ) if len(meta["key_layer"]) else np.zeros(nlay, dtype=np.int64)
                koff = np.concatenate([[0], np.cumsum(key_counts)[:-1]])
                cand = np.flatnonzero(
                    meta["ok"]
                    & (key_counts == c_expected)
                    & (meta["feat_start"] >= 0)
                    & (meta["feat_end"] > meta["feat_start"])
                )
                for j, kname in enumerate(prop_keys):
                    if len(cand) == 0:
                        break
                    cand = cand[meta["keys"][koff[cand] + j] == kname]
                # varint count per candidate region: segmented terminator
                # sums via reduceat (a full-buffer cumsum was the batch's
                # single most expensive numpy op)
                nvals = np.empty(0, dtype=np.int64)
                if len(cand):
                    # one zero pad: a region ending exactly at the buffer
                    # end would otherwise be an out-of-bounds reduceat index
                    term = np.concatenate(
                        [((buf & 0x80) == 0).astype(np.int32), np.zeros(1, np.int32)]
                    )
                    bounds = np.stack(
                        [meta["feat_start"][cand], meta["feat_end"][cand]], axis=1
                    ).reshape(-1)
                    nvals = np.add.reduceat(term, bounds)[::2].astype(np.int64)
                    keep_c = nvals % w == 0
                    cand, nvals = cand[keep_c], nvals[keep_c]

                uniform = np.zeros(nlay, dtype=bool)
                uniform[cand] = True
                for i in np.flatnonzero(~uniform):
                    t = blob_tile[i]
                    fallback_rows.extend(
                        decode_layer_rows(int(zs[t]), int(xs[t]), int(ys[t]), blobs[i])
                    )

            if nlay and len(cand):
                flen = meta["feat_end"][cand] - meta["feat_start"][cand]
                big, _offs = pbf.ragged_gather(
                    buf, meta["feat_start"][cand], flen, np.arange(len(cand))
                )
                vals, vlens = pbf.decode_varints_vec(big, return_lengths=True)
                m = vals.reshape(-1, w)
                ml = vlens.reshape(-1, w)
                feat_counts = nvals // w
                rep = np.repeat(np.arange(len(cand)), feat_counts)
                row_ok = _packed_rows_ok(m, ml, c_expected)
                if not row_ok.all():
                    # exotic framing: fall back ONLY the offending layers
                    bad_meta = np.zeros(len(cand), dtype=bool)
                    np.logical_or.at(bad_meta, rep, ~row_ok)
                    for ci in np.flatnonzero(bad_meta):
                        i = cand[ci]
                        t = blob_tile[i]
                        fallback_rows.extend(
                            decode_layer_rows(int(zs[t]), int(xs[t]), int(ys[t]), blobs[i])
                        )
                    keep = ~bad_meta[rep]
                    m, rep = m[keep], rep[keep]
                if len(m):
                    tz = zs[ltile[cand]][rep]
                    tx = xs[ltile[cand]][rep]
                    ty = ys[ltile[cand]][rep]
                    names = meta["name"][cand][rep]
                    extents = meta["extent"][cand].astype(np.float64)[rep]
                    minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(tx, ty, tz)
                    scale = extents / (maxx - minx)
                    zz = m[:, 9 + 2 * c_expected : 11 + 2 * c_expected].astype(np.uint32)
                    px = Cmd.unzigzag32(zz[:, 0]).astype(np.float64)
                    py = Cmd.unzigzag32(zz[:, 1]).astype(np.float64)
                    mx = minx + px / scale
                    my = maxy - py / scale
                    # global value dictionary: concat per-layer dicts (flat
                    # from the batch parse), shift tag indices per layer
                    all_counts = np.bincount(
                        meta["val_layer"], minlength=nlay
                    ) if len(meta["val_layer"]) else np.zeros(nlay, dtype=np.int64)
                    gl_off = np.concatenate([[0], np.cumsum(all_counts)[:-1]])
                    vc = all_counts[cand]
                    local_off = np.concatenate([[0], np.cumsum(vc)[:-1]])
                    take = (
                        np.repeat(gl_off[cand], vc)
                        + np.arange(int(vc.sum()))
                        - np.repeat(local_off, vc)
                    )
                    all_vals = meta["values"][take]
                    shift = local_off[rep]
                    cols = {}
                    for j, k in enumerate(prop_keys):
                        idx = m[:, 4 + 2 * j + 1].astype(np.int64) + shift
                        cols[k] = all_vals[idx] if len(all_vals) else np.array([], dtype=object)
                    frames.append(
                        pd.DataFrame(
                            {"z": tz.astype(np.int32), "x": tx, "y": ty,
                             "layer": names, "mx": mx, "my": my, **cols}
                        )
                    )
            if fallback_rows:
                # recover point coordinates from the decoded WKT instead of
                # nulling them (non-point geometries keep NaN by design)
                fmx, fmy = zip(*(_wkt_point_xy(r[6]) for r in fallback_rows))
                frames.append(
                    pd.DataFrame(
                        {
                            "z": [r[0] for r in fallback_rows],
                            "x": [r[1] for r in fallback_rows],
                            "y": [r[2] for r in fallback_rows],
                            "layer": [r[3] for r in fallback_rows],
                            "mx": np.array(fmx, dtype=np.float64),
                            "my": np.array(fmy, dtype=np.float64),
                            **{k: [r[7].get(k) for r in fallback_rows] for k in prop_keys},
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return kernel
