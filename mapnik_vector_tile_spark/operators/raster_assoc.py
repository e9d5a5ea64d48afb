"""Raster patch <-> tile association (J4) + raster kernels (K10/K11).

The reference carries encoded image bytes as Feature.raster inside the
tile (src/vector_tile_geometry_feature.hpp:23-34) and warps/crops them
per tile (src/vector_tile_raster_clipper.ipp:23-523, overzoom crop
src/vector_tile_featureset_pbf.ipp:210-258). Here:

* the bytes column stays out of the geometry stages (never shuffled
  with coordinates — 10^12-row discipline) and is joined back by
  image_id when a raster tile is built;
* decode/scale/re-encode run per Arrow batch in mapInPandas
  (PNG real, JPEG via the documented deterministic stub);
* per-row invariants (BASELINE.json): decoded-pixel PSNR (exact for
  png, >=40 dB for the lossy path) + caption equality.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from mapnik_vector_tile_spark import tilemath
from mapnik_vector_tile_spark.functions import raster as R

INVARIANT_SCHEMA = (
    "image_id string, fmt string, w int, h int, psnr_db double, psnr_ok boolean, "
    "caption_ok boolean, op string, scaling_method string, out_w int, out_h int, "
    "crop_x0 int, crop_y0 int, crop_x1 int, crop_y1 int"
)

# idx % 4 rotation — the reference's scaling_method_e surface
# (vector_tile_processor.hpp:45,168-175): passthrough = the same-size
# fast path (raster_clipper.ipp:37-41), then one op per AGG method
_OPS = (
    ("passthrough", "none"),
    ("scale_bilinear", "bilinear"),
    ("scale_near", "near"),
    ("scale_bicubic", "bicubic"),
)


def raster_patch_invariants(located: DataFrame) -> DataFrame:
    """Per image: decode -> op -> re-encode -> decode; report PSNR vs the
    op's exact expectation + caption equality + overzoom crop window.

    op rotation (deterministic by image_id row index, idx % 4):
      passthrough      — re-encode at same size (raster_clipper fast path)
      scale_bilinear   — half-size bilinear (AGG image_scaling_bilinear)
      scale_near       — half-size nearest-neighbour (SCALING_NEAR)
      scale_bicubic    — half-size cubic B-spline (AGG image_filter_bicubic)
    crop window computed for the image's z14 tile vs its z13 parent
    (the overzoom read case).
    """

    def kernel(iterator):
        for pdf in iterator:
            rows = []
            # itertuples, not iterrows: the per-image numpy work dominates
            # but iterrows' Series construction was a free 5-10x loss on
            # the loop overhead (r1 verdict)
            for r in pdf.itertuples(index=False):
                img = R.decode_image(bytes(r.bytes))
                idx = int(r.image_id[3:])
                op, method = _OPS[idx % 4]
                if op == "passthrough":
                    out = img
                else:
                    out = R.resize_any(
                        img, img.shape[0] // 2, img.shape[1] // 2, method=method
                    )
                reenc = R.encode_image(out, r.fmt)
                back = R.decode_image(reenc)
                psnr = R.psnr(out, back)
                psnr_ok = (
                    (psnr == float("inf"))
                    if r.fmt in ("png", "webp")  # both lossless
                    else (psnr >= 40.0)
                )
                caption_ok = r.caption == f"caption for {r.image_id}"
                # overzoom crop: pixel window of the z14 child tile within
                # the z13 tile this image's patch covers
                x13, y13 = tilemath.lonlat_to_tile_np(r.lon, r.lat, 13)
                x14, y14 = tilemath.lonlat_to_tile_np(r.lon, r.lat, 14)
                src_box = tuple(float(v) for v in tilemath.tile_mercator_bbox_np(x13, y13, 13))
                qbox = tuple(float(v) for v in tilemath.tile_mercator_bbox_np(x14, y14, 14))
                cx0, cy0, cx1, cy1 = R.overzoom_crop_window(
                    int(r.w), int(r.h), src_box, qbox
                )
                psnr_val = 999.0 if psnr == float("inf") else float(psnr)
                rows.append(
                    (
                        r.image_id, r.fmt, int(r.w), int(r.h),
                        round(psnr_val, 3), bool(psnr_ok), bool(caption_ok), op,
                        method, out.shape[1], out.shape[0], cx0, cy0, cx1, cy1,
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "image_id", "fmt", "w", "h", "psnr_db", "psnr_ok",
                        "caption_ok", "op", "scaling_method", "out_w", "out_h",
                        "crop_x0", "crop_y0", "crop_x1", "crop_y1",
                    ],
                )

    slim = located.select("image_id", "bytes", "w", "h", "fmt", "caption", "lon", "lat")
    return slim.mapInPandas(kernel, schema=INVARIANT_SCHEMA)


def raster_tiles(located: DataFrame, z: int, prop_cols: list[str]) -> DataFrame:
    """Build tiles whose features carry the image bytes as Feature.raster
    (S6): geometry stage runs on narrow columns; bytes join back late by
    image_id (never through the geometry shuffle)."""
    from pyspark.sql import functions as F

    from mapnik_vector_tile_spark.operators import assign, encode

    narrow = located.select("image_id", "lon", "lat", *prop_cols)
    assigned = assign.assign_tiles(narrow, z)
    # late bytes join: tile-partitioned small row set joins wide payload
    with_bytes = assigned.join(located.select("image_id", "bytes"), "image_id", "inner")
    return encode.build_point_tiles(
        with_bytes,
        prop_cols=["image_id", *prop_cols],
        raster_col="bytes",
        order_col="image_id",
    )
