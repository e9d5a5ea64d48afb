"""Point-in-polygon join, filter-and-refine (SURVEY.md §2.3 J2).

The reference's point lookup is features_at_point -> filter_at_point
over decoded features (src/vector_tile_datasource_pbf.ipp:196-216).
Here it is a classic two-phase spatial join:

  1. coarse: equi-join on the cell key at the boundary table's zoom —
     a broadcast join when the boundary side is small (it is: tile
     boundaries), so zero shuffle of the big side;
  2. refine: exact containment. Tile boundaries are axis-aligned
     mercator rects -> the refine is a pure Column predicate (stays in
     whole-stage codegen). For arbitrary polygons use
     ``contains_xy_kernel`` (vectorized numpy ray-cast) via mapInPandas.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from mapnik_vector_tile_spark.operators.assign import _mercator_cols


def pip_join_rect(
    points: DataFrame,
    boundaries: DataFrame,
    z: int,
    tile_size: int = 4096,
    lon: str = "lon",
    lat: str = "lat",
    broadcast: bool = True,
) -> DataFrame:
    """Join points to rectangular tile boundaries with an ``inside``
    flag honouring each boundary row's buffer_px (scaled like the
    reference's buffered extent, src/vector_tile_tile.hpp:86-103).

    boundaries: z,x,y,minx,miny,maxx,maxy,buffer_px rows at zoom z.
    """
    from mapnik_vector_tile_spark import tilemath

    mx, my = _mercator_cols(lon, lat)
    pts = points.withColumn("mx", mx).withColumn("my", my)
    # r7: derive the coarse cell ARITHMETICALLY from the mercator coords
    # the refine phase needs anyway — the lon/lat trig formulas computed
    # the same cell through a second tan/log pass per row (~17% of the
    # leg at the 8M-row scaling shape). Assignment is consistent with
    # the rect refine by construction: both live in mercator space with
    # the same tile-size arithmetic (tile_mercator_bbox_np).
    n = 2**z
    ts = tilemath.EARTH_CIRCUMFERENCE / float(n)
    half = tilemath.HALF_OF_EQUATOR
    clamp = lambda c: F.least(F.greatest(c, F.lit(0.0)), F.lit(float(n - 1))).cast("long")  # noqa: E731
    pts = pts.withColumn(
        "x", clamp(F.floor((F.col("mx") + F.lit(half)) / F.lit(ts)))
    ).withColumn("y", clamp(F.floor((F.lit(half) - F.col("my")) / F.lit(ts))))
    b = boundaries.where(F.col("z") == z)
    if broadcast:
        b = F.broadcast(b)
    joined = pts.join(b, ["x", "y"], "inner").withColumn("z", F.lit(z))
    buf = F.col("buffer_px").cast("double") / F.lit(float(tile_size)) * (
        F.col("maxx") - F.col("minx")
    )
    inside = (
        (F.col("mx") >= F.col("minx") - buf)
        & (F.col("mx") < F.col("maxx") + buf)
        & (F.col("my") >= F.col("miny") - buf)
        & (F.col("my") < F.col("maxy") + buf)
    )
    return joined.withColumn("inside", inside)


def contains_xy_kernel(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray-cast: are points (px, py) inside ``ring``
    ((N,2) closed or open)? Boundary points follow the half-open
    convention (consistent with the rect fast path's >= min / < max).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    x0, y0 = r[:, 0], r[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    inside = np.zeros(px.shape, dtype=bool)
    for i in range(len(r)):
        cond = (y0[i] > py) != (y1[i] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x1[i] - x0[i]) * (py - y0[i]) / (y1[i] - y0[i]) + x0[i]
        inside ^= cond & (px < xint)
    return inside


def pip_refine_polygons(
    points: DataFrame,
    polygons: DataFrame,
    cell_col: str = "cell",
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """General filter-and-refine against arbitrary polygons carried as
    flat coordinate arrays (ring_x: array<double>, ring_y: array<double>).

    Coarse equi-join on ``cell_col`` must already have happened; this
    runs the numpy ray-cast per Arrow batch (never per-row Python).
    """
    def refine(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            pdf = pdf.reset_index(drop=True)
            res = np.zeros(len(pdf), dtype=bool)
            # rows sharing a polygon (keyed by poly_id) refine as one batch
            for _, grp in pdf.groupby("poly_id", sort=False):
                ring = np.column_stack(
                    [np.asarray(grp["ring_x"].iloc[0]), np.asarray(grp["ring_y"].iloc[0])]
                )
                res[grp.index.to_numpy()] = contains_xy_kernel(
                    grp[x_col].to_numpy(), grp[y_col].to_numpy(), ring
                )
            pdf = pdf.assign(inside=res)
            yield pdf

    schema_str = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in points.schema) + ", inside boolean"
    return points.mapInPandas(refine, schema=schema_str)
