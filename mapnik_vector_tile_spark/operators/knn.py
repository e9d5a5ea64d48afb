"""kNN via cell-ring expansion (J5 — absent in the reference; required
by the north rule).

Shape per round: the (small, broadcastable) pending-query set explodes
into the (2r+1)^2 cell block around each query's cell at zoom z ->
broadcast equi-join against the (huge) candidate side on the cell key
-> per-query window top-k. A query *resolves* when its k-th neighbour
distance fits inside the searched block (guaranteed radius = distance
from the query point to the block edge, infinite at world edges);
unresolved queries re-run with the ring doubled.

Only O(|queries| * k) rows ever reach the driver; the candidate side is
touched once per round through a cell-key join that prunes to the
exploded block (predicate on the join key -> partition-prunable at
scale when candidates are stored bucketed/sorted by cell).

Metric: squared euclidean on (lon, lat) — matches the SQL oracle twin
(queries.q_knn_k5); ties broken by neighbour id.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from mapnik_vector_tile_spark import tilemath


def _cell_np(lon, lat, z):
    return tilemath.lonlat_to_tile_np(lon, lat, z)


def _lon_of(xc, n):
    return np.asarray(xc, dtype=np.float64) / n * 360.0 - 180.0


def _lat_of(yc, n):
    t = math.pi * (1.0 - 2.0 * np.asarray(yc, dtype=np.float64) / n)
    return np.degrees(np.arctan(np.sinh(t)))


def knn_ring_expansion(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    z: int = 9,
    initial_ring: int = 1,
    max_iters: int = 8,
    max_ring: int = 32,
    query_id: str = "image_id",
    cand_id: str = "image_id",
) -> DataFrame:
    """-> (query_id, neighbor_id, rank, d2). Exact (tests pin equality
    with brute force) with join cost bounded by ring locality."""
    spark = candidates.sparkSession
    n = 2**z
    cands = (
        candidates.select(F.col(cand_id).alias("neighbor_id"), "lon", "lat")
        .withColumnRenamed("lon", "n_lon")
        .withColumnRenamed("lat", "n_lat")
    )
    x, y = tilemath.lonlat_to_tile_cols(F.col("n_lon"), F.col("n_lat"), z)
    cands = cands.withColumn("cx", x).withColumn("cy", y)

    qpd = queries.select(F.col(query_id).alias("query_id"), "lon", "lat").toPandas()
    qpd["cx"], qpd["cy"] = _cell_np(qpd["lon"].to_numpy(), qpd["lat"].to_numpy(), z)
    qpd["ring"] = initial_ring

    resolved_parts: list[pd.DataFrame] = []

    for _ in range(max_iters):
        if len(qpd) == 0:
            break
        pend = spark.createDataFrame(
            qpd[["query_id", "lon", "lat", "cx", "cy", "ring"]],
            "query_id string, lon double, lat double, cx long, cy long, ring int",
        )
        # sequence-based block explode: no literal arrays, stays in codegen
        exploded = (
            pend.withColumn(
                "jx", F.explode(F.sequence(F.col("cx") - F.col("ring"), F.col("cx") + F.col("ring")))
            )
            .withColumn(
                "jy", F.explode(F.sequence(F.col("cy") - F.col("ring"), F.col("cy") + F.col("ring")))
            )
            .where((F.col("jx") >= 0) & (F.col("jx") < n) & (F.col("jy") >= 0) & (F.col("jy") < n))
        )
        joined = (
            F.broadcast(exploded)
            .join(
                cands,
                (exploded["jx"] == cands["cx"]) & (exploded["jy"] == cands["cy"]),
                "inner",
            )
            .where(F.col("neighbor_id") != F.col("query_id"))
        )
        d2 = (F.col("lon") - F.col("n_lon")) ** 2 + (F.col("lat") - F.col("n_lat")) ** 2
        w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
        topk = (
            joined.withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "d2")
            .toPandas()
        )

        # driver-side resolution check (|queries| rows)
        qi = qpd.set_index("query_id")
        rings = qi["ring"]
        blk_lon_min = _lon_of(qi["cx"] - rings, n)
        blk_lon_max = _lon_of(qi["cx"] + rings + 1, n)
        blk_lat_max = _lat_of(qi["cy"] - rings, n)
        blk_lat_min = _lat_of(qi["cy"] + rings + 1, n)
        guard_lon = np.minimum(qi["lon"] - blk_lon_min, blk_lon_max - qi["lon"])
        guard_lon = np.where((qi["cx"] - rings <= 0) & (qi["cx"] + rings >= n - 1), np.inf, guard_lon)
        g_lat_low = np.where(qi["cy"] + rings >= n - 1, np.inf, qi["lat"] - blk_lat_min)
        g_lat_high = np.where(qi["cy"] - rings <= 0, np.inf, blk_lat_max - qi["lat"])
        guard = np.minimum(guard_lon, np.minimum(g_lat_low, g_lat_high))
        guard_sq = pd.Series(guard * guard, index=qi.index)

        stats = topk.groupby("query_id").agg(kth=("d2", "max"), found=("d2", "size"))
        stats = stats.reindex(qi.index).fillna({"found": 0, "kth": np.inf})
        ok = (stats["found"] >= k) & (stats["kth"] <= guard_sq)
        resolved_ids = set(stats.index[ok])
        if resolved_ids:
            resolved_parts.append(topk[topk["query_id"].isin(resolved_ids)])
        qpd = qpd[~qpd["query_id"].isin(resolved_ids)].copy()
        qpd["ring"] = qpd["ring"] * 2
        if len(qpd) and int(qpd["ring"].min()) > max_ring:
            # block would cover a large world fraction -> cheaper to scan
            break

    if len(qpd):  # exhausted iterations -> brute force the stragglers
        brute = brute_force_knn(
            candidates,
            spark.createDataFrame(
                qpd[["query_id", "lon", "lat"]], "query_id string, lon double, lat double"
            ),
            k=k,
            query_id="query_id",
            cand_id=cand_id,
        ).toPandas()
        resolved_parts.append(brute)

    if not resolved_parts:
        return spark.createDataFrame([], "query_id string, neighbor_id string, rank int, d2 double")
    out = pd.concat(resolved_parts, ignore_index=True)
    out["d2"] = out["d2"].round(12)
    return spark.createDataFrame(out, "query_id string, neighbor_id string, rank int, d2 double")


def brute_force_knn(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    query_id: str = "image_id",
    cand_id: str = "image_id",
) -> DataFrame:
    """Exactness baseline: broadcast queries x all candidates."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col("lon").alias("q_lon"),
        F.col("lat").alias("q_lat"),
    )
    c = candidates.select(F.col(cand_id).alias("neighbor_id"), "lon", "lat")
    joined = c.crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    d2 = (F.col("q_lon") - F.col("lon")) ** 2 + (F.col("q_lat") - F.col("lat")) ** 2
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        joined.withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "d2")
    )


# ---------------------------------------------------------------------------
# great-circle metric (FIXTURES.md §5 expected_knn uses haversine)
# ---------------------------------------------------------------------------

EARTH_R_M = 6371008.8  # mean earth radius


def _haversine_cols(lat1, lon1, lat2, lon2):
    from pyspark.sql import functions as F

    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * EARTH_R_M) * F.asin(F.sqrt(a))


def brute_force_knn_haversine(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    query_id: str = "image_id",
    cand_id: str = "image_id",
) -> DataFrame:
    """Exact great-circle kNN: broadcast queries x candidates; ties by
    neighbour id (FIXTURES.md §5 expected_knn semantics)."""
    from pyspark.sql import functions as F

    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col("lon").alias("q_lon"),
        F.col("lat").alias("q_lat"),
    )
    c = candidates.select(F.col(cand_id).alias("neighbor_id"), "lon", "lat")
    joined = c.crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    dist = _haversine_cols(F.col("q_lat"), F.col("q_lon"), F.col("lat"), F.col("lon"))
    w = Window.partitionBy("query_id").orderBy("dist_m", "neighbor_id")
    return (
        joined.withColumn("dist_m", dist)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("dist_m", 6).alias("dist_m"))
    )


def knn_ring_expansion_haversine(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    z: int = 9,
    initial_ring: int = 1,
    max_iters: int = 8,
    max_ring: int = 32,
    query_id: str = "image_id",
    cand_id: str = "image_id",
) -> DataFrame:
    """Great-circle ring-expansion kNN. Same shape as
    knn_ring_expansion; the resolution guard converts the searched cell
    block's edge distances to conservative metres (lon deltas scaled by
    the smallest cos(lat) in the block)."""
    from pyspark.sql import functions as F

    spark = candidates.sparkSession
    n = 2**z
    cands = (
        candidates.select(F.col(cand_id).alias("neighbor_id"), "lon", "lat")
        .withColumnRenamed("lon", "n_lon")
        .withColumnRenamed("lat", "n_lat")
    )
    x, y = tilemath.lonlat_to_tile_cols(F.col("n_lon"), F.col("n_lat"), z)
    cands = cands.withColumn("cx", x).withColumn("cy", y)

    qpd = queries.select(F.col(query_id).alias("query_id"), "lon", "lat").toPandas()
    qpd["cx"], qpd["cy"] = _cell_np(qpd["lon"].to_numpy(), qpd["lat"].to_numpy(), z)
    qpd["ring"] = initial_ring
    deg_m = math.pi * EARTH_R_M / 180.0
    resolved_parts: list[pd.DataFrame] = []

    for _ in range(max_iters):
        if len(qpd) == 0:
            break
        pend = spark.createDataFrame(
            qpd[["query_id", "lon", "lat", "cx", "cy", "ring"]],
            "query_id string, lon double, lat double, cx long, cy long, ring int",
        )
        exploded = (
            pend.withColumn(
                "jx", F.explode(F.sequence(F.col("cx") - F.col("ring"), F.col("cx") + F.col("ring")))
            )
            .withColumn(
                "jy", F.explode(F.sequence(F.col("cy") - F.col("ring"), F.col("cy") + F.col("ring")))
            )
            .where((F.col("jx") >= 0) & (F.col("jx") < n) & (F.col("jy") >= 0) & (F.col("jy") < n))
        )
        joined = (
            F.broadcast(exploded)
            .join(cands, (exploded["jx"] == cands["cx"]) & (exploded["jy"] == cands["cy"]))
            .where(F.col("neighbor_id") != F.col("query_id"))
        )
        dist = _haversine_cols(F.col("lat"), F.col("lon"), F.col("n_lat"), F.col("n_lon"))
        w = Window.partitionBy("query_id").orderBy("dist_m", "neighbor_id")
        topk = (
            joined.withColumn("dist_m", dist)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "dist_m")
            .toPandas()
        )

        qi = qpd.set_index("query_id")
        rings = qi["ring"]
        blk_lon_min = _lon_of(qi["cx"] - rings, n)
        blk_lon_max = _lon_of(qi["cx"] + rings + 1, n)
        blk_lat_max = _lat_of(qi["cy"] - rings, n)
        blk_lat_min = _lat_of(qi["cy"] + rings + 1, n)
        # conservative metres: lon degrees shrink by cos(lat); use the
        # smallest cos within the block's latitude span
        cos_min = np.minimum(
            np.cos(np.radians(np.abs(blk_lat_max))), np.cos(np.radians(np.abs(blk_lat_min)))
        )
        g_lon = np.minimum(qi["lon"] - blk_lon_min, blk_lon_max - qi["lon"]) * deg_m * cos_min
        g_lon = np.where((qi["cx"] - rings <= 0) & (qi["cx"] + rings >= n - 1), np.inf, g_lon)
        g_lat_low = np.where(qi["cy"] + rings >= n - 1, np.inf, (qi["lat"] - blk_lat_min) * deg_m)
        g_lat_high = np.where(qi["cy"] - rings <= 0, np.inf, (blk_lat_max - qi["lat"]) * deg_m)
        guard_m = pd.Series(np.minimum(g_lon, np.minimum(g_lat_low, g_lat_high)), index=qi.index)

        stats = topk.groupby("query_id").agg(kth=("dist_m", "max"), found=("dist_m", "size"))
        stats = stats.reindex(qi.index).fillna({"found": 0, "kth": np.inf})
        ok = (stats["found"] >= k) & (stats["kth"] <= guard_m)
        resolved_ids = set(stats.index[ok])
        if resolved_ids:
            resolved_parts.append(topk[topk["query_id"].isin(resolved_ids)])
        qpd = qpd[~qpd["query_id"].isin(resolved_ids)].copy()
        qpd["ring"] = qpd["ring"] * 2
        if len(qpd) and int(qpd["ring"].min()) > max_ring:
            break

    if len(qpd):
        brute = brute_force_knn_haversine(
            candidates,
            spark.createDataFrame(
                qpd[["query_id", "lon", "lat"]], "query_id string, lon double, lat double"
            ),
            k=k, query_id="query_id", cand_id=cand_id,
        ).toPandas()
        resolved_parts.append(brute)

    if not resolved_parts:
        return spark.createDataFrame([], "query_id string, neighbor_id string, rank int, dist_m double")
    out = pd.concat(resolved_parts, ignore_index=True)
    out["dist_m"] = out["dist_m"].round(6)
    return spark.createDataFrame(out, "query_id string, neighbor_id string, rank int, dist_m double")
