"""Per-partition lineage + metrics (north rule: "every tile-partition
emits lineage (input snapshot id, cell range, row counts)").

The reference has no distributed analogue (single-process); the nearest
bookkeeping is the tile's painted/empty layer sets
(src/vector_tile_tile.hpp:115-123). Here every mapInPandas partition of
the tile build can emit one lineage row describing what it consumed and
produced; rows are written next to the output as a manifest table.

Snapshot id: for Iceberg inputs this is the table snapshot pinned at
read; for plain parquet we fingerprint the input file list (name+size),
which is the same idea — a stable identifier of the exact input set.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_SCHEMA = (
    "partition_id int, snapshot_id string, min_z int, min_x long, min_y long, "
    "max_z int, max_x long, max_y long, n_rows long, n_tiles long, wall_ms long"
)


def snapshot_id_for_path(path: str) -> str:
    """Spark-free file-listing fingerprint (name+size) — the parquet
    stand-in for an Iceberg snapshot id."""
    names = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                names.append(f"{f}:{os.path.getsize(full)}")
    digest = hashlib.sha256("|".join(sorted(names)).encode()).hexdigest()[:16]
    return f"files:{digest}"


def input_snapshot_id(spark: SparkSession, path: str) -> str:
    """Stable identifier of the input set: Iceberg snapshot when
    available, else a fingerprint of the file listing."""
    try:  # Iceberg path (jars absent in this sandbox)
        snap = spark.sql(f"SELECT snapshot_id FROM {path}.snapshots ORDER BY committed_at DESC LIMIT 1")
        return str(snap.collect()[0][0])
    except Exception:
        pass
    return snapshot_id_for_path(path)


def tiles_with_lineage(tiles: DataFrame, snapshot_id: str):
    """Wrap a tile DataFrame so each partition also emits a lineage row.

    Returns (tiles_df, lineage_df) — two passes over the cached tiles
    (caller persists if the input is expensive)."""
    lineage = tiles.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.lit(snapshot_id).alias("snapshot_id"),
        F.min("z").alias("min_z"), F.min("x").alias("min_x"), F.min("y").alias("min_y"),
        F.max("z").alias("max_z"), F.max("x").alias("max_x"), F.max("y").alias("max_y"),
        F.sum("n_features").alias("n_rows"),
        F.count("*").alias("n_tiles"),
    )
    return tiles, lineage


def tiles_with_shard_lineage(tiles: DataFrame, snapshot_id: str, n_shards: int = 32):
    """Lineage keyed by a DATA-derived shard (portable md5 of the cell
    key) instead of spark_partition_id — the manifest is then stable
    across executions/cluster sizes and independently recomputable by
    any engine (the driver's DuckDB oracle checks it)."""
    cell = F.concat_ws(
        ":", F.col("z").cast("string"), F.col("x").cast("string"), F.col("y").cast("string")
    )
    shard = (
        F.conv(F.substring(F.md5(cell), 1, 15), 16, 10).cast("long") % F.lit(n_shards)
    ).cast("int")
    lineage = tiles.groupBy(shard.alias("shard_id")).agg(
        F.lit(snapshot_id).alias("snapshot_id"),
        F.min("z").alias("min_z"), F.min("x").alias("min_x"), F.min("y").alias("min_y"),
        F.max("z").alias("max_z"), F.max("x").alias("max_x"), F.max("y").alias("max_y"),
        F.sum("n_features").alias("n_rows"),
        F.count("*").alias("n_tiles"),
    )
    return tiles, lineage


def write_tiles_with_manifest(
    tiles: DataFrame,
    out_dir: str,
    snapshot_id: str,
    partition_by: tuple[str, ...] = ("z",),
) -> dict:
    """Tile sink (S5 writ large): parquet tiles + lineage manifest +
    a tiny job manifest json for resume (plans.checkpoints)."""
    t0 = time.time()
    tiles = tiles.persist()
    tiles.write.mode("overwrite").partitionBy(*partition_by).parquet(
        os.path.join(out_dir, "tiles")
    )
    _, lineage = tiles_with_lineage(tiles, snapshot_id)
    lineage.write.mode("overwrite").parquet(os.path.join(out_dir, "lineage"))
    stats = tiles.agg(
        F.count("*").alias("tiles"), F.sum("n_features").alias("features")
    ).collect()[0]
    manifest = {
        "snapshot_id": snapshot_id,
        "tiles": int(stats["tiles"]),
        "features": int(stats["features"] or 0),
        "wall_sec": round(time.time() - t0, 3),
        "completed": True,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    tiles.unpersist()
    return manifest
