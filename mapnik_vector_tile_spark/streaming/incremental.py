"""Incremental tile maintenance via Structured Streaming.

The reference is batch-only (SURVEY.md §2.9); the engine's streaming
extension treats newly-arrived image rows as a stream and maintains
per-tile aggregates / rebuilt tiles with availableNow triggers
(catch-up-then-stop, the resumable-batch idiom) and checkpointed state.

``stream_tile_counts``: file stream of image parquet -> cell assignment
(pure Column math works unchanged on streams) -> windowless running
per-tile counts in update mode (state store) — the A4 painted stats as
a live materialized view.

``stream_rebuild_tiles``: foreachBatch micro-batch handler that runs
the normal batch encode per epoch and composites with previous tiles —
exactly-once via the sink's epoch directory + Spark's checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from mapnik_vector_tile_spark.sources.images import IMAGES_SCHEMA, with_location
from mapnik_vector_tile_spark.operators.assign import assign_tiles


def stream_tile_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    z: int = 13,
    query_name: str = "tile_counts",
):
    """Streaming per-tile counts with availableNow (process what exists,
    then stop — resumable from the checkpoint on the next invocation)."""
    stream = (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    assigned = assign_tiles(with_location(stream), z)
    counts = assigned.groupBy("z", "x", "y").agg(F.count("*").alias("n_rows"))
    return (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_decode_features(
    spark: SparkSession,
    tiles_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    prop_keys: list[str],
):
    """Streaming DECODE scan: a stream of encoded tile rows (e.g. a
    tile build landing in object storage) is decoded to feature rows by
    the same columnar kernel the batch scan uses — mapInPandas is
    stateless, so the scan rides Structured Streaming unchanged and
    each input file is decoded exactly once across resumable
    availableNow runs (appended as parquet)."""
    from mapnik_vector_tile_spark.operators import decode as D

    stream = (
        spark.readStream.schema(
            "z int, x long, y long, tile binary, n_features long, "
            "n_layers int, painted boolean"
        )
        .option("maxFilesPerTrigger", 8)
        .parquet(tiles_dir)
    )
    decoded = D.decode_tiles_columnar(stream.where(F.col("painted")), prop_keys)
    return (
        decoded.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window_duration: str = "5 minutes",
    watermark_delay: str = "5 minutes",
):
    """Event-time tumbling-window counts with a watermark: late rows
    beyond the delay are DROPPED, closed windows append exactly once to
    the parquet sink (the brief's 'watermarks + windowed aggs for late
    data'). availableNow + checkpoint make it a resumable incremental
    job: each invocation processes what arrived since the last one."""
    stream = (
        spark.readStream.schema("event_id long, event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type", "n", "total",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_events(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    gap: str = "10 minutes",
):
    """Custom stateful operator via applyInPandasWithState (the brief's
    'applyInPandasWithState for custom stateful operators'): groups an
    event stream into EVENT-TIME sessions per event_type — a session
    closes when the watermark passes last_event + gap, emitting
    (event_type, session_start, session_end, n, total). Event-time
    timeouts are data-driven (deterministic under replay); a
    processing-time variant would also keep an availableNow query alive
    in a state-cleanup loop forever. State survives micro-batches and
    restarts through the checkpointed state store; closed sessions
    append to the parquet sink."""
    import datetime as _dt

    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)

    stream = (
        spark.readStream.schema("event_id long, event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
        .withWatermark("ts", gap)
    )

    def fn(key, pdfs, state):
        etype = key[0]
        if state.hasTimedOut:
            start_ms, end_ms, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "event_type": [etype],
                    "session_start": [_dt.datetime.utcfromtimestamp(start_ms / 1000.0)],
                    "session_end": [_dt.datetime.utcfromtimestamp(end_ms / 1000.0)],
                    "n": [n],
                    "total": [total],
                }
            )
            return
        start_ms = end_ms = None
        n = 0
        total = 0.0
        if state.exists:
            start_ms, end_ms, n, total = state.get
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            start_ms = lo if start_ms is None else min(start_ms, lo)
            end_ms = hi if end_ms is None else max(end_ms, hi)
            n += int(len(pdf))
            total += float(pdf["value"].sum())
        if start_ms is not None:
            state.update((start_ms, end_ms, n, total))
            # close when the WATERMARK passes last_event + gap (must stay
            # strictly ahead of the current watermark to be accepted)
            state.setTimeoutTimestamp(
                max(end_ms + gap_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(
            {
                "event_type": pd.Series([], dtype="object"),
                "session_start": pd.Series([], dtype="datetime64[ns]"),
                "session_end": pd.Series([], dtype="datetime64[ns]"),
                "n": pd.Series([], dtype="int64"),
                "total": pd.Series([], dtype="float64"),
            }
        )

    sessions = stream.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=(
            "event_type string, session_start timestamp, session_end timestamp, "
            "n long, total double"
        ),
        stateStructType="start_ms long, end_ms long, n long, total double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_rebuild_tiles(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    prop_cols: list[str],
    z: int = 13,
):
    """foreachBatch: run the batch tile encoder per micro-batch; each
    epoch lands in its own directory (idempotent per epoch id ->
    exactly-once together with the checkpoint)."""
    from mapnik_vector_tile_spark.operators.encode import build_point_tiles

    stream = (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        assigned = assign_tiles(with_location(batch_df), z)
        tiles = build_point_tiles(assigned, prop_cols, order_col="image_id")
        tiles.write.mode("overwrite").parquet(os.path.join(out_dir, f"epoch={epoch_id}"))

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_decode_packed(
    spark: SparkSession,
    tiles_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming PACKED decode scan (r4): the ragged xs/ys/offsets form
    rides Structured Streaming exactly like the columnar scan —
    decode_tiles_packed is a stateless mapInPandas, so arbitrary
    geometry tiles landing in object storage decode to Arrow list
    columns exactly once across resumable availableNow runs."""
    from pyspark.sql import functions as F

    from mapnik_vector_tile_spark.operators import decode as D

    stream = (
        spark.readStream.schema(
            "z int, x long, y long, tile binary, n_features long, "
            "n_layers int, painted boolean, n_unresolved int"
        )
        .option("maxFilesPerTrigger", 8)
        .parquet(tiles_dir)
    )
    decoded = D.decode_tiles_packed(stream.where(F.col("painted")))
    return (
        decoded.drop("raster")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
