"""Watermark + event-time windowed aggregation (streaming extension):
closed windows append exactly once across resumable availableNow runs;
rows later than the watermark delay are dropped."""

from __future__ import annotations

import datetime as dt

from mapnik_vector_tile_spark.streaming import incremental as S


def _write_events(spark, path: str, rows):
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def test_watermark_windowed_counts(spark, tmp_path):
    inp = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # run 1: window [10:00,10:05) fills, then an event at 10:10 pushes the
    # watermark to 10:05 and closes it
    _write_events(spark, inp, [
        (1, "a", ts(0), 1.0), (2, "a", ts(2), 2.0), (3, "b", ts(4), 3.0),
        (4, "a", ts(10), 4.0),
    ])
    S.stream_windowed_event_counts(spark, inp, chk, out).awaitTermination(120)
    got1 = spark.read.parquet(out).toPandas()
    closed1 = {
        (r["win_start"].minute, r["event_type"]): int(r["n"]) for _, r in got1.iterrows()
    }
    assert closed1 == {(0, "a"): 2, (0, "b"): 1}

    # run 2 (resumed from the checkpoint): a LATE event for the closed
    # window is dropped; 10:20 closes [10:10,10:15)
    _write_events(spark, inp, [
        (5, "a", ts(1), 99.0),   # late beyond the watermark -> dropped
        (6, "b", ts(11), 5.0),
        (7, "b", ts(20), 6.0),
    ])
    S.stream_windowed_event_counts(spark, inp, chk, out).awaitTermination(120)
    got2 = spark.read.parquet(out).toPandas()
    rows = {
        (r["win_start"].minute, r["event_type"]): int(r["n"]) for _, r in got2.iterrows()
    }
    # the late event never re-opens [10:00,10:05): count for (0,'a') stays 2
    assert rows[(0, "a")] == 2
    assert rows[(10, "a")] == 1  # the 10:10 event's window closed in run 2
    assert rows[(10, "b")] == 1
    assert (20, "b") not in rows  # still open (watermark at 10:15)


def test_sessionize_events_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: state persists across
    resumed availableNow runs; sessions close when the WATERMARK passes
    last_event + gap (event-time timeout) and append exactly once."""
    inp = str(tmp_path / "sin")
    chk = str(tmp_path / "schk")
    out = str(tmp_path / "sout")
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    _write_events(spark, inp, [
        (1, "a", t0, 1.0),
        (2, "a", t0 + dt.timedelta(minutes=1), 2.0),
        (3, "b", t0, 5.0),
    ])
    S.sessionize_events(spark, inp, chk, out, gap="10 minutes").awaitTermination(180)
    # run 2: an event an hour later advances the watermark past both
    # open sessions' end+gap -> they close; 'c' itself stays open
    _write_events(spark, inp, [(4, "c", t0 + dt.timedelta(hours=1), 7.0)])
    S.sessionize_events(spark, inp, chk, out, gap="10 minutes").awaitTermination(180)

    got = spark.read.parquet(out).toPandas()
    by_type = {r["event_type"]: r for _, r in got.iterrows()}
    assert by_type["a"]["n"] == 2 and abs(by_type["a"]["total"] - 3.0) < 1e-9
    assert by_type["a"]["session_end"].minute == 1
    assert by_type["b"]["n"] == 1 and abs(by_type["b"]["total"] - 5.0) < 1e-9
    assert "c" not in by_type  # its session is still open


def test_stream_decode_features(spark, images_small, tmp_path):
    """Streaming decode scan: encoded tiles landing as parquet decode to
    feature rows exactly once across resumable availableNow runs."""
    from mapnik_vector_tile_spark.operators import assign, decode, encode
    from mapnik_vector_tile_spark.sources import images as IMG

    tiles_dir = str(tmp_path / "tiles")
    out_dir = str(tmp_path / "decoded")
    chk = str(tmp_path / "chk")

    located = IMG.with_location(images_small.limit(400)).cache()
    tiles = encode.build_point_tiles(
        assign.assign_tiles(located, 3), ["image_id", "fmt"], order_col="image_id"
    )
    tiles.coalesce(1).write.mode("append").parquet(tiles_dir)

    q = S.stream_decode_features(spark, tiles_dir, out_dir, chk, ["image_id", "fmt"])
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    assert got.count() == 400
    batch = decode.decode_tiles_columnar(tiles, ["image_id", "fmt"])
    assert got.select("image_id").distinct().count() == batch.select("image_id").distinct().count() == 400

    # run 2 with NO new input: nothing re-decoded (exactly-once resume)
    q2 = S.stream_decode_features(spark, tiles_dir, out_dir, chk, ["image_id", "fmt"])
    q2.awaitTermination()
    assert spark.read.parquet(out_dir).count() == 400

    # run 3: a second batch of tiles lands; only the delta decodes
    more = encode.build_point_tiles(
        assign.assign_tiles(
            IMG.with_location(images_small.limit(500).subtract(images_small.limit(400))), 3
        ),
        ["image_id", "fmt"], order_col="image_id",
    )
    more.coalesce(1).write.mode("append").parquet(tiles_dir)
    q3 = S.stream_decode_features(spark, tiles_dir, out_dir, chk, ["image_id", "fmt"])
    q3.awaitTermination()
    assert spark.read.parquet(out_dir).count() == 500


def test_stream_decode_packed(spark, tmp_path):
    """r4: the packed ragged scan rides Structured Streaming — geometry
    tiles landing as parquet decode to xs/ys/offsets list columns
    exactly once, matching the batch packed scan row-for-row."""
    import pandas as pd

    from mapnik_vector_tile_spark.operators import decode, geom_tiles
    from mapnik_vector_tile_spark.streaming import incremental as S

    h = 20037508.342789244
    q = h / 4.0
    rows = [
        ("a", f"LINESTRING(-{q} 1000,{q} 2000)"),
        ("b", f"POLYGON(({q*0.1} {q*0.1},{q*0.9} {q*0.1},{q*0.9} {q*0.9},"
              f"{q*0.1} {q*0.1}))"),
        ("c", f"POINT({q*1.5} -{q*1.5})"),
    ]
    geoms = spark.createDataFrame(rows, "gid string, geom_wkt string")
    tiles = geom_tiles.build_geom_tiles(geoms, ["gid"], z=2, id_col="gid")
    tiles_dir = str(tmp_path / "tiles")
    tiles.write.parquet(tiles_dir)
    out_dir = str(tmp_path / "packed")
    chk = str(tmp_path / "chk")
    S.stream_decode_packed(spark, tiles_dir, out_dir, chk).awaitTermination(120)
    got = spark.read.parquet(out_dir).toPandas()
    want = decode.decode_tiles_packed(
        tiles.where("painted")
    ).drop("raster").toPandas()
    assert len(got) == len(want) > 0
    key = ["z", "x", "y", "feature_id"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert list(g["kind"]) == list(w["kind"])
    for a, b in zip(g["xs"], w["xs"]):
        assert list(a) == list(b)
    # exactly-once: rerun with no new input appends nothing
    S.stream_decode_packed(spark, tiles_dir, out_dir, chk).awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(want)
