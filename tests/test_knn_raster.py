"""kNN ring expansion vs brute force; raster kernel invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.functions import raster as R
from mapnik_vector_tile_spark.operators import knn
from mapnik_vector_tile_spark.sources import images as IMG


@pytest.fixture(scope="module")
def located(images_small):
    return IMG.with_location(images_small).cache()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["query_id", "neighbor_id", "rank"]]
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_knn_ring_matches_brute_force(located):
    queries = located.orderBy("image_id").limit(25).select("image_id", "lon", "lat")
    fast = knn.knn_ring_expansion(located, queries, k=5, z=9).toPandas()
    slow = knn.brute_force_knn(located, queries, k=5).toPandas()
    pd.testing.assert_frame_equal(_norm(fast), _norm(slow))


def test_knn_hotspot_queries(located):
    """Queries inside the dense city cluster (skew clause) still exact."""
    hot = (
        located.where((F.col("lon") > -123) & (F.col("lon") < -122) & (F.col("lat") > 37) & (F.col("lat") < 38))
        .orderBy("image_id")
        .limit(15)
        .select("image_id", "lon", "lat")
    )
    fast = knn.knn_ring_expansion(located, hot, k=5, z=9).toPandas()
    slow = knn.brute_force_knn(located, hot, k=5).toPandas()
    pd.testing.assert_frame_equal(_norm(fast), _norm(slow))


# --- raster kernels ----------------------------------------------------------

def test_png_roundtrip_exact():
    img = IMG._pixels_for(7, 32, 32)
    assert np.array_equal(R.png_decode(R.png_encode(img)), img)


def test_png_decode_filtered_rows():
    """Decoder handles Sub/Up/Average/Paeth rows (external producers)."""
    import struct, zlib

    img = IMG._pixels_for(3, 8, 8)
    h, w = img.shape[:2]
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for ri, ft in enumerate([0, 1, 2, 3, 4, 0, 2, 1]):
        line = img[ri].reshape(-1)
        raw.append(ft)
        if ft == 0:
            raw.extend(line.tobytes())
        elif ft == 1:
            enc = line.astype(np.int16).copy()
            enc[3:] -= line[:-3]
            raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        elif ft == 2:
            raw.extend(((line.astype(np.int16) - prev) & 0xFF).astype(np.uint8).tobytes())
        elif ft == 3:
            enc = np.empty(w * 3, dtype=np.uint8)
            for i in range(w * 3):
                left = int(line[i - 3]) if i >= 3 else 0
                enc[i] = (int(line[i]) - ((left + int(prev[i])) >> 1)) & 0xFF
            raw.extend(enc.tobytes())
        elif ft == 4:
            enc = np.empty(w * 3, dtype=np.uint8)
            for i in range(w * 3):
                a = int(line[i - 3]) if i >= 3 else 0
                c = int(prev[i - 3]) if i >= 3 else 0
                b = int(prev[i])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (int(line[i]) - pred) & 0xFF
            raw.extend(enc.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + R._chunk(b"IHDR", ihdr)
        + R._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + R._chunk(b"IEND", b"")
    )
    assert np.array_equal(R.png_decode(data), img)


def test_jpeg_stub_lossy_psnr():
    img = IMG._pixels_for(11, 64, 64)
    enc = R.jpeg_stub_encode(img)
    assert R.sniff_format(enc) == "jpeg"
    back = R.jpeg_stub_decode(enc)
    assert R.psnr(img, back) >= 40.0


def test_real_jfif_decodes_for_real():
    """r1 stubbed real JFIF behind NotImplementedError; round 2 ships a
    real baseline codec (functions.jpeg, full coverage in test_jpeg.py)."""
    img = IMG._pixels_for(5, 32, 32)
    data = R.jpeg_encode(img)
    assert data[:4] == b"\xff\xd8\xff\xe0" and b"MVTS" not in data[:8]
    assert R.psnr(img, R.decode_image(data)) >= 40.0
    # the stub decoder itself stays strictly for stub payloads
    with pytest.raises(ValueError):
        R.jpeg_stub_decode(data)


def test_bilinear_passthrough_and_downscale():
    img = IMG._pixels_for(5, 32, 32)
    same = R.bilinear_resize(img, 32, 32)
    assert np.array_equal(same, img)  # fast path (raster_clipper.ipp:37-41)
    half = R.bilinear_resize(img, 16, 16)
    assert half.shape == (16, 16, 3)
    # linear gradients survive bilinear resampling nearly exactly
    assert R.psnr(half[:, :, 0], img[::2, ::2, 0]) > 30


def test_overzoom_crop_window_quadrants():
    """z14 child within z13 parent = one image quadrant
    (featureset_pbf.ipp:210-258 window math)."""
    from mapnik_vector_tile_spark import tilemath

    src = tuple(float(v) for v in tilemath.tile_mercator_bbox_np(100, 200, 13))
    for (cx, cy), expect in {
        (200, 400): (0, 0, 16, 16),      # NW child
        (201, 400): (16, 0, 32, 16),     # NE child
        (200, 401): (0, 16, 16, 32),     # SW child
        (201, 401): (16, 16, 32, 32),    # SE child
    }.items():
        q = tuple(float(v) for v in tilemath.tile_mercator_bbox_np(cx, cy, 14))
        assert R.overzoom_crop_window(32, 32, src, q) == expect


def test_raster_invariants_pipeline(located):
    from mapnik_vector_tile_spark.operators import raster_assoc

    out = raster_assoc.raster_patch_invariants(located.limit(120)).toPandas()
    assert len(out) == 120
    assert out["psnr_ok"].all()
    assert out["caption_ok"].all()
    scaled = out[out["op"] == "scale_bilinear"]
    assert (scaled["out_w"] * 2 == scaled["w"]).all()


def test_raster_feature_carries_bytes(located, spark):
    from mapnik_vector_tile_spark.operators import decode as D
    from mapnik_vector_tile_spark.operators import raster_assoc

    tiles = raster_assoc.raster_tiles(located.limit(60), z=3, prop_cols=["caption"])
    decoded = D.decode_tiles(tiles).where(F.col("raster").isNotNull()).toPandas()
    assert len(decoded) == 60
    src = {r["image_id"]: bytes(r["bytes"]) for r in located.limit(60).collect()}
    row = decoded.iloc[0]
    assert bytes(row["raster"]) == src[row["props"]["image_id"]]


def test_knn_haversine_matches_brute_force(located):
    """FIXTURES §5 expected_knn semantics: great-circle distance, k=5,
    hotspot-cluster queries, ties by image_id."""
    from mapnik_vector_tile_spark.operators import knn as K

    hot = (
        located.where(
            (F.col("lon") > -123) & (F.col("lon") < -122)
            & (F.col("lat") > 37) & (F.col("lat") < 38)
        )
        .orderBy("image_id")
        .limit(12)
        .select("image_id", "lon", "lat")
    )
    fast = K.knn_ring_expansion_haversine(located, hot, k=5, z=9).toPandas()
    slow = K.brute_force_knn_haversine(located, hot, k=5).toPandas()
    pd.testing.assert_frame_equal(_norm(fast), _norm(slow))


@pytest.mark.slow
def test_knn_100k_queries_no_driver_materialization(spark):
    """kNN for EVERY row (1e5 queries == 1e5 candidates) runs through
    the iterative distributed path (pending set > one-shot cutoff) with
    ZERO driver-side candidate materialization: toPandas is never called
    during the computation. Correctness spot-checked on a sampled query
    subset against brute force."""
    import pyspark.sql.classic.dataframe as cdf

    n = 100_000

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            h1 = (ids * 2654435761) % (2**32)
            h2 = (ids * 2246822519 + 1013904223) % (2**32)
            yield pd.DataFrame(
                {
                    "image_id": [f"q{int(i):09d}" for i in ids],
                    "lon": h1 / 2**32 * 360.0 - 180.0,
                    "lat": h2 / 2**32 * 170.0 - 85.0,
                }
            )

    pts = (
        spark.range(n).repartition(8)
        .mapInPandas(gen, "image_id string, lon double, lat double")
        .localCheckpoint(eager=True)
    )

    calls = {"n": 0}
    orig = cdf.DataFrame.toPandas

    def spy(self):
        calls["n"] += 1
        return orig(self)

    cdf.DataFrame.toPandas = spy
    try:
        out = knn.knn_ring_expansion(pts, pts, k=3, z=9)
        total = out.count()
    finally:
        cdf.DataFrame.toPandas = orig
    assert calls["n"] == 0, "kNN materialized a DataFrame on the driver"
    assert total == 3 * n

    # sampled exactness vs brute force
    sample = pts.where(F.col("image_id").substr(2, 9).cast("long") % 9973 == 0)
    brute = knn.brute_force_knn(pts, sample, k=3).toPandas()
    got = (
        out.join(sample.select(F.col("image_id").alias("query_id")), "query_id")
        .toPandas()
    )
    key = ["query_id", "rank"]
    b = brute.sort_values(key).reset_index(drop=True)
    g = got.sort_values(key).reset_index(drop=True)
    assert list(b["neighbor_id"]) == list(g["neighbor_id"])
