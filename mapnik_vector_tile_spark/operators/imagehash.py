"""Perceptual image hashing over binary image columns (image axis).

pHash (32x32 DCT-II, low 8x8 block, median threshold) and dHash
(9x8 horizontal gradient) as Arrow-batched mapInPandas kernels over the
hinted (bytes, fmt) image table, plus a banded hamming near-dup join
(pigeonhole on 16-bit chunks — same scale contract as
dedup.simhash_near_dups64: 2^16 buckets per band, the all-pairs matrix
never materializes, and `bytes` is never shuffled — each image hashes
where it is stored and only 8 bytes ride the exchange).

The reference treats rasters as opaque carry-through payloads
(src/vector_tile_processor.ipp raster clip/scale); image-payload
near-dedup is part of the training-data-pipeline surface this engine
adds on the image axis. Hash definitions are self-contained and pinned
by an independent FFT-based DCT oracle in tests/test_imagehash.py.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_DCT_CACHE: dict[int, np.ndarray] = {}


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: (M @ g @ M.T) is the 2-D transform."""
    m = _DCT_CACHE.get(n)
    if m is None:
        k = np.arange(n, dtype=np.float64)[:, None]
        i = np.arange(n, dtype=np.float64)[None, :]
        m = np.cos(math.pi * (2.0 * i + 1.0) * k / (2.0 * n)) * math.sqrt(2.0 / n)
        m[0, :] *= 1.0 / math.sqrt(2.0)
        _DCT_CACHE[n] = m
    return m


def _luma(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma as float64 (alpha ignored if present)."""
    if img.ndim == 2:
        return img.astype(np.float64)
    rgb = img[..., :3].astype(np.float64)
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114


def _pack_bits(bits: np.ndarray) -> int:
    """64 bools (bit 0 = most significant) -> signed int64."""
    u = 0
    for b in bits:
        u = (u << 1) | int(b)
    if u >= 1 << 63:
        u -= 1 << 64
    return u


def phash64_pixels(img: np.ndarray) -> int:
    """DCT pHash of one decoded image.

    Bilinear-resample luma to 32x32, 2-D orthonormal DCT-II, keep the
    low-frequency 8x8 block, zero the DC term, threshold every
    coefficient against the median of the 63 AC coefficients (DC's bit
    is always 0). 64 bits packed row-major, (0,0) most significant.
    """
    from mapnik_vector_tile_spark.functions import raster

    g = _luma(img)
    if g.shape != (32, 32):
        g = raster._resample_f64(g[:, :, None], 32, 32, "bilinear")[:, :, 0]
    m = _dct_matrix(32)
    block = (m @ g @ m.T)[:8, :8].copy()
    block[0, 0] = 0.0
    flat = block.ravel()
    med = float(np.median(flat[1:]))
    bits = flat > med
    bits[0] = False
    return _pack_bits(bits)


def dhash64_pixels(img: np.ndarray) -> int:
    """Difference hash: 9x8 luma, bit = pixel brighter than its right
    neighbour, row-major, 64 bits."""
    from mapnik_vector_tile_spark.functions import raster

    g = _luma(img)
    g = raster._resample_f64(g[:, :, None], 8, 9, "bilinear")[:, :, 0]
    bits = (g[:, :-1] > g[:, 1:]).ravel()
    return _pack_bits(bits)


def add_phash(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    out_col: str = "phash64",
    with_dhash: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Decode each image where it is stored and emit (id, hash) only —
    the binary column never reaches a shuffle. Arrow-batched; the
    per-image work is numpy (decode + one 32x32 DCT).

    on_error: "raise" fails the task on the first undecodable payload
    (strict ingest); "null" emits a NULL hash for that row so one
    corrupt image out of 10^12 doesn't kill the job — downstream joins
    drop NULLs, and `WHERE hash IS NULL` IS the corrupt-row report.
    """
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")
    cols = f"{id_col} string, {out_col} long" + (
        ", dhash64 long" if with_dhash else ""
    )

    def kernel(it):
        from mapnik_vector_tile_spark.functions import raster

        for pdf in it:
            ids = pdf[id_col].tolist()
            ph, dh = [], []
            for data in pdf[bytes_col]:
                try:
                    img = raster.decode_image(bytes(data))
                    ph.append(phash64_pixels(img))
                    dh.append(dhash64_pixels(img) if with_dhash else 0)
                except Exception:
                    if on_error == "raise":
                        raise
                    ph.append(None)
                    dh.append(None)
            out = {id_col: ids, out_col: pd.array(ph, dtype="Int64")}
            if with_dhash:
                out["dhash64"] = pd.array(dh, dtype="Int64")
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(kernel, cols)


def hamming_near_dups(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup id pairs by hamming distance over any int64 hash column
    (pHash, dHash, a stored fingerprint).

    Pigeonhole banding: <= 3 flipped bits leave at least one of the four
    16-bit chunks exact, so candidates come from four equi-joins on a
    chunk value (2^16 buckets per band — bounded buckets at 10^12 rows),
    then the exact 64-bit hamming filters. Returns (id_a, id_b, hamming)
    with id_a < id_b.
    """
    if max_hamming > 3:
        raise ValueError("16-bit x4 banding guarantees recall only to hamming 3")
    # ONE banded self-equi-join on (band index, band value) — the same
    # shape as the MinHash LSH candidate join. A per-band union of four
    # self-joins would rescan (and re-DECODE, if fed from add_phash) the
    # source eight times; exploding to (id, hash, band, value) rows
    # scans it once per side and shuffles only 4 rows of 20 bytes per
    # input row.
    bands = df.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).cast("long").alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col).cast("long"), 16 * b)
                        .bitwiseAND(F.lit(65535))
                        .alias("val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_h", F.col("_b.band").alias("band"), F.col("_b.val").alias("val"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._h").alias("h_a"),
            F.col("b._h").alias("h_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
