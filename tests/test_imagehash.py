"""Perceptual image hashing: independent-DCT oracle, invariance
properties, and the banded hamming near-dup join vs brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mapnik_vector_tile_spark.functions import raster
from mapnik_vector_tile_spark.operators import imagehash as IH
from mapnik_vector_tile_spark.sources.images import _pixels_for, generate_images_pandas


# --- the DCT basis vs an INDEPENDENT FFT-based DCT-II (Makhoul) ---------------


def _dct2_fft(g: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D DCT-II via the even-odd FFT reordering — a
    different algorithm from the implementation's cosine matrix."""

    def dct1(x: np.ndarray) -> np.ndarray:  # along axis 0
        n = x.shape[0]
        v = np.empty_like(x, dtype=np.float64)
        v[: (n + 1) // 2] = x[::2]
        v[(n + 1) // 2:] = x[1::2][::-1]
        c = np.fft.fft(v, axis=0)
        k = np.arange(n).reshape((n,) + (1,) * (x.ndim - 1))
        out = np.real(np.exp(-1j * np.pi * k / (2.0 * n)) * c)
        out *= np.sqrt(2.0 / n)
        out[0] *= 1.0 / np.sqrt(2.0)
        return out

    return dct1(dct1(g).T).T


def test_dct_matrix_matches_fft_dct():
    rng = np.random.default_rng(7)
    g = rng.uniform(0, 255, (32, 32))
    m = IH._dct_matrix(32)
    np.testing.assert_allclose(m @ g @ m.T, _dct2_fft(g), atol=1e-9)
    # orthonormality: M M^T == I exactly within float
    np.testing.assert_allclose(m @ m.T, np.eye(32), atol=1e-12)


# --- hash properties ----------------------------------------------------------


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_brightness_invariant_and_discriminative():
    # a generic textured image: the separable fixture pattern leaves
    # many DCT coefficients EXACTLY at the median (ties flip on 1e-13
    # float noise), which is a property of pHash itself, not a bug
    rng = np.random.default_rng(42)
    img = rng.integers(30, 200, (32, 32, 3), dtype=np.uint8)
    h0 = IH.phash64_pixels(img)
    # uniform brightness shift only moves the DC coefficient, which the
    # hash zeroes: identical fingerprint (no clipping: range 30..205)
    shifted = (img.astype(np.int16) + 5).astype(np.uint8)
    assert IH.phash64_pixels(shifted) == h0
    # a different image is far away
    other = IH.phash64_pixels(rng.integers(30, 200, (32, 32, 3), dtype=np.uint8))
    assert _ham(h0, other) > 10
    # upscaling the same LOW-FREQUENCY content stays nearby (white-noise
    # texture wouldn't survive a resample round-trip, by design)
    smooth = _smooth_image(5)
    up = raster.resize_any(smooth, 64, 64, "bilinear")
    assert _ham(IH.phash64_pixels(up), IH.phash64_pixels(smooth)) <= 4


def _smooth_image(seed: int) -> np.ndarray:
    """Deterministic low-frequency test content: 8x8 noise upsampled."""
    rng = np.random.default_rng(seed)
    small = rng.integers(20, 235, (8, 8, 3), dtype=np.uint8)
    return raster.resize_any(small, 32, 32, "bilinear")


def test_phash_format_invariance_lossless_and_jpeg_near():
    img = _smooth_image(9)
    h_png = IH.phash64_pixels(raster.decode_image(raster.encode_image(img, "png")))
    h_webp = IH.phash64_pixels(raster.decode_image(raster.encode_image(img, "webp")))
    assert h_png == h_webp == IH.phash64_pixels(img)
    h_jpeg = IH.phash64_pixels(raster.decode_image(raster.encode_image(img, "jpeg")))
    assert _ham(h_png, h_jpeg) <= 6


def test_dhash_shift_invariant_and_packs_msb_first():
    img = _smooth_image(4)
    d0 = IH.dhash64_pixels(img)
    shifted = (img.astype(np.int16) + 7).astype(np.uint8)
    assert IH.dhash64_pixels(shifted) == d0
    # gradient image: every left pixel darker than its right neighbour
    ramp = np.tile(np.arange(9, dtype=np.uint8)[None, :] * 20, (8, 1))
    ramp3 = np.stack([ramp] * 3, axis=-1)
    assert IH.dhash64_pixels(ramp3) == 0  # never brighter-left
    assert IH.dhash64_pixels(ramp3[:, ::-1]) == -1  # all 64 bits set


def test_pack_bits_sign_convention():
    bits = np.zeros(64, dtype=bool)
    bits[0] = True  # MSB only -> int64 min
    assert IH._pack_bits(bits) == -(1 << 63)
    bits[:] = False
    bits[63] = True
    assert IH._pack_bits(bits) == 1


# --- banded hamming join vs brute force (Spark) -------------------------------


@pytest.fixture(scope="module")
def hash_rows():
    rng = np.random.default_rng(13)
    base = [int(x) for x in rng.integers(-(2 ** 62), 2 ** 62, 40, dtype=np.int64)]
    rows = [(f"id{i:03d}", h) for i, h in enumerate(base)]
    # planted near-dups at hamming 0..3 of id000, and one at 4 (excluded)
    flips = {0: [], 1: [5], 2: [7, 40], 3: [1, 33, 62], 4: [2, 18, 44, 59]}
    for d, pos in flips.items():
        h = base[0]
        for p in pos:
            h ^= 1 << p
        if h >= 1 << 63:
            h -= 1 << 64
        rows.append((f"dup{d}", h))
    return rows


def test_hamming_near_dups_matches_brute(spark, hash_rows):  # noqa: F811
    df = spark.createDataFrame(hash_rows, "image_id string, h long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in IH.hamming_near_dups(df, "image_id", "h", max_hamming=3).collect()
    }
    want = set()
    for i, (ia, ha) in enumerate(hash_rows):
        for ib, hb in hash_rows[i + 1:]:
            d = _ham(ha, hb)
            if d <= 3:
                lo, hi = sorted((ia, ib))
                want.add((lo, hi, d))
    assert got == want
    assert any(a == "dup3" or b == "dup3" for a, b, _ in got)
    assert not any("dup4" in (a, b) for a, b, _ in got)


def test_add_phash_end_to_end_cross_format_dedup(spark):  # noqa: F811
    """Same pixels stored as png AND webp under different ids are found
    as a hamming-0 pair through decode -> pHash -> banded join."""
    pdf = generate_images_pandas(8)
    img = _pixels_for(2, 32, 32)
    extra = pd.DataFrame(
        [
            ("dup_png", raster.encode_image(img, "png"), 32, 32, "png", "c", 1),
            ("dup_webp", raster.encode_image(img, "webp"), 32, 32, "webp", "c", 2),
        ],
        columns=list(pdf.columns),
    )
    df = spark.createDataFrame(pd.concat([pdf, extra], ignore_index=True))
    hashed = IH.add_phash(df, with_dhash=True)
    pairs = IH.hamming_near_dups(hashed, "image_id", "phash64", max_hamming=3)
    found = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert found.get(("dup_png", "dup_webp")) == 0
    # fixture images are all mutually distinct (jpeg rows may drift a
    # bit or two from their own lossless twin but there are none here)
    assert all({a, b} == {"dup_png", "dup_webp"} for a, b in found)
    # dhash agrees on the planted pair too
    row = {r.image_id: r.dhash64 for r in hashed.collect()}
    assert row["dup_png"] == row["dup_webp"]


def test_image_near_dup_pipeline_end_to_end(spark):  # noqa: F811
    """The full image near-dup curation chain as one composition:
    decode -> pHash -> banded hamming join -> connected components ->
    one representative (min id) per cluster. Three planted clusters
    (lossless re-encodes and a +4 brightness shift of the same pixels,
    transitively linked) collapse to their min-id representative;
    unrelated fixture images survive untouched."""
    from mapnik_vector_tile_spark.operators import dedup as DD

    base = generate_images_pandas(6)
    rng = np.random.default_rng(31)

    def img_of(seed):
        return rng.integers(20, 230, (32, 32, 3), dtype=np.uint8)

    rows = []
    for cluster, seed in (("a", 1), ("b", 2)):
        img = img_of(seed)
        shifted = (np.clip(img, 0, 245).astype(np.int16) + 4).astype(np.uint8)
        rows.append((f"{cluster}0", raster.encode_image(img, "png"), 32, 32,
                     "png", "c", 0))
        rows.append((f"{cluster}1", raster.encode_image(img, "webp"), 32, 32,
                     "webp", "c", 0))
        rows.append((f"{cluster}2", raster.encode_image(shifted, "png"), 32, 32,
                     "png", "c", 0))
    extra = pd.DataFrame(rows, columns=list(base.columns))
    df = spark.createDataFrame(pd.concat([base, extra], ignore_index=True))

    hashed = IH.add_phash(df)
    pairs = IH.hamming_near_dups(hashed, "image_id", "phash64", max_hamming=3)
    comp = DD.connected_components(pairs, a="id_a", b="id_b")
    # representative = min image_id per component; unpaired images keep
    # themselves — the kept set:
    from pyspark.sql import functions as F

    clustered = {r.id: r.component for r in comp.collect()}
    all_ids = {r.image_id for r in hashed.select("image_id").collect()}
    kept = {i for i in all_ids if i not in clustered} | set(clustered.values())
    # clip at 245 keeps the +4 shift uniform, so each planted trio is
    # one cluster with the min id as its representative
    assert {"a0", "b0"} <= kept
    assert not ({"a1", "a2", "b1", "b2"} & kept)
    assert {f"img{i:012d}" for i in range(6)} <= kept


def test_add_phash_on_error_null_vs_raise(spark):  # noqa: F811
    """One corrupt payload out of many must not kill the lenient job:
    on_error='null' emits NULL for the bad row (the corrupt-row report)
    while every good row hashes identically to the strict path."""
    pdf = generate_images_pandas(5)
    bad = pd.DataFrame(
        [("bad0", b"\x89PNG\r\n\x1a\nNOT-A-PNG", 32, 32, "png", "c", 9)],
        columns=list(pdf.columns),
    )
    df = spark.createDataFrame(pd.concat([pdf, bad], ignore_index=True))
    lenient = {r.image_id: r.phash64 for r in IH.add_phash(df, on_error="null").collect()}
    assert lenient["bad0"] is None
    strict_good = {
        r.image_id: r.phash64
        for r in IH.add_phash(spark.createDataFrame(pdf)).collect()
    }
    assert {k: v for k, v in lenient.items() if k != "bad0"} == strict_good
    with pytest.raises(Exception):
        IH.add_phash(df, on_error="raise").collect()
    with pytest.raises(ValueError):
        IH.add_phash(df, on_error="bogus")
