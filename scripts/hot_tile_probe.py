"""Measure the hot-tile decode straggler with/without explode_hot_tiles.

Builds ONE bench-shaped z13 tile (n features, unique image_id/caption
values -> per-occurrence dictionary like the salted encoder's output)
and times the distributed columnar decode at local[C]."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from mapnik_vector_tile_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def build_hot_tile(n: int) -> bytes:
    import zlib

    from mapnik_vector_tile_spark.functions import commands as Cmd
    from mapnik_vector_tile_spark.functions import pbf as P

    rng = np.random.default_rng(7)
    pxy = rng.integers(0, 4096, size=(n, 2)).astype(np.int64)
    zz = np.column_stack([Cmd.zigzag32(pxy[:, 0]), Cmd.zigzag32(pxy[:, 1])])
    tags = np.empty((n, 6), dtype=np.int64)
    tags[:, 0] = 0
    tags[:, 1] = np.arange(n) * 2
    tags[:, 2] = 1
    tags[:, 3] = np.arange(n) * 2 + 1
    tags[:, 4] = 2
    tags[:, 5] = 2 * n
    blob = P.encode_point_features_packed(tags, zz, None)
    values = []
    for i in range(n):
        values.append(P.encode_value(f"im-{i:07d}"))
        values.append(P.encode_value(f"caption text number {i} of this tile"))
    values.append(P.encode_value("png"))
    layer = P.encode_layer_packed("layer", blob, ["image_id", "caption", "fmt"], values)
    return zlib.compress(P.encode_tile([layer]))


def main():
    from mapnik_vector_tile_spark.operators import decode as D

    tile = build_hot_tile(N)
    print(f"hot tile: {N} feats, {len(tile)/1e6:.1f} MB compressed", flush=True)
    spark = get_spark(app_name="hot-probe", cores=CORES, shuffle_partitions=CORES)
    df = spark.createDataFrame(
        [(13, 1000, 2000, bytearray(tile))], "z int, x long, y long, tile binary"
    ).cache()
    df.count()
    keys = ["image_id", "caption", "fmt"]
    # warm both paths
    D.decode_tiles_columnar(df, keys).count()
    D.decode_tiles_columnar(D.explode_hot_tiles(df), keys).count()
    best = {"serial": float("inf"), "split": float("inf")}
    for _ in range(5):  # interleaved: slow host drift cancels
        for label in ("serial", "split"):
            t0 = time.perf_counter()
            d = df if label == "serial" else D.explode_hot_tiles(df)
            got = D.decode_tiles_columnar(d, keys).count()
            best[label] = min(best[label], time.perf_counter() - t0)
            assert got == N, (got, N)
    for label, v in best.items():
        print(f"{label:7s} {v*1e3:8.0f} ms", flush=True)
    print(f"speedup {best['serial']/best['split']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
