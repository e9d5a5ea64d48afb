"""spark-submit entry: the flagship tile build from a packaged zip.

    python -m mapnik_vector_tile_spark ... is not needed — this script
    plus --py-files <zip> is the whole deployment:

    spark-submit --master local[8] --py-files /tmp/mvt.zip \
        scripts/submit_job.py --rows 100000 --z 13 --out /tmp/tiles_out
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100000)
    ap.add_argument("--z", type=int, default=13)
    ap.add_argument("--out", default="/tmp/mvt_submit_out")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mvt-submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from mapnik_vector_tile_spark.operators import assign, encode
    from mapnik_vector_tile_spark.plans import lineage as L
    from mapnik_vector_tile_spark.sources import images as IMG

    path = IMG.ensure_images(spark, args.rows)
    located = IMG.with_location(spark.read.parquet(path))
    tiles = encode.build_point_tiles(
        assign.assign_tiles(located, args.z),
        prop_cols=["image_id", "caption", "fmt"],
        order_col="image_id",
    )
    snap = L.input_snapshot_id(spark, path)
    manifest = L.write_tiles_with_manifest(tiles, args.out, snap)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
