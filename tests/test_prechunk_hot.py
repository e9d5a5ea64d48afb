"""Store-time pre-chunking of hot tiles (round-6 scale item).

With ``prechunk_hot=True`` the salted encoder ships every salt bucket
of a hot tile as its OWN standalone single-layer tile row — no
monolithic blob is ever materialized (the per-tile concat + single
zlib stream was the salted path's only serial stage), and the decode
side needs no explode_hot_tiles split pass. Reference semantics
parity: the decoded feature multiset must equal the monolithic tile's
(mapbox/mapnik-vector-tile src/vector_tile_tile.hpp stores one buffer
per tile; the multi-row form is this engine's distributed storage
contract, merged back via composite when a single blob is required).
"""

import pandas as pd
import pytest

from tests.test_tile_pipeline import Z_TEST, located  # noqa: F401


def _norm(df):
    out = pd.DataFrame(
        {
            "image_id": [m["image_id"] for m in df["props"]],
            "caption": [m["caption"] for m in df["props"]],
            "z": df["z"].astype(int),
            "x": df["x"].astype(int),
            "y": df["y"].astype(int),
            "wkt": df["geom_wkt"],
        }
    )
    return out.sort_values("image_id").reset_index(drop=True)


def test_prechunk_hot_decodes_identically(spark, located):  # noqa: F811
    from mapnik_vector_tile_spark.operators import assign as A, decode as D, encode as E

    assigned = A.assign_tiles(located, Z_TEST)
    mono = E.build_point_tiles(
        assigned, prop_cols=["image_id", "caption"], order_col="image_id",
        hot_threshold=50,
    )
    pre = E.build_point_tiles(
        assigned, prop_cols=["image_id", "caption"], order_col="image_id",
        hot_threshold=50, prechunk_hot=True,
    )
    dm = D.decode_tiles(mono).toPandas()
    dp = D.decode_tiles(pre).toPandas()
    assert len(dm) == len(dp) == 2000
    pd.testing.assert_frame_equal(_norm(dm), _norm(dp))

    # multiple rows per hot (z,x,y); every row a standalone valid tile
    pp = pre.toPandas()
    per_tile = pp.groupby(["z", "x", "y"]).size()
    assert (per_tile > 1).any(), "expected pre-chunked hot tiles"
    assert (pp["n_layers"] == 1).all() and pp["painted"].all()
    # n_features conserved across the bucket rows
    mm = mono.toPandas()
    got = pp.groupby(["z", "x", "y"])["n_features"].sum().sort_index()
    want = mm.set_index(["z", "x", "y"])["n_features"].sort_index()
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_prechunk_rows_are_valid_tiles(spark, located):  # noqa: F811
    """Each bucket row passes the validity scan (unique layer name per
    row, decodable geometry) and the columnar decoder consumes the
    rows unchanged."""
    from mapnik_vector_tile_spark.operators import assign as A, decode as D, encode as E
    from mapnik_vector_tile_spark.operators import validity as V

    assigned = A.assign_tiles(located, Z_TEST)
    pre = E.build_point_tiles(
        assigned, prop_cols=["image_id", "caption"], order_col="image_id",
        hot_threshold=50, prechunk_hot=True,
    )
    findings, stats = V.validate_tiles(pre)
    assert findings.count() == 0, findings.toPandas().head()
    sp = stats.toPandas()
    assert int(sp["n_features"].sum()) == 2000
    assert int(sp["n_point"].sum()) == 2000
    col = D.decode_tiles_columnar(pre, ["image_id", "caption"]).toPandas()
    assert len(col) == 2000
    assert sorted(col["image_id"]) == sorted(
        m["image_id"] for m in D.decode_tiles(pre).toPandas()["props"]
    )
