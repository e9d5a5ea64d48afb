"""Tile container math goldens.

Ports the portable sections of test/unit/tile_impl/tile.cpp (scale,
buffered extent incl. the negative-buffer collapse) and
test/unit/layer_impl/layer.cpp's px-scale relation against tilemath.
The C++-object bookkeeping sections (layer name sets, append-buffer
framing) are covered behaviorally by the composite/encode suites."""

from __future__ import annotations

import numpy as np

from mapnik_vector_tile_spark import tilemath

HALF = tilemath.HALF_OF_EQUATOR
GLOBAL = (-HALF, -HALF, HALF, HALF)


def test_default_tile_scale():
    """tile.cpp: scale() of the global-extent 4096 tile."""
    scale = (GLOBAL[2] - GLOBAL[0]) / 4096.0
    assert abs(scale - 9783.9396205024) < 1e-5


def test_default_buffered_extent_128px():
    """tile.cpp: default buffer 128 px grows the world extent to the
    reference's literal +-21289852.6142133139."""
    out = tilemath.buffered_mercator_extent(*GLOBAL, 4096, 128)
    exp = 21289852.6142133139073849
    assert np.allclose(out, (-exp, -exp, exp, exp), rtol=0, atol=1e-4)


def test_positive_buffer_10px():
    """tile.cpp: buffer 10 -> +-20135347.7389940246."""
    out = tilemath.buffered_mercator_extent(*GLOBAL, 4096, 10)
    exp = 20135347.7389940246939659
    assert np.allclose(out, (-exp, -exp, exp, exp), rtol=0, atol=1e-4)


def test_very_negative_buffer_collapses():
    """tile.cpp: buffer -4000 inverts the box -> empty (0,0,0,0)."""
    assert tilemath.buffered_mercator_extent(*GLOBAL, 4096, -4000) == (
        0.0, 0.0, 0.0, 0.0,
    )


def test_mildly_negative_buffer_shrinks():
    """A negative buffer that does not invert shrinks symmetrically."""
    out = tilemath.buffered_mercator_extent(*GLOBAL, 4096, -10)
    exp = HALF - 10 * (2 * HALF / 4096)
    assert np.allclose(out, (-exp, -exp, exp, exp))


def test_zero_buffer_identity():
    assert tilemath.buffered_mercator_extent(*GLOBAL, 4096, 0) == GLOBAL


def test_buffered_extent_matches_px_box_scale():
    """The px-space clip box and the mercator buffered extent are the
    same box in two frames (layer.cpp scale relation)."""
    z, x, y = 13, 4528, 2728
    minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(x, y, z)
    buf = 256
    merc = tilemath.buffered_mercator_extent(
        float(minx), float(miny), float(maxx), float(maxy), 4096, buf
    )
    px = tilemath.buffered_tile_px_box(4096, buf)
    scale = (float(maxx) - float(minx)) / 4096.0
    assert np.isclose(merc[0], float(minx) + px[0] * scale)
    assert np.isclose(merc[2], float(minx) + px[2] * scale)
    assert np.isclose(merc[1], float(miny) + px[1] * scale)
    assert np.isclose(merc[3], float(miny) + px[3] * scale)
