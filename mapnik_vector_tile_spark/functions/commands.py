"""Vector-tile geometry command streams (K5/K6/K7/K8).

Encode: src/vector_tile_geometry_encoder_pbf.ipp — MoveTo(1)/LineTo(2)/
ClosePath(7), (len<<3)|cmd headers, zigzag int32 deltas, consecutive
repeated points skipped, ring closing dup dropped, degenerate parts
(line <2 pts after dedup, ring <3) rejected with per-part rollback.

Decode: src/vector_tile_geometry_decoder.ipp — stateful cursor with the
full v1-lenient / v2-strict error matrix, zero-delta LineTo skipping,
ring winding classification (first ring defines exterior orientation,
v2 rejects CW first ring), negative-scale ring reversal.

Everything is numpy-vectorizable per feature; zigzag/delta math is
array ops.
"""

from __future__ import annotations

import math

import numpy as np

MOVE_TO, LINE_TO, CLOSE = 1, 2, 7
POINT, LINESTRING, POLYGON = 1, 2, 3


def zigzag32(d: np.ndarray) -> np.ndarray:
    d = np.asarray(d, dtype=np.int64).astype(np.int32)
    return ((d.astype(np.int64) << 1) ^ (d >> 31)).astype(np.uint32)


def unzigzag32(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=np.uint32)
    return ((u >> 1).astype(np.int32)) ^ (-(u & 1).astype(np.int32))


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

def _zz32(d: int) -> int:
    """Exact int32-wrap zigzag for scalar paths."""
    d &= 0xFFFFFFFF
    if d >= 0x80000000:
        d -= 0x100000000
    return ((d << 1) ^ (d >> 31)) & 0xFFFFFFFF


def _emit_path(pts: np.ndarray, cursor: list[int], out: list[int], is_ring: bool) -> bool:
    """encode_linestring / encode_linearring
    (vector_tile_geometry_encoder_pbf.ipp:73-179)."""
    pts = np.asarray(pts, dtype=np.int64)
    n = len(pts)
    if n <= 12:  # fully-scalar small path: tiny tile features dominate
        rows = pts.tolist()
        kx, ky = [], []
        for x, y in rows:
            if not kx or x != kx[-1] or y != ky[-1]:
                kx.append(x)
                ky.append(y)
        if is_ring and len(kx) > 1 and kx[0] == kx[-1] and ky[0] == ky[-1]:
            kx.pop()
            ky.pop()
        if (is_ring and len(kx) < 3) or (not is_ring and len(kx) < 2) or not kx:
            return False
        out.append(9)  # MoveTo | 1<<3
        out.append(_zz32(kx[0] - cursor[0]))
        out.append(_zz32(ky[0] - cursor[1]))
        out.append(((len(kx) - 1) << 3) | LINE_TO)
        for i in range(1, len(kx)):
            out.append(_zz32(kx[i] - kx[i - 1]))
            out.append(_zz32(ky[i] - ky[i - 1]))
        if is_ring:
            out.append(15)  # ClosePath | 1<<3
        cursor[0], cursor[1] = kx[-1], ky[-1]
        return True
    # One canonicalization shared with the scalar path above: dedup
    # consecutive points FIRST, then strip a closing point equal to the
    # start. (The reference's encode_linearring declares line_to_length
    # from size-minus-repeats but can still emit an extra pair when the
    # closing vertex is doubled — a header/payload mismatch we do not
    # reproduce; we compare at decoded-semantic level.)
    keep = np.ones(n, dtype=bool)
    keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
    b = pts[keep]
    if is_ring and len(b) > 1 and b[0, 0] == b[-1, 0] and b[0, 1] == b[-1, 1]:
        b = b[:-1]
    if (is_ring and len(b) < 3) or (not is_ring and len(b) < 2):
        return False
    line_to_len = len(b) - 1
    d0 = b[0] - np.asarray(cursor, dtype=np.int64)
    zz = zigzag32(np.concatenate([d0[None, :], np.diff(b, axis=0)], axis=0))
    out.append(9)  # MoveTo | 1<<3
    out.append(int(zz[0, 0]))
    out.append(int(zz[0, 1]))
    out.append((line_to_len << 3) | LINE_TO)
    out.extend(zz[1:].reshape(-1).tolist())
    if is_ring:
        out.append(15)  # ClosePath | 1<<3
    cursor[0], cursor[1] = int(b[-1, 0]), int(b[-1, 1])
    return True


def encode_geometry(geom, cursor: list[int] | None = None):
    """-> (geom_type, [uint32 commands]) or (None, []) on failure.

    cursor carries (start_x, start_y) across features of a layer, like
    the encoder's int32& start_x/start_y threading."""
    if cursor is None:
        cursor = [0, 0]
    kind, val = geom
    out: list[int] = []
    if kind == "empty":
        return None, []
    if kind == "geometrycollection":
        # parity with encoder_visitor (vector_tile_geometry_encoder_pbf.ipp:62-65)
        raise ValueError(
            "Geometry collections can not be encoded as they may contain "
            "different geometry types"
        )
    if kind == "point":
        pts = np.asarray(val, dtype=np.int64).reshape(1, 2)
        out.append(9)
        out.append(int(zigzag32(np.array(pts[0, 0] - cursor[0]))))
        out.append(int(zigzag32(np.array(pts[0, 1] - cursor[1]))))
        cursor[0], cursor[1] = int(pts[0, 0]), int(pts[0, 1])
        return POINT, out
    if kind == "multipoint":
        pts = np.asarray(val, dtype=np.int64)
        if len(pts) == 0:
            return None, []
        out.append((len(pts) << 3) | MOVE_TO)
        seq = np.concatenate([np.asarray(cursor, dtype=np.int64)[None, :], pts], axis=0)
        out.extend(zigzag32(np.diff(seq, axis=0)).reshape(-1).tolist())
        cursor[0], cursor[1] = int(pts[-1, 0]), int(pts[-1, 1])
        return POINT, out
    if kind == "linestring":
        ok = _emit_path(val, cursor, out, is_ring=False)
        return (LINESTRING, out) if ok else (None, [])
    if kind == "multilinestring":
        any_ok = False
        for line in val:
            saved = list(out)
            saved_cur = list(cursor)
            if _emit_path(line, cursor, out, is_ring=False):
                any_ok = True
            else:  # rollback (geometry_feature.hpp:46-68 analogue)
                out[:] = saved
                cursor[0], cursor[1] = saved_cur
        return (LINESTRING, out) if any_ok else (None, [])
    if kind == "polygon":
        # first ring must encode, others best-effort (encoder_pbf.ipp:156-179)
        if not val:
            return None, []
        if not _emit_path(val[0], cursor, out, is_ring=True):
            return None, []
        for ring in val[1:]:
            saved = list(out)
            saved_cur = list(cursor)
            if not _emit_path(ring, cursor, out, is_ring=True):
                out[:] = saved
                cursor[0], cursor[1] = saved_cur
        return POLYGON, out
    if kind == "multipolygon":
        any_ok = False
        for poly in val:
            if not poly:
                continue
            saved = list(out)
            saved_cur = list(cursor)
            if _emit_path(poly[0], cursor, out, is_ring=True):
                any_ok = True
                for ring in poly[1:]:
                    saved2 = list(out)
                    saved_cur2 = list(cursor)
                    if not _emit_path(ring, cursor, out, is_ring=True):
                        out[:] = saved2
                        cursor[0], cursor[1] = saved_cur2
            else:
                out[:] = saved
                cursor[0], cursor[1] = saved_cur
        return (POLYGON, out) if any_ok else (None, [])
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# Decode — cursor (GeometryPBF, decoder.ipp:570-788)
# ---------------------------------------------------------------------------

class DecodeError(RuntimeError):
    pass


class _Cursor:
    __slots__ = ("g", "i", "n", "x", "y", "ox", "oy", "length", "cmd")

    def __init__(self, commands):
        self.g = [int(c) & 0xFFFFFFFF for c in commands]
        self.i = 0
        self.n = len(self.g)
        self.x = self.y = self.ox = self.oy = 0
        self.length = 0
        self.cmd = MOVE_TO

    def _take_delta(self):
        if self.i + 1 >= self.n + 1 and self.i >= self.n:
            raise DecodeError("end of buffer exception")
        try:
            dx = int(unzigzag32(np.uint32(self.g[self.i])))
            dy = int(unzigzag32(np.uint32(self.g[self.i + 1])))
        except IndexError as exc:
            raise DecodeError("end of buffer exception") from exc
        self.i += 2
        return dx, dy

    def point_next(self):
        if self.length == 0:
            if self.i < self.n:
                cl = self.g[self.i]
                self.i += 1
                self.cmd = cl & 0x7
                self.length = cl >> 3
                if self.cmd == MOVE_TO:
                    if self.length == 0:
                        raise DecodeError(
                            "POINT geometry with a MOVETO command count of zero"
                        )
                elif self.cmd == LINE_TO:
                    raise DecodeError("POINT geometry with a LINETO command")
                elif self.cmd == CLOSE:
                    raise DecodeError("POINT geometry with a CLOSE command")
                else:
                    raise DecodeError("POINT geometry with an unknown command")
            else:
                return "end", 0, 0
        self.length -= 1
        dx, dy = self._take_delta()
        self.x += dx
        self.y += dy
        return "move_to", self.x, self.y

    def line_next(self, skip_zero):
        if self.length == 0:
            if self.i < self.n:
                cl = self.g[self.i]
                self.i += 1
                self.cmd = cl & 0x7
                self.length = cl >> 3
                if self.cmd == MOVE_TO:
                    if self.length != 1:
                        raise DecodeError("LINESTRING MOVETO with bad parameter count")
                    self.length -= 1
                    dx, dy = self._take_delta()
                    self.x += dx
                    self.y += dy
                    return "move_to", self.x, self.y
                elif self.cmd == LINE_TO:
                    if self.length == 0:
                        raise DecodeError("LINETO with no parameters")
                elif self.cmd == CLOSE:
                    raise DecodeError("LINESTRING geometry with a CLOSE command")
                else:
                    raise DecodeError("LINESTRING geometry with an unknown command")
            else:
                return "end", 0, 0
        self.length -= 1
        dx, dy = self._take_delta()
        if skip_zero and dx == 0 and dy == 0:
            return self.line_next(True)
        self.x += dx
        self.y += dy
        return "line_to", self.x, self.y

    def ring_next(self, skip_zero):
        if self.length == 0:
            if self.i < self.n:
                cl = self.g[self.i]
                self.i += 1
                self.cmd = cl & 0x7
                self.length = cl >> 3
                if self.cmd == MOVE_TO:
                    if self.length != 1:
                        raise DecodeError("POLYGON MOVETO with bad parameter count")
                    self.length -= 1
                    dx, dy = self._take_delta()
                    self.x += dx
                    self.y += dy
                    self.ox, self.oy = self.x, self.y
                    return "move_to", self.x, self.y
                elif self.cmd == LINE_TO:
                    if self.length == 0:
                        raise DecodeError("LINETO with no parameters")
                elif self.cmd == CLOSE:
                    self.length = 0
                    return "close", self.ox, self.oy
                else:
                    raise DecodeError("POLYGON geometry with an unknown command")
            else:
                return "end", 0, 0
        self.length -= 1
        dx, dy = self._take_delta()
        if skip_zero and dx == 0 and dy == 0:
            return self.ring_next(True)
        self.x += dx
        self.y += dy
        return "line_to", self.x, self.y


def _scale_pt(x, y, tile_x, tile_y, scale_x, scale_y):
    return tile_x + x / scale_x, tile_y + y / scale_y


_scale_pt_active = None  # set per decode_geometry call


def _scale_pt_int(x, y, tile_x, tile_y, scale_x, scale_y):
    """int64 decode specialization (decoder.ipp:49-56): per-coordinate
    std::round of val/scale, added to the integer tile origin."""
    def r(v):
        return math.floor(abs(v) + 0.5) * (1 if v >= 0 else -1)

    return tile_x + r(x / scale_x), tile_y + r(y / scale_y)


# decode assembly (decoder.ipp:74-566)

def decode_geometry(
    commands,
    geom_type: int,
    version: int = 2,
    tile_x: float = 0.0,
    tile_y: float = 0.0,
    scale_x: float = 1.0,
    scale_y: float = 1.0,
    bbox=None,
    value_type: str = "double",
):
    """-> geometry in decoded space (("kind", arrays)); raises DecodeError
    per the v1/v2 matrix. bbox (minx,miny,maxx,maxy) filters parts like
    the decoder's part-level envelope check. value_type="int64" applies
    the integer decode rounding (get_point_value<int64>, decoder.ipp:49-56)."""
    global _scale_pt_active
    _scale_pt_active = _scale_pt_int if value_type == "int64" else _scale_pt
    cur = _Cursor(commands)
    if geom_type == POINT:
        return _decode_point(cur, tile_x, tile_y, scale_x, scale_y, bbox)
    if geom_type == LINESTRING:
        return _decode_linestring(cur, tile_x, tile_y, scale_x, scale_y, bbox, version)
    if geom_type == POLYGON:
        return _decode_polygon(cur, tile_x, tile_y, scale_x, scale_y, bbox, version)
    return ("empty", None)  # UNKNOWN ignored (decoder.ipp:826-833)


def _bbox_pt(bbox, x, y):
    return bbox is None or (bbox[0] <= x <= bbox[2] and bbox[1] <= y <= bbox[3])


def _bbox_env(bbox, env):
    if bbox is None:
        return True
    return not (env[2] < bbox[0] or env[0] > bbox[2] or env[3] < bbox[1] or env[1] > bbox[3])


def _decode_point(cur, tx, ty, sx, sy, bbox):
    pts = []
    while True:
        cmd, x, y = cur.point_next()
        if cmd == "end":
            break
        px, py = _scale_pt_active(x, y, tx, ty, sx, sy)
        if _bbox_pt(bbox, px, py):
            pts.append((px, py))
    if not pts:
        return ("empty", None)
    arr = np.array(pts, dtype=np.float64)
    return ("point", arr[0]) if len(arr) == 1 else ("multipoint", arr)


def _decode_linestring(cur, tx, ty, sx, sy, bbox, version):
    lines = []
    cmd, x0, y0 = cur.line_next(False)
    if cmd == "end":
        return ("empty", None)
    if cmd != "move_to":
        raise DecodeError("LINESTRING first command not MOVETO")
    while True:
        cmd, x1, y1 = cur.line_next(True)
        if cmd != "line_to":
            if cmd == "move_to":
                if version == 1:
                    x0, y0 = x1, y1
                    continue
                raise DecodeError("LINESTRING with repeated MOVETO")
            else:  # end
                if version == 1:
                    break
                raise DecodeError("LINESTRING MOVETO with no LINETO following")
        line = [_scale_pt_active(x0, y0, tx, ty, sx, sy), _scale_pt_active(x1, y1, tx, ty, sx, sy)]
        while True:
            cmd, x1, y1 = cur.line_next(True)
            if cmd != "line_to":
                break
            line.append(_scale_pt_active(x1, y1, tx, ty, sx, sy))
        arr = np.array(line, dtype=np.float64)
        env = (arr[:, 0].min(), arr[:, 1].min(), arr[:, 0].max(), arr[:, 1].max())
        if _bbox_env(bbox, env):
            lines.append(arr)
        if cmd == "end":
            break
        x0, y0 = x1, y1
    if not lines:
        return ("empty", None)
    if len(lines) == 1:
        return ("linestring", lines[0]) if len(lines[0]) > 1 else ("empty", None)
    return ("multilinestring", lines)


def _seg_area(x0, y0, x1, y1):
    return float(x0) * float(y1) - float(y0) * float(x1)


def _decode_polygon(cur, tx, ty, sx, sy, bbox, version):
    rings: list[np.ndarray] = []
    rings_exterior: list[bool] = []
    first_ring = True
    first_ring_is_clockwise = False
    last_exterior_not_included = False

    cmd, x0, y0 = cur.ring_next(False)
    if cmd == "end":
        return ("empty", None)
    if cmd != "move_to":
        raise DecodeError("POLYGON first command not MOVETO")

    while True:
        ring_area_acc = 0.0
        cmd, x1, y1 = cur.ring_next(True)
        if cmd != "line_to":
            if cmd == "close" and version == 1:
                cmd, x0, y0 = cur.ring_next(False)
                if cmd == "end":
                    break
                if cmd == "move_to":
                    continue
                if cmd == "close":
                    raise DecodeError("POLYGON CLOSE followed by CLOSE")
                raise DecodeError("POLYGON CLOSE followed by LINETO")
            raise DecodeError("POLYGON MOVETO without two LINETOs and CLOSE")
        cmd, x2, y2 = cur.ring_next(True)
        if cmd != "line_to":
            if cmd == "close" and version == 1:
                cmd, x0, y0 = cur.ring_next(False)
                if cmd == "end":
                    break
                if cmd == "move_to":
                    continue
                if cmd == "close":
                    raise DecodeError("POLYGON CLOSE followed by CLOSE")
                raise DecodeError("POLYGON CLOSE followed by LINETO")
            raise DecodeError("POLYGON MOVETO without two LINETOs and CLOSE")

        ring = [
            _scale_pt_active(x0, y0, tx, ty, sx, sy),
            _scale_pt_active(x1, y1, tx, ty, sx, sy),
            _scale_pt_active(x2, y2, tx, ty, sx, sy),
        ]
        ring_area_acc += _seg_area(x0, y0, x1, y1)
        ring_area_acc += _seg_area(x1, y1, x2, y2)
        xp, yp = x2, y2
        while True:
            cmd, x2, y2 = cur.ring_next(True)
            if cmd != "line_to":
                break
            ring.append(_scale_pt_active(x2, y2, tx, ty, sx, sy))
            ring_area_acc += _seg_area(xp, yp, x2, y2)
            xp, yp = x2, y2
        if cmd != "close":
            raise DecodeError("POLYGON ring not closed by CLOSE")
        first_pt = _scale_pt_active(x0, y0, tx, ty, sx, sy)
        if ring[-1] != first_pt:
            ring.append(first_pt)
            ring_area_acc += _seg_area(xp, yp, x0, y0)
        arr = np.array(ring, dtype=np.float64)
        if len(arr) > 3:
            area_cw = ring_area_acc < 0.0
            if first_ring:
                first_ring_is_clockwise = area_cw
                if version != 1 and first_ring_is_clockwise:
                    raise DecodeError("POLYGON first ring clockwise (invalid in v2)")
                first_ring = False
            is_exterior = first_ring_is_clockwise == area_cw
            env = (arr[:, 0].min(), arr[:, 1].min(), arr[:, 0].max(), arr[:, 1].max())
            if (not is_exterior and last_exterior_not_included) or not _bbox_env(bbox, env):
                if is_exterior:
                    last_exterior_not_included = True
            else:
                if is_exterior:
                    last_exterior_not_included = False
                rings.append(arr)
                rings_exterior.append(is_exterior)
        cmd, x0, y0 = cur.ring_next(False)
        if cmd == "end":
            break
        if cmd != "move_to":
            if cmd == "close":
                raise DecodeError("POLYGON CLOSE followed by CLOSE")
            raise DecodeError("POLYGON CLOSE followed by LINETO")

    if not rings:
        return ("empty", None)
    reverse_rings = ((sx * sy) < 0) != first_ring_is_clockwise
    polys: list[list[np.ndarray]] = []
    for ring, is_ext in zip(rings, rings_exterior):
        r = ring[::-1].copy() if reverse_rings else ring
        if is_ext:
            polys.append([r])
        elif polys:
            polys[-1].append(r)
    if len(polys) == 1:
        return ("polygon", polys[0])
    return ("multipolygon", polys)
