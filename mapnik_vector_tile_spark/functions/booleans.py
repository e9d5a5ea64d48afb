"""Polygon fill-rule resolution (U1/U2 — the role of Wagyu's union,
src/vector_tile_geometry_clipper.hpp:47-63,226-231).

Given a batch of closed rings (already box-clipped, int64 tile space)
and a fill rule (even_odd / non_zero / positive / negative), produce
the resolved polygon set:

  1. split every segment at its intersections with every other segment
     (snap-rounded to the integer grid, like Wagyu);
  2. classify each resulting edge by the fill-rule state of the region
     on each side (winding / crossing counts of a point slightly off
     the edge midpoint, measured against the ORIGINAL rings);
  3. keep edges whose sides differ (boundary of the filled set),
     oriented so the filled region lies to the LEFT;
  4. walk faces (most-clockwise-turn successor) to reassemble rings;
     ring orientation then distinguishes exteriors (CCW, positive
     area) from holes.

Cost is O(E^2) in segments — intended for the post-clip per-feature
scale (tile-space rings are small); the clipper gates it behind a
vertex budget and falls back to the winding-normalization fast path.
"""

from __future__ import annotations

import numpy as np


def _segments(rings: list[np.ndarray]):
    segs = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) >= 2 and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[0]])
        for i in range(len(r) - 1):
            a, b = r[i], r[i + 1]
            if not np.array_equal(a, b):
                segs.append((a.copy(), b.copy()))
    return segs


def _seg_intersections(a0, a1, b0, b1):
    """Proper + endpoint intersections of two segments -> list of t in
    (0,1) for segment A (param positions where A must split)."""
    r = a1 - a0
    s = b1 - b0
    denom = r[0] * s[1] - r[1] * s[0]
    ts = []
    if denom != 0.0:
        q = b0 - a0
        t = (q[0] * s[1] - q[1] * s[0]) / denom
        u = (q[0] * r[1] - q[1] * r[0]) / denom
        if 0.0 < t < 1.0 and 0.0 <= u <= 1.0:
            ts.append(t)
    else:
        # collinear overlap: split at the other segment's endpoints
        cross = (b0 - a0)[0] * r[1] - (b0 - a0)[1] * r[0]
        if cross == 0.0:
            rr = float(r @ r)
            if rr > 0:
                for p in (b0, b1):
                    t = float((p - a0) @ r) / rr
                    if 0.0 < t < 1.0:
                        ts.append(t)
    return ts


def _winding_and_crossings(pt, rings):
    """(winding number, crossing count) of pt w.r.t. rings (ray to +x)."""
    wn = 0
    cross = 0
    px, py = float(pt[0]), float(pt[1])
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) >= 2 and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[0]])
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        upward = (y0 <= py) & (y1 > py)
        downward = (y0 > py) & (y1 <= py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
        hit = xint > px
        wn += int(np.sum(upward & hit)) - int(np.sum(downward & hit))
        cross += int(np.sum((upward | downward) & hit))
    return wn, cross


def _filled(wn: int, cross: int, fill_type: str) -> bool:
    if fill_type == "even_odd":
        return cross % 2 == 1
    if fill_type == "non_zero":
        return wn != 0
    if fill_type == "positive":
        return wn > 0
    if fill_type == "negative":
        return wn < 0
    raise ValueError(fill_type)


def resolve_fill(rings: list[np.ndarray], fill_type: str = "even_odd"):
    """-> list of polygons, each [exterior CCW(+area), holes CW...] in
    int64 coords; [] if nothing is filled."""
    segs = _segments(rings)
    if not segs:
        return []
    # 1. split at intersections
    pieces = []
    for i, (a0, a1) in enumerate(segs):
        ts = [0.0, 1.0]
        for j, (b0, b1) in enumerate(segs):
            if i == j:
                continue
            ts.extend(_seg_intersections(a0, a1, b0, b1))
        ts = sorted(set(ts))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            p = a0 + t0 * (a1 - a0)
            q = a0 + t1 * (a1 - a0)
            pi = np.rint(p).astype(np.int64)
            qi = np.rint(q).astype(np.int64)
            if not np.array_equal(pi, qi):
                pieces.append((pi, qi))

    # dedupe identical undirected pieces (overlapping collinear edges
    # collapse; their sidedness is evaluated against the original rings)
    seen = set()
    uniq = []
    for p, q in pieces:
        key = (tuple(p), tuple(q)) if tuple(p) <= tuple(q) else (tuple(q), tuple(p))
        if key in seen:
            continue
        seen.add(key)
        uniq.append((p.astype(np.float64), q.astype(np.float64)))

    # 2./3. boundary edges, filled side on the left
    boundary = []
    for p, q in uniq:
        mid = (p + q) / 2.0
        d = q - p
        ln = float(np.hypot(d[0], d[1]))
        if ln == 0.0:
            continue
        nrm = np.array([-d[1], d[0]]) / ln  # left normal
        eps = 0.25
        left = mid + nrm * eps
        right = mid - nrm * eps
        fl = _filled(*_winding_and_crossings(left, rings), fill_type)
        fr = _filled(*_winding_and_crossings(right, rings), fill_type)
        if fl == fr:
            continue
        if fl:
            boundary.append((tuple(np.rint(p).astype(np.int64)), tuple(np.rint(q).astype(np.int64))))
        else:
            boundary.append((tuple(np.rint(q).astype(np.int64)), tuple(np.rint(p).astype(np.int64))))

    if not boundary:
        return []

    # 4. face walk: at each head vertex choose the most clockwise
    # outgoing edge relative to the incoming direction (keeps the filled
    # region, which is on the left, maximally enclosed)
    out_edges: dict[tuple, list[tuple]] = {}
    for a, b in boundary:
        out_edges.setdefault(a, []).append(b)
    unused = set(boundary)
    rings_out: list[np.ndarray] = []
    import math

    while unused:
        start = next(iter(unused))
        path = [start[0], start[1]]
        unused.discard(start)
        cur = start
        while True:
            a, b = cur
            in_dir = math.atan2(b[1] - a[1], b[0] - a[0])
            best = None
            best_turn = None
            for c in out_edges.get(b, ()):  # candidate successors
                if (b, c) not in unused and (b, c) != start:
                    continue
                out_dir = math.atan2(c[1] - b[1], c[0] - b[0])
                # turn angle in (-pi, pi], measured CCW from incoming
                turn = (out_dir - in_dir + math.pi) % (2 * math.pi) - math.pi
                if turn == -math.pi:  # exclude pure reversal
                    continue
                # most counterclockwise turn hugs the left (filled) face
                if best_turn is None or turn > best_turn:
                    best_turn = turn
                    best = c
            if best is None:
                break
            nxt = (b, best)
            if nxt == start:
                break
            unused.discard(nxt)
            path.append(best)
            cur = nxt
        if len(path) >= 4 and path[0] == path[-1]:
            rings_out.append(np.array(path, dtype=np.int64))
        elif len(path) >= 3 and path[0] != path[-1]:
            # open walk that returned to start implicitly
            if path[0] == path[-1]:
                rings_out.append(np.array(path, dtype=np.int64))

    # orientation classifies exterior/hole; holes attach to the first
    # exterior that contains them
    from mapnik_vector_tile_spark.functions.geometry import ring_area

    exteriors = []
    holes = []
    for r in rings_out:
        (exteriors if ring_area(r) > 0 else holes).append(r)
    polys = [[e] for e in exteriors]
    for h in holes:
        mid = h[0].astype(np.float64) + 0.3  # a point just off a vertex
        placed = False
        for poly in polys:
            wn, cross = _winding_and_crossings(mid, [poly[0]])
            if cross % 2 == 1:
                poly.append(h)
                placed = True
                break
        if not placed and polys:
            polys[0].append(h)
    return polys
