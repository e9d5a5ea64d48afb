"""Reference ENCODING unit corpus, scraped and replayed at test time
(test/unit/encoding/{point,linestring,polygon}_pbf.cpp — 29 cases).

Sibling of test_decode_corpus_port.py: a tiny statement interpreter
rebuilds each case's mapbox geometry (emplace_back/push_back flow), runs
this engine's command-stream encoder (functions.commands.encode_geometry
— the twin of encode_geometry_pbf,
src/vector_tile_geometry_encoder_pbf.ipp:183-318), and checks the exact
geometry words, geometry_size and the culled-feature (REQUIRE_FALSE)
outcomes the reference pins. Skip-if-absent like the other ports;
unrecognized constructs skip their case (counted by the coverage
floor)."""

from __future__ import annotations

import os
import re

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions import commands as Cmd

REF = "/root/reference/test/unit/encoding"

_GTYPE = {"POINT": 1, "LINESTRING": 2, "POLYGON": 3}

_DECL = re.compile(
    r"mapbox::geometry::(point|multi_point|line_string|multi_line_string|"
    r"linear_ring|polygon|multi_polygon|geometry)<[^>]+>\s+(\w+)\s*(?:\(([^)]*)\))?\s*;"
)
_APPEND_PT = re.compile(
    r"(\w+)\.(?:emplace_back|push_back)\(\s*(-?\d+|\w+)\s*,\s*(-?\d+|\w+)\s*\)\s*;"
)
# int constant decls, incl. the numeric_limits flow of the
# 'incredibly large segments' case (linestring_pbf.cpp:205-238)
_CONST = re.compile(
    r"(?:std::)?u?int\d+_t\s+(\w+)\s*=\s*"
    r"(?:std::numeric_limits<[^>]+>::(max|min)\(\)|(-?\d+))\s*;"
)
_APPEND_OBJ = re.compile(
    r"(\w+)\.(?:emplace_back|push_back)\(\s*(?:std::move\()?\s*(\w+)\s*\)?\s*\)\s*;"
)
_ENCODE = re.compile(
    r"(REQUIRE|REQUIRE_FALSE|CHECK)\(\s*mapnik::vector_tile_impl::encode_geometry_pbf\(\s*(\w+)\s*,"
)
_TYPE = re.compile(r"feature\.type\(\)\s*==\s*vector_tile::Tile_GeomType_(\w+)")
_GSIZE = re.compile(r"feature\.geometry_size\(\)\s*==\s*(\d+)")
_GWORD = re.compile(r"feature\.geometry\((\d+)\)\s*==\s*([^;]+)\)\s*;")


def _parse_word(expr: str):
    expr = expr.strip().rstrip(")").strip()
    m = re.fullmatch(r"(\d+)u?", expr)
    if m:
        return int(m.group(1))
    m = re.fullmatch(r"\(\((\d+)\s*<<\s*3u?\)\s*\|\s*(\d+)u?\)?", expr)
    if m:
        return (int(m.group(1)) << 3) | int(m.group(2))
    m = re.fullmatch(r"protozero::encode_zigzag32\((-?\d+)\)", expr)
    if m:
        v = int(m.group(1))
        return ((v << 1) ^ (v >> 63)) & 0xFFFFFFFF if v >= 0 else ((-v) << 1) - 1
    return None


def _parse_cases(path: str):
    src = open(path).read()
    cases, skipped = [], []
    for m in re.finditer(r'TEST_CASE\("([^"]+)"\)\s*\{(.*?)\n\}', src, re.S):
        name, body = m.group(1), m.group(2)
        objs: dict[str, tuple] = {}
        consts: dict[str, int] = {}
        ok = True
        enc_var = expect_ok = None

        def _num(tok: str):
            if tok.lstrip("-").isdigit():
                return int(tok)
            return consts.get(tok)

        for line in body.splitlines():
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            cm = _CONST.match(line)
            if cm:
                var, lim, lit = cm.group(1), cm.group(2), cm.group(3)
                if lit is not None:
                    consts[var] = int(lit)
                else:
                    # the corpus only uses int64 limits; the encoder's
                    # int32-zigzag wrap is what the case pins
                    consts[var] = 2**63 - 1 if lim == "max" else -(2**63)
                continue
            dm = _DECL.match(line)
            if dm:
                typ, var, args = dm.group(1), dm.group(2), dm.group(3)
                if typ == "geometry":
                    # variant wrapper: alias its construction argument
                    if args and args.strip() in objs:
                        objs[var] = objs[args.strip()]
                    else:
                        ok = False
                        break
                elif typ == "point":
                    if args:
                        am = re.fullmatch(r"\s*(-?\d+)\s*,\s*(-?\d+)\s*", args)
                        if not am:
                            ok = False
                            break
                        objs[var] = ("point", (int(am.group(1)), int(am.group(2))))
                    else:
                        objs[var] = ("point", None)
                else:
                    objs[var] = (typ, [])
                continue
            pm = _APPEND_PT.match(line)
            if pm and pm.group(1) in objs:
                px, py = _num(pm.group(2)), _num(pm.group(3))
                if px is None or py is None:
                    ok = False
                    break
                objs[pm.group(1)][1].append((px, py))
                continue
            om = _APPEND_OBJ.match(line)
            if om and om.group(1) in objs and om.group(2) in objs:
                kind, val = objs[om.group(2)]
                objs[om.group(1)][1].append(
                    (kind, [list(v) if isinstance(v, tuple) else v for v in val]
                     if isinstance(val, list) else val)
                )
                continue
            em = _ENCODE.search(line)
            if em:
                enc_var = em.group(2)
                expect_ok = em.group(1) != "REQUIRE_FALSE"
                continue
            if ("emplace_back" in line or "push_back" in line) and not line.startswith("feature"):
                ok = False  # unrecognized construction (e.g. numeric_limits args)
                break
        if not ok or enc_var is None or enc_var not in objs:
            skipped.append(name)
            continue
        tm = _TYPE.search(body)
        gm = _GSIZE.search(body)
        words = {}
        bad_word = False
        for wm in _GWORD.finditer(body):
            v = _parse_word(wm.group(2))
            if v is None:
                bad_word = True
                break
            words[int(wm.group(1))] = v
        if bad_word:
            skipped.append(name)
            continue
        cases.append((
            name, objs[enc_var], expect_ok,
            tm.group(1) if tm else None,
            int(gm.group(1)) if gm else None,
            words,
        ))
    return cases, skipped


def _to_tuple(obj):
    """Interpreter object -> this engine's geometry tuple."""
    kind, val = obj
    if kind == "point":
        return ("point", np.asarray(val, dtype=np.int64))
    if kind == "multi_point":
        return ("multipoint", np.asarray(val, dtype=np.int64).reshape(-1, 2))
    if kind == "line_string":
        return ("linestring", np.asarray(val, dtype=np.int64).reshape(-1, 2))
    if kind == "linear_ring":
        return ("linestring", np.asarray(val, dtype=np.int64).reshape(-1, 2))
    if kind == "multi_line_string":
        return ("multilinestring",
                [np.asarray(v, dtype=np.int64).reshape(-1, 2) for _k, v in val])
    if kind == "polygon":
        return ("polygon",
                [np.asarray(v, dtype=np.int64).reshape(-1, 2) for _k, v in val])
    if kind == "multi_polygon":
        return ("multipolygon",
                [[np.asarray(r, dtype=np.int64).reshape(-1, 2) for _k2, r in rings]
                 for _k, rings in val])
    raise ValueError(kind)


def _load_all():
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not mounted")
    out = []
    for fname, min_cases in (("point_pbf.cpp", 7), ("linestring_pbf.cpp", 11),
                             ("polygon_pbf.cpp", 11)):
        cases, skipped = _parse_cases(os.path.join(REF, fname))
        assert len(cases) >= min_cases, (fname, len(cases), skipped)
        out.extend((fname, *c) for c in cases)
    return out


_ALL = _load_all() if os.path.isdir(REF) else []


@pytest.mark.parametrize("fname,name,obj,expect_ok,gt_name,gsize,words", _ALL,
                         ids=[f"{c[0]}:{c[1]}" for c in _ALL])
def test_reference_encode_corpus(fname, name, obj, expect_ok, gt_name, gsize, words):
    geom = _to_tuple(obj)
    gtype, cmds = Cmd.encode_geometry(geom)
    if not expect_ok:
        # reference rolls the feature back (vector_tile_geometry_feature.hpp:46-68)
        assert gtype is None or len(cmds) == 0, (name, gtype, cmds)
        return
    assert gtype is not None, name
    if gt_name in _GTYPE:
        assert gtype == _GTYPE[gt_name], (name, gtype)
    if gsize is not None:
        assert len(cmds) == gsize, (name, len(cmds), gsize, cmds)
    for i, want in words.items():
        assert cmds[i] == want, (name, i, cmds[i], want)


def test_encode_corpus_coverage():
    if not _ALL:
        pytest.skip("reference checkout not mounted")
    # 29 TEST_CASEs in the three geometry files, ALL scraped (r6: the
    # 'incredibly large segments' numeric_limits flow now parses; it is
    # also hand-ported in test_geometry_roundtrip.py)
    assert len(_ALL) >= 29
    assert any(not c[3] for c in _ALL)  # REQUIRE_FALSE cases present
