"""Minimal protobuf wire format + the vector_tile.proto message layer.

Hand-rolled varint/field writer-reader (protozero's role) — enough to
emit and parse Tile/Layer/Feature/Value messages exactly as
proto/vector_tile.proto defines them:

    Tile:    layers = 3 (len-delimited)
    Layer:   version=15 (varint, required), name=1 (string),
             features=2 (msg), keys=3 (string), values=4 (msg),
             extent=5 (varint, default 4096)
    Feature: id=1 (varint), tags=2 (packed u32), type=3 (enum),
             geometry=4 (packed u32), raster=5 (bytes)
    Value:   one of string=1 float=2 double=3 int=4 uint=5 sint=6 bool=7

Value encoding rules are the reference's (src/vector_tile_layer.ipp:23-66):
int -> INT, bool -> BOOL, double -> FLOAT iff losslessly narrowable else
DOUBLE, str -> STRING, None -> dropped. Dictionary identity is
type-qualified (src/vector_tile_layer.hpp:54-69): int 1 != bool True.
"""

from __future__ import annotations

import struct

import numpy as np

WT_VARINT, WT_I64, WT_LEN, WT_I32 = 0, 1, 2, 5


# --- varint ------------------------------------------------------------------

def write_varint(buf: bytearray, v: int) -> None:
    v &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def pack_varints(values) -> bytes:
    """Vectorized-ish packed varint encoding for uint32 arrays."""
    arr = np.asarray(values, dtype=np.uint64)
    buf = bytearray()
    for v in arr:
        write_varint(buf, int(v))
    return bytes(buf)


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


# --- field writers -----------------------------------------------------------

def tag(field: int, wire: int) -> int:
    return (field << 3) | wire


def add_varint_field(buf: bytearray, field: int, v: int) -> None:
    write_varint(buf, tag(field, WT_VARINT))
    write_varint(buf, v)


def add_len_field(buf: bytearray, field: int, payload: bytes) -> None:
    write_varint(buf, tag(field, WT_LEN))
    write_varint(buf, len(payload))
    buf.extend(payload)


def add_float_field(buf: bytearray, field: int, v: float) -> None:
    write_varint(buf, tag(field, WT_I32))
    buf.extend(struct.pack("<f", v))


def add_double_field(buf: bytearray, field: int, v: float) -> None:
    write_varint(buf, tag(field, WT_I64))
    buf.extend(struct.pack("<d", v))


# --- Value variant (K9) --------------------------------------------------------

def encode_value(v) -> bytes:
    """to_tile_value_pbf (vector_tile_layer.ipp:23-66)."""
    buf = bytearray()
    if isinstance(v, bool):  # check before int: bool is int in Python
        add_varint_field(buf, 7, 1 if v else 0)
    elif isinstance(v, (int, np.integer)):
        # mapnik value_integer -> INT (sint64 field uses zigzag? no:
        # Value.int_value field 4 is int64 (plain varint, two's complement)
        write_varint(buf, tag(4, WT_VARINT))
        write_varint(buf, int(v))
    elif isinstance(v, (float, np.floating)):
        fv = struct.unpack("<f", struct.pack("<f", float(v)))[0]
        if fv == float(v):
            add_float_field(buf, 2, float(v))
        else:
            add_double_field(buf, 3, float(v))
    elif isinstance(v, str):
        add_len_field(buf, 1, v.encode("utf-8"))
    elif v is None:
        pass  # nulls dropped (vector_tile_layer.ipp:90-91)
    else:
        raise TypeError(f"unsupported property type {type(v)}")
    return bytes(buf)


def value_type_tag(v) -> str:
    """Type-qualified dictionary identity (vector_tile_layer.hpp:36-69)."""
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        fv = struct.unpack("<f", struct.pack("<f", float(v)))[0]
        return "float" if fv == float(v) else "double"
    if isinstance(v, str):
        return "string"
    return "null"


def decode_value(data: bytes):
    pos = 0
    out = None
    while pos < len(data):
        t, pos = read_varint(data, pos)
        field, wire = t >> 3, t & 0x7
        if field == 1 and wire == WT_LEN:
            ln, pos = read_varint(data, pos)
            out = data[pos : pos + ln].decode("utf-8")
            pos += ln
        elif field == 2 and wire == WT_I32:
            out = float(struct.unpack_from("<f", data, pos)[0])
            pos += 4
        elif field == 3 and wire == WT_I64:
            out = float(struct.unpack_from("<d", data, pos)[0])
            pos += 8
        elif field in (4, 5) and wire == WT_VARINT:
            v, pos = read_varint(data, pos)
            if field == 4 and v >= 1 << 63:
                v -= 1 << 64  # int64 two's complement
            out = int(v)
        elif field == 6 and wire == WT_VARINT:
            v, pos = read_varint(data, pos)
            out = (v >> 1) ^ -(v & 1)  # sint64 zigzag
        elif field == 7 and wire == WT_VARINT:
            v, pos = read_varint(data, pos)
            out = bool(v)
        else:
            pos = skip_field(data, pos, wire)
    return out


def skip_field(data: bytes, pos: int, wire: int) -> int:
    if wire == WT_VARINT:
        _, pos = read_varint(data, pos)
    elif wire == WT_I64:
        pos += 8
    elif wire == WT_LEN:
        ln, pos = read_varint(data, pos)
        pos += ln
    elif wire == WT_I32:
        pos += 4
    else:
        raise ValueError(f"bad wire type {wire}")
    return pos


# --- Feature / Layer / Tile ----------------------------------------------------

def encode_feature(
    feature_id: int | None,
    tags: list[int],
    geom_type: int,
    geometry: list[int],
    raster: bytes | None = None,
) -> bytes:
    buf = bytearray()
    if feature_id is not None:
        add_varint_field(buf, 1, int(feature_id))
    if tags:
        add_len_field(buf, 2, pack_varints(tags))
    if geom_type:
        add_varint_field(buf, 3, int(geom_type))
    if geometry:
        add_len_field(buf, 4, pack_varints(geometry))
    if raster is not None:
        add_len_field(buf, 5, raster)
    return bytes(buf)


def encode_layer(
    name: str,
    features: list[bytes],
    keys: list[str],
    values: list[bytes],
    extent: int = 4096,
    version: int = 2,
) -> bytes:
    """Field order mirrors the builder: keys/values interleave before
    features in the reference's buffer, but protobuf readers are
    order-independent; we write name, keys, values, features, extent,
    version (tile_impl tests read semantically)."""
    buf = bytearray()
    add_len_field(buf, 1, name.encode("utf-8"))
    for k in keys:
        add_len_field(buf, 3, k.encode("utf-8"))
    for v in values:
        add_len_field(buf, 4, v)
    for f in features:
        add_len_field(buf, 2, f)
    add_varint_field(buf, 5, extent)
    add_varint_field(buf, 15, version)
    return bytes(buf)


def encode_tile(layers: list[bytes]) -> bytes:
    buf = bytearray()
    for layer in layers:
        add_len_field(buf, 3, layer)
    return bytes(buf)


def decode_tile(data: bytes) -> list[bytes]:
    pos = 0
    layers = []
    while pos < len(data):
        t, pos = read_varint(data, pos)
        field, wire = t >> 3, t & 0x7
        if field == 3 and wire == WT_LEN:
            ln, pos = read_varint(data, pos)
            layers.append(data[pos : pos + ln])
            pos += ln
        else:
            pos = skip_field(data, pos, wire)
    return layers


def decode_layer(data: bytes) -> dict:
    """Single-pass layer parse (tile_datasource_pbf ctor semantics,
    src/vector_tile_datasource_pbf.ipp:35-170): name, version, extent,
    keys, values, raw feature messages."""
    pos = 0
    out = {"name": None, "version": 1, "extent": 4096, "keys": [], "values": [], "features": []}
    while pos < len(data):
        t, pos = read_varint(data, pos)
        field, wire = t >> 3, t & 0x7
        if field == 1 and wire == WT_LEN:
            ln, pos = read_varint(data, pos)
            out["name"] = data[pos : pos + ln].decode("utf-8")
            pos += ln
        elif field == 15 and wire == WT_VARINT:
            out["version"], pos = read_varint(data, pos)
        elif field == 5 and wire == WT_VARINT:
            out["extent"], pos = read_varint(data, pos)
        elif field == 3 and wire == WT_LEN:
            ln, pos = read_varint(data, pos)
            out["keys"].append(data[pos : pos + ln].decode("utf-8"))
            pos += ln
        elif field == 4 and wire == WT_LEN:
            ln, pos = read_varint(data, pos)
            out["values"].append(decode_value(data[pos : pos + ln]))
            pos += ln
        elif field == 2 and wire == WT_LEN:
            ln, pos = read_varint(data, pos)
            out["features"].append(data[pos : pos + ln])
            pos += ln
        else:
            pos = skip_field(data, pos, wire)
    if out["name"] is None:
        raise ValueError("layer missing required name (v2 check)")
    return out


def decode_feature(data: bytes) -> dict:
    pos = 0
    out = {"id": 0, "tags": [], "type": 0, "geometry": [], "raster": None}
    while pos < len(data):
        t, pos = read_varint(data, pos)
        field, wire = t >> 3, t & 0x7
        if field == 1 and wire == WT_VARINT:
            out["id"], pos = read_varint(data, pos)
        elif field == 2 and wire == WT_LEN:
            ln, pos = read_varint(data, pos)
            end = pos + ln
            tags = []
            while pos < end:
                v, pos = read_varint(data, pos)
                tags.append(v)
            out["tags"] = tags
        elif field == 3 and wire == WT_VARINT:
            out["type"], pos = read_varint(data, pos)
        elif field == 4 and wire == WT_LEN:
            ln, pos = read_varint(data, pos)
            end = pos + ln
            geom = []
            while pos < end:
                v, pos = read_varint(data, pos)
                geom.append(v)
            out["geometry"] = geom
        elif field == 5 and wire == WT_LEN:
            ln, pos = read_varint(data, pos)
            out["raster"] = data[pos : pos + ln]
            pos += ln
        else:
            pos = skip_field(data, pos, wire)
    return out
