"""Minimal BSON.jl reader — enough to load the reference's checkpoints.

BSON.jl serializes Julia object graphs as standard BSON documents with
julia-specific tag conventions:

  {"tag": "struct",   "type": <node>, "data": [field values in struct order]}
  {"tag": "datatype", "name": ["Flux","Conv"], "params": [...]}
  {"tag": "array",    "type": <node>, "size": [dims...], "data": <binary>}
  {"tag": "backref",  "ref": i}   # 1-based index into root["_backrefs"]
  {"tag": "tuple",    "data": [...]}
  {"tag": "symbol",   "name": str}

Scalars like Float32 are structs whose data is a 4-byte binary. Arrays are
column-major (Julia layout) — decoded to numpy with order='F'.

This is a reader for the *format*, written from the BSON spec and inspection
of the reference's committed .bson files (SURVEY.md section 2.5); no code is
derived from BSON.jl itself.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any

import numpy as np

_JULIA_DTYPES = {
    "Core.Float64": np.float64,
    "Core.Float32": np.float32,
    "Core.Float16": np.float16,
    "Core.Int64": np.int64,
    "Core.Int32": np.int32,
    "Core.UInt8": np.uint8,
    "Core.Bool": np.bool_,
}


def _parse_document(buf: bytes, pos: int) -> tuple[dict, int]:
    length = struct.unpack_from("<i", buf, pos)[0]
    end = pos + length - 1
    pos += 4
    out: dict[str, Any] = {}
    while pos < end:
        etype = buf[pos]
        pos += 1
        nul = buf.index(0, pos)
        key = buf[pos:nul].decode()
        pos = nul + 1
        if etype == 0x01:  # double
            val = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif etype == 0x02:  # string
            slen = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
            val = buf[pos : pos + slen - 1].decode()
            pos += slen
        elif etype in (0x03, 0x04):  # document / array
            val, pos = _parse_document(buf, pos)
            if etype == 0x04:
                val = [val[str(i)] for i in range(len(val))]
        elif etype == 0x05:  # binary
            blen = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
            pos += 1  # subtype
            val = buf[pos : pos + blen]
            pos += blen
        elif etype == 0x08:
            val = bool(buf[pos])
            pos += 1
        elif etype == 0x0A:
            val = None
        elif etype == 0x10:
            val = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        elif etype == 0x12:
            val = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        else:
            raise ValueError(f"unsupported BSON element type {etype:#x} at byte {pos}")
        out[key] = val
    return out, end + 1


@dataclass
class JuliaStruct:
    """A decoded Julia struct: type name (dotted) + positional field values."""

    typename: str
    fields: list = field(default_factory=list)

    def arrays(self) -> list[np.ndarray]:
        return [f for f in self.fields if isinstance(f, np.ndarray)]

    def __repr__(self):
        return f"JuliaStruct({self.typename}, {len(self.fields)} fields)"


class _Resolver:
    def __init__(self, backrefs: list):
        self._raw = backrefs
        self._cache: dict[int, Any] = {}
        self._in_progress: set[int] = set()

    def backref(self, ref: int):
        if ref in self._cache:
            return self._cache[ref]
        if ref in self._in_progress:  # cycle (type self-references) — return tag name
            return f"<cycle:{ref}>"
        self._in_progress.add(ref)
        val = self.resolve(self._raw[ref - 1])
        self._in_progress.discard(ref)
        self._cache[ref] = val
        return val

    def resolve(self, node):
        if isinstance(node, list):
            return [self.resolve(x) for x in node]
        if not isinstance(node, dict):
            return node
        tag = node.get("tag")
        if tag is None:
            return {k: self.resolve(v) for k, v in node.items()}
        if tag == "backref":
            return self.backref(node["ref"])
        if tag == "datatype":
            return ".".join(node["name"])
        if tag == "symbol":
            return node["name"]
        if tag == "tuple":
            return tuple(self.resolve(x) for x in node["data"])
        if tag == "svec":
            return tuple(self.resolve(x) for x in node["data"])
        if tag == "array":
            eltype = self.resolve(node["type"])
            size = [int(s) for s in node["size"]]
            data = node["data"]
            if isinstance(data, (bytes, bytearray)):
                dtype = _JULIA_DTYPES.get(eltype)
                if dtype is None:
                    raise ValueError(f"unsupported array eltype {eltype}")
                arr = np.frombuffer(bytes(data), dtype=dtype)
                return arr.reshape(size, order="F").copy()
            # array-of-objects
            vals = self.resolve(data)
            return np.array(vals, dtype=object).reshape(size, order="F")
        if tag == "struct":
            typename = self.resolve(node["type"])
            if not isinstance(typename, str):
                typename = str(typename)
            fields = [self.resolve(x) for x in node.get("data", [])]
            # Primitive scalars: payload is raw bytes — either one binary
            # element or a BSON int list of byte values.
            if typename in _JULIA_DTYPES:
                raw = None
                if len(fields) == 1 and isinstance(fields[0], (bytes, bytearray)):
                    raw = bytes(fields[0])
                elif fields and all(isinstance(f, int) and 0 <= f < 256 for f in fields):
                    raw = bytes(fields)
                if raw is not None:
                    return np.frombuffer(raw, _JULIA_DTYPES[typename])[0]
            return JuliaStruct(typename, fields)
        if tag == "jl_anonymous" or tag == "jl_bottom_type":
            return tag
        raise ValueError(f"unknown BSON.jl tag {tag!r}")


def load_bson(path: str) -> dict:
    """Load a BSON.jl file into Python objects (JuliaStruct / numpy / scalars)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    try:
        doc, _ = _parse_document(buf, 0)
    except (ValueError, IndexError, struct.error) as e:
        raise ValueError(f"{path!r} is not a parseable BSON file: {e}") from e
    resolver = _Resolver(doc.get("_backrefs", []))
    return {k: resolver.resolve(v) for k, v in doc.items() if k != "_backrefs"}
