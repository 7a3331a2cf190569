"""Pure-Python Avro *binary encoding* codec (Apache Avro spec, "Binary
Encoding" section — varint/zigzag longs, length-prefixed utf-8 strings,
fields in declared order, index-prefixed unions, block-encoded arrays/maps).

Why this exists: the reference's native record format is Avro
(reference: src/main/avro/TripEvent.avsc:1-93, pom.xml:188-205), but the
pip-installed pyspark ships only avro-core jars — `pyspark.sql.avro.
functions.from_avro/to_avro` import fine and then fail at runtime with
"Failed to find data source: avro". This module is the spec-faithful
fallback used by :mod:`..operators.avro_interop` behind Arrow-batched
pandas UDFs; on a cluster with the spark-avro jar attached the native JVM
functions are preferred (see ``avro_interop.native_avro_available``).

Scope: the schema features a connector user actually hits — primitives,
``record``, ``enum``, ``fixed``, ``array``, ``map``, unions, named-type
references, and the ``timestamp-millis``/``timestamp-micros`` logical
types (passed through as longs; Spark-side conversion stays JVM-exact).
No object-container-file framing: these are raw single-record payloads,
exactly what Kafka/Kinesis messages carry and what from_avro expects.
"""

from __future__ import annotations

import io
import json
import struct as _struct
from typing import Any

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def parse_schema(schema: str | dict | list) -> dict | list | str:
    """Parse an .avsc JSON string (or pass through an already-parsed one)."""
    return json.loads(schema) if isinstance(schema, str) else schema


def _named(schema: dict) -> str | None:
    if isinstance(schema, dict) and schema.get("type") in ("record", "enum", "fixed"):
        ns = schema.get("namespace")
        name = schema["name"]
        return f"{ns}.{name}" if ns and "." not in name else name
    return None


def _resolve(schema: Any, names: dict[str, dict]) -> Any:
    """Resolve a named-type reference string to its definition."""
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        try:
            return names[schema]
        except KeyError:
            raise ValueError(f"unresolved Avro type reference: {schema!r}") from None
    return schema


def _collect_names(schema: Any, names: dict[str, dict]) -> None:
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)
    elif isinstance(schema, dict):
        full = _named(schema)
        if full is not None:
            names[full] = schema
            names.setdefault(schema["name"], schema)
        t = schema.get("type")
        if t == "record":
            for f in schema["fields"]:
                _collect_names(f["type"], names)
        elif t == "array":
            _collect_names(schema["items"], names)
        elif t == "map":
            _collect_names(schema["values"], names)
        elif isinstance(t, (dict, list)):
            _collect_names(t, names)


# --- writer -----------------------------------------------------------------

def _write_long(out: io.BytesIO, v: int) -> None:
    # zigzag then base-128 varint, 7 bits per byte, high bit = continuation
    v = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _write(out: io.BytesIO, schema: Any, value: Any, names: dict[str, dict]) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: index-prefixed branch
        for idx, branch in enumerate(schema):
            if _matches(branch, value, names):
                _write_long(out, idx)
                _write(out, branch, value, names)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema!r}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)) and not isinstance(schema, dict):
        raise ValueError(f"malformed schema {schema!r}")
    if isinstance(schema, dict) and isinstance(t, (dict, list)):
        # {"type": {...logical/nested...}} wrapper
        _write(out, t, value, names)
        return
    if t == "null":
        if value is not None:
            raise ValueError("non-null value for null schema")
    elif t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(_struct.pack("<f", float(value)))
    elif t == "double":
        out.write(_struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "string":
        _write_bytes(out, str(value).encode("utf-8"))
    elif t == "record":
        for f in schema["fields"]:
            try:
                _write(out, f["type"], value[f["name"]], names)
            except KeyError:
                raise ValueError(f"record missing field {f['name']!r}") from None
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(b)} != {schema['size']}")
        out.write(b)
    elif t == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for it in items:
                _write(out, schema["items"], it, names)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                _write_bytes(out, str(k).encode("utf-8"))
                _write(out, schema["values"], v, names)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


def _matches(branch: Any, value: Any, names: dict[str, dict]) -> bool:
    branch = _resolve(branch, names)
    t = branch["type"] if isinstance(branch, dict) else branch
    if isinstance(t, (dict, list)):
        t = t.get("type") if isinstance(t, dict) else None
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t == "enum":
        return isinstance(value, str)
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    return False


# --- reader -----------------------------------------------------------------

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated Avro payload")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            if self.pos >= len(self.buf):
                raise ValueError("truncated varint")
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("varint too long")
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _read(r: _Reader, schema: Any, names: dict[str, dict]) -> Any:
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"union index {idx} out of range")
        return _read(r, schema[idx], names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(schema, dict) and isinstance(t, (dict, list)):
        return _read(r, t, names)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        v = r.read_long()
        if t == "int" and not -(2**31) <= v < 2**31:
            raise ValueError(f"int out of range: {v}")
        return v
    if t == "float":
        return _struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return _struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.read_long())
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    if t == "record":
        return {f["name"]: _read(r, f["type"], names) for f in schema["fields"]}
    if t == "enum":
        idx = r.read_long()
        try:
            return schema["symbols"][idx]
        except IndexError:
            raise ValueError(f"enum index {idx} out of range") from None
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_read(r, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read(r.read_long()).decode("utf-8")
                out[k] = _read(r, schema["values"], names)
    raise ValueError(f"unsupported Avro type: {t!r}")


# --- public API -------------------------------------------------------------

def encode(schema: str | dict | list, value: Any) -> bytes:
    """Encode ``value`` as raw Avro binary under ``schema``."""
    schema = parse_schema(schema)
    names: dict[str, dict] = {}
    _collect_names(schema, names)
    out = io.BytesIO()
    _write(out, schema, value, names)
    return out.getvalue()


def decode(schema: str | dict | list, payload: bytes, *, strict: bool = True) -> Any:
    """Decode raw Avro binary. ``strict`` rejects trailing garbage bytes
    (a truncation/corruption signal a dead-letter path wants)."""
    schema = parse_schema(schema)
    names: dict[str, dict] = {}
    _collect_names(schema, names)
    r = _Reader(bytes(payload))
    value = _read(r, schema, names)
    if strict and r.pos != len(r.buf):
        raise ValueError(f"{len(r.buf) - r.pos} trailing bytes after Avro record")
    return value
