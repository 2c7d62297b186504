"""Iceberg type system ↔ Spark type system (SURVEY.md §1.2).

Mirrors /root/reference/src/model/schema.rs:16-260: all data types are
either primitives or nested types (Map, List, Struct); a table schema is
a Struct. Primitive strings follow the spec grammar, including the
regex-parsed parameterized forms ``decimal(P,S)`` (schema.rs:96) and
``fixed[L]`` (schema.rs:130), with the reference's validation behavior
(scale must fit u8 — schema.rs:301-309; fixed length must be an
integer — schema.rs:345-353).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Union

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Type tree
# ---------------------------------------------------------------------------

_SIMPLE_PRIMITIVES = {
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "date",
    "time",
    "timestamp",
    "timestamptz",
    "string",
    "uuid",
    "binary",
}

# The reference spells timestamptz `timestampz` in its enum but the spec
# string is `timestamptz`; accept both on parse, emit the spec spelling.
_ALIASES = {"timestampz": "timestamptz"}

_DECIMAL_RE = re.compile(r"^decimal\((?P<p>\d+),\s*(?P<s>\d+)\)$")  # schema.rs:96
_FIXED_RE = re.compile(r"^fixed\[(?P<l>\d+)\]$")  # schema.rs:130


@dataclass(frozen=True)
class IcePrimitive:
    """A primitive type, stored in canonical string form."""

    name: str  # e.g. "long", "decimal(10,2)", "fixed[16]"

    @property
    def decimal_precision_scale(self) -> tuple[int, int] | None:
        m = _DECIMAL_RE.match(self.name)
        return (int(m["p"]), int(m["s"])) if m else None

    @property
    def fixed_length(self) -> int | None:
        m = _FIXED_RE.match(self.name)
        return int(m["l"]) if m else None


@dataclass(frozen=True)
class IceField:
    """struct field: id, name, required, type, optional doc
    (schema.rs:177-188). Field IDs are the schema-evolution backbone."""

    id: int
    name: str
    required: bool
    type: "IceType"
    doc: str | None = None


@dataclass(frozen=True)
class IceStruct:
    fields: tuple[IceField, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class IceList:
    element_id: int
    element_required: bool
    element: "IceType"


@dataclass(frozen=True)
class IceMap:
    key_id: int
    key: "IceType"
    value_id: int
    value_required: bool
    value: "IceType"


IceType = Union[IcePrimitive, IceStruct, IceList, IceMap]


# ---------------------------------------------------------------------------
# Parse / serialize (the reference's custom serde impls)
# ---------------------------------------------------------------------------


def parse_primitive(s: str) -> IcePrimitive:
    """Prefix-dispatch on decimal/fixed, else unit variants
    (schema.rs:73-87 + regex sub-parsers 90-147)."""
    s = _ALIASES.get(s, s)
    if s in _SIMPLE_PRIMITIVES:
        return IcePrimitive(s)
    m = _DECIMAL_RE.match(s)
    if m:
        p, sc = int(m["p"]), int(m["s"])
        if sc > 255:  # scale is u8 in the reference (schema.rs:33, test 301-309)
            raise ValueError(f"decimal scale out of range (u8): {s}")
        if p > 38:  # Iceberg caps P<=38 = Spark max
            raise ValueError(f"decimal precision > 38: {s}")
        return IcePrimitive(f"decimal({p},{sc})")
    m = _FIXED_RE.match(s)
    if m:
        return IcePrimitive(f"fixed[{int(m['l'])}]")
    if s.startswith("decimal") or s.startswith("fixed"):
        raise ValueError(f"malformed parameterized type: {s!r}")
    raise ValueError(f"unknown primitive type: {s!r}")


def parse_type(obj) -> IceType:
    """Untagged-union resolution (schema.rs:149-161): a JSON string is a
    primitive; a dict dispatches on its ``type`` tag."""
    if isinstance(obj, str):
        return parse_primitive(obj)
    if isinstance(obj, dict):
        tag = obj.get("type")
        if tag == "struct":
            return IceStruct(
                tuple(
                    IceField(
                        id=int(f["id"]),
                        name=f["name"],
                        required=bool(f["required"]),
                        type=parse_type(f["type"]),
                        doc=f.get("doc"),
                    )
                    for f in obj.get("fields", [])
                )
            )
        if tag == "list":
            return IceList(
                element_id=int(obj["element-id"]),
                element_required=bool(obj["element-required"]),
                element=parse_type(obj["element"]),
            )
        if tag == "map":
            return IceMap(
                key_id=int(obj["key-id"]),
                key=parse_type(obj["key"]),
                value_id=int(obj["value-id"]),
                value_required=bool(obj["value-required"]),
                value=parse_type(obj["value"]),
            )
        raise ValueError(f"unknown nested type tag: {tag!r}")
    raise ValueError(f"cannot parse type from {type(obj).__name__}")


type_from_json = parse_type


def type_to_json(t: IceType):
    """Inverse of parse_type; primitives emit their canonical strings
    (decimal uses parentheses, fixed uses brackets — the spec asymmetry
    preserved by the reference, schema.rs:54-69)."""
    if isinstance(t, IcePrimitive):
        return t.name
    if isinstance(t, IceStruct):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": f.id,
                    "name": f.name,
                    "required": f.required,
                    "type": type_to_json(f.type),
                    **({"doc": f.doc} if f.doc is not None else {}),
                }
                for f in t.fields
            ],
        }
    if isinstance(t, IceList):
        return {
            "type": "list",
            "element-id": t.element_id,
            "element-required": t.element_required,
            "element": type_to_json(t.element),
        }
    if isinstance(t, IceMap):
        return {
            "type": "map",
            "key-id": t.key_id,
            "key": type_to_json(t.key),
            "value-id": t.value_id,
            "value-required": t.value_required,
            "value": type_to_json(t.value),
        }
    raise TypeError(f"not an IceType: {t!r}")


# ---------------------------------------------------------------------------
# Spark mapping (SURVEY.md §1.2 table; decisions are final)
# ---------------------------------------------------------------------------

_PRIM_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    # `time`: Spark has no time-of-day type; store long micros + metadata marker.
    "time": T.LongType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "string": T.StringType(),
    # uuid: canonical-form string (what Iceberg-Spark reads uuid as).
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
}


def ice_to_spark(t: IceType) -> T.DataType:
    if isinstance(t, IcePrimitive):
        ps = t.decimal_precision_scale
        if ps:
            return T.DecimalType(*ps)
        if t.fixed_length is not None:
            return T.BinaryType()  # fixed-width enforced at write, not by type
        return _PRIM_TO_SPARK[t.name]
    if isinstance(t, IceStruct):
        return T.StructType([_field_to_spark(f) for f in t.fields])
    if isinstance(t, IceList):
        return T.ArrayType(ice_to_spark(t.element), containsNull=not t.element_required)
    if isinstance(t, IceMap):
        return T.MapType(
            ice_to_spark(t.key),
            ice_to_spark(t.value),
            valueContainsNull=not t.value_required,
        )
    raise TypeError(f"not an IceType: {t!r}")


def _field_to_spark(f: IceField) -> T.StructField:
    meta = {"iceberg.id": f.id}
    if f.doc is not None:
        meta["comment"] = f.doc
    if isinstance(f.type, IcePrimitive) and f.type.name in ("time", "uuid"):
        meta["iceberg.type"] = f.type.name  # marker for gap types
    if isinstance(f.type, IcePrimitive) and f.type.fixed_length is not None:
        meta["iceberg.type"] = f.type.name
    return T.StructField(f.name, ice_to_spark(f.type), nullable=not f.required, metadata=meta)


def struct_to_spark(t: IceStruct) -> T.StructType:
    st = ice_to_spark(t)
    assert isinstance(st, T.StructType)
    return st


class _IdGen:
    def __init__(self, start: int = 0):
        self.last = start

    def next(self) -> int:
        self.last += 1
        return self.last


def spark_to_ice(dt: T.DataType, _ids: _IdGen | None = None) -> IceType:
    """Map a Spark type tree to Ice types, assigning fresh field ids in
    depth-first order (used when freezing an inferred ingest schema)."""
    ids = _ids or _IdGen()
    if isinstance(dt, T.StructType):
        fields = []
        # Assign ids to direct fields first (Iceberg assigns top-down).
        assigned = [(f, ids.next()) for f in dt.fields]
        for f, fid in assigned:
            fields.append(
                IceField(
                    id=fid,
                    name=f.name,
                    required=not f.nullable,
                    type=spark_to_ice(f.dataType, ids),
                    doc=(f.metadata or {}).get("comment"),
                )
            )
        return IceStruct(tuple(fields))
    if isinstance(dt, T.ArrayType):
        eid = ids.next()
        return IceList(
            element_id=eid,
            element_required=not dt.containsNull,
            element=spark_to_ice(dt.elementType, ids),
        )
    if isinstance(dt, T.MapType):
        kid, vid = ids.next(), ids.next()
        return IceMap(
            key_id=kid,
            key=spark_to_ice(dt.keyType, ids),
            value_id=vid,
            value_required=not dt.valueContainsNull,
            value=spark_to_ice(dt.valueType, ids),
        )
    if isinstance(dt, T.DecimalType):
        return IcePrimitive(f"decimal({dt.precision},{dt.scale})")
    simple = {
        T.BooleanType: "boolean",
        T.IntegerType: "int",
        T.ShortType: "int",
        T.ByteType: "int",
        T.LongType: "long",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.DateType: "date",
        T.TimestampNTZType: "timestamp",
        T.TimestampType: "timestamptz",
        T.StringType: "string",
        T.BinaryType: "binary",
    }
    for cls, name in simple.items():
        if isinstance(dt, cls):
            return IcePrimitive(name)
    raise ValueError(f"no Iceberg mapping for Spark type {dt.simpleString()}")


def max_field_id(t: IceType) -> int:
    """Highest field id in a type tree (drives last-column-id)."""
    if isinstance(t, IcePrimitive):
        return 0
    if isinstance(t, IceStruct):
        return max(
            [0]
            + [max(f.id, max_field_id(f.type)) for f in t.fields]
        )
    if isinstance(t, IceList):
        return max(t.element_id, max_field_id(t.element))
    if isinstance(t, IceMap):
        return max(t.key_id, t.value_id, max_field_id(t.key), max_field_id(t.value))
    return 0
