"""Schema object (reference: src/model/schema.rs:190-260).

A schema is a Struct plus a schema-id, optional identifier-field-ids
(row-identity columns → MERGE keys) and an optional name-mapping
(fallback field-id-by-name rules for data files lacking ids).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from iceberg_rs_spark.model.types import (
    IceField,
    IceStruct,
    parse_type,
    struct_to_spark,
    type_to_json,
)


@dataclass(frozen=True)
class NameMapping:
    """One mapping rule: names that map to a field id
    (schema.rs:242-260; table property schema.name-mapping.default)."""

    field_id: int
    names: tuple[str, ...]

    def to_json(self) -> dict:
        return {"field-id": self.field_id, "names": list(self.names)}

    @staticmethod
    def from_json(obj: dict) -> "NameMapping":
        return NameMapping(field_id=int(obj["field-id"]), names=tuple(obj["names"]))


@dataclass(frozen=True)
class IceSchema:
    schema_id: int
    struct: IceStruct
    identifier_field_ids: tuple[int, ...] | None = None
    name_mapping: tuple[NameMapping, ...] | None = None

    @property
    def fields(self) -> tuple[IceField, ...]:
        return self.struct.fields

    def field_by_id(self, fid: int) -> IceField | None:
        for f in self.fields:
            if f.id == fid:
                return f
        return None

    def field_by_name(self, name: str) -> IceField | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    def to_spark(self) -> T.StructType:
        return struct_to_spark(self.struct)

    def column_names(self) -> list[str]:
        return [f.name for f in self.fields]

    # -- JSON (kebab-case, struct fields flattened into the schema object,
    #    matching the reference's #[serde(flatten)] — schema.rs:191-205) --

    def to_json(self) -> dict:
        out: dict = {
            "type": "struct",
            "schema-id": self.schema_id,
            "fields": type_to_json(self.struct)["fields"],
        }
        if self.identifier_field_ids is not None:
            out["identifier-field-ids"] = list(self.identifier_field_ids)
        if self.name_mapping is not None:
            out["name-mapping"] = [m.to_json() for m in self.name_mapping]
        return out

    @staticmethod
    def from_json(obj: dict) -> "IceSchema":
        if obj.get("type") != "struct":
            raise ValueError(f"schema type must be 'struct', got {obj.get('type')!r}")
        struct = parse_type({"type": "struct", "fields": obj.get("fields", [])})
        ids = obj.get("identifier-field-ids")
        nm = obj.get("name-mapping")
        return IceSchema(
            schema_id=int(obj["schema-id"]),
            struct=struct,
            identifier_field_ids=tuple(ids) if ids is not None else None,
            name_mapping=tuple(NameMapping.from_json(m) for m in nm) if nm is not None else None,
        )
