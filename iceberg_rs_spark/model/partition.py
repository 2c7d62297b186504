"""Partition spec & transforms (reference: src/model/partition.rs).

Hidden partitioning: partition values are *derived* from data columns by
a Transform (partition.rs:15-35). Queries filter on source columns; the
engine derives partition predicates (pruning lives in
``iceberg_rs_spark.sources.icelake``; the Column expressions in
``iceberg_rs_spark.functions.transforms``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_BUCKET_RE = re.compile(r"^bucket\[(?P<n>\d+)\]$")  # partition.rs:73
_TRUNCATE_RE = re.compile(r"^truncate\[(?P<w>\d+)\]$")  # partition.rs:97

_SIMPLE = {"void", "identity", "year", "month", "day", "hour"}


@dataclass(frozen=True)
class Transform:
    """One of: void, identity, year, month, day, hour, bucket[N],
    truncate[W] (partition.rs:15-35). Stored in canonical string form."""

    name: str

    @property
    def kind(self) -> str:
        return self.name.split("[", 1)[0]

    @property
    def param(self) -> int | None:
        m = _BUCKET_RE.match(self.name) or _TRUNCATE_RE.match(self.name)
        return int(m.group(1)) if m else None

    @staticmethod
    def parse(s: str) -> "Transform":
        """Prefix-dispatch on bucket/truncate, else unit variants
        (partition.rs:37-51 + regexes 67-113)."""
        if s in _SIMPLE:
            return Transform(s)
        m = _BUCKET_RE.match(s)
        if m:
            return Transform(f"bucket[{int(m['n'])}]")
        m = _TRUNCATE_RE.match(s)
        if m:
            return Transform(f"truncate[{int(m['w'])}]")
        raise ValueError(f"invalid transform: {s!r}")

    def to_json(self) -> str:
        return self.name


@dataclass(frozen=True)
class PartitionField:
    """source_id (source column), field_id (unique across specs in v2),
    name, transform (partition.rs:115-128)."""

    source_id: int
    field_id: int
    name: str
    transform: Transform

    def to_json(self) -> dict:
        return {
            "source-id": self.source_id,
            "field-id": self.field_id,
            "name": self.name,
            "transform": self.transform.to_json(),
        }

    @staticmethod
    def from_json(obj: dict) -> "PartitionField":
        return PartitionField(
            source_id=int(obj["source-id"]),
            field_id=int(obj["field-id"]),
            name=obj["name"],
            transform=Transform.parse(obj["transform"]),
        )


@dataclass(frozen=True)
class PartitionSpec:
    """spec_id + ordered fields (partition.rs:130-138)."""

    spec_id: int
    fields: tuple[PartitionField, ...] = ()

    def to_json(self) -> dict:
        return {"spec-id": self.spec_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(obj: dict) -> "PartitionSpec":
        return PartitionSpec(
            spec_id=int(obj["spec-id"]),
            fields=tuple(PartitionField.from_json(f) for f in obj.get("fields", [])),
        )

    @property
    def is_unpartitioned(self) -> bool:
        return not any(f.transform.kind != "void" for f in self.fields)
