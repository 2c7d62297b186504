"""Snapshots, operations, and refs (reference: src/model/snapshot.rs).

The four commit kinds (snapshot.rs:14-31) are the write API contract:
append (only data files added), replace (files rewritten, data
unchanged), overwrite (logical overwrite), delete (rows logically
deleted). Named refs are branches (with retention) or tags
(snapshot.rs:67-103), discriminated by a ``type`` tag.
"""

from __future__ import annotations

from dataclasses import dataclass, field

OPERATIONS = ("append", "replace", "overwrite", "delete")


@dataclass(frozen=True)
class Snapshot:
    """snapshot.rs:43-65. ``manifest_list`` points at the file listing
    the snapshot's data files (our manifests are parquet, not Avro)."""

    snapshot_id: int
    sequence_number: int
    timestamp_ms: int
    manifest_list: str
    parent_snapshot_id: int | None = None
    summary: dict = field(default_factory=dict)  # {"operation": ..., **stats}
    schema_id: int | None = None

    @property
    def operation(self) -> str | None:
        return self.summary.get("operation")

    def to_json(self) -> dict:
        out = {
            "snapshot-id": self.snapshot_id,
            "sequence-number": self.sequence_number,
            "timestamp-ms": self.timestamp_ms,
            "manifest-list": self.manifest_list,
            "summary": dict(self.summary),
        }
        if self.parent_snapshot_id is not None:
            out["parent-snapshot-id"] = self.parent_snapshot_id
        if self.schema_id is not None:
            out["schema-id"] = self.schema_id
        return out

    @staticmethod
    def from_json(obj: dict) -> "Snapshot":
        summary = dict(obj.get("summary", {}))
        op = summary.get("operation")
        if op is not None and op not in OPERATIONS:
            raise ValueError(f"unknown snapshot operation: {op!r}")
        return Snapshot(
            snapshot_id=int(obj["snapshot-id"]),
            sequence_number=int(obj["sequence-number"]),
            timestamp_ms=int(obj["timestamp-ms"]),
            manifest_list=obj["manifest-list"],
            parent_snapshot_id=(
                int(obj["parent-snapshot-id"]) if obj.get("parent-snapshot-id") is not None else None
            ),
            summary=summary,
            schema_id=int(obj["schema-id"]) if obj.get("schema-id") is not None else None,
        )


@dataclass(frozen=True)
class Reference:
    """A named ref: branch or tag (snapshot.rs:67-103).

    Branch retention: min_snapshots_to_keep, max_snapshot_age_ms,
    max_ref_age_ms (snapshot.rs:85-95); tags carry only max_ref_age_ms
    (snapshot.rs:98-102).
    """

    snapshot_id: int
    type: str  # "branch" | "tag"
    min_snapshots_to_keep: int | None = None
    max_snapshot_age_ms: int | None = None
    max_ref_age_ms: int | None = None

    def __post_init__(self):
        if self.type not in ("branch", "tag"):
            raise ValueError(f"ref type must be branch|tag, got {self.type!r}")
        if self.type == "tag" and (
            self.min_snapshots_to_keep is not None or self.max_snapshot_age_ms is not None
        ):
            raise ValueError("tag refs only support max-ref-age-ms retention")

    def to_json(self) -> dict:
        out = {"snapshot-id": self.snapshot_id, "type": self.type}
        if self.min_snapshots_to_keep is not None:
            out["min-snapshots-to-keep"] = self.min_snapshots_to_keep
        if self.max_snapshot_age_ms is not None:
            out["max-snapshot-age-ms"] = self.max_snapshot_age_ms
        if self.max_ref_age_ms is not None:
            out["max-ref-age-ms"] = self.max_ref_age_ms
        return out

    @staticmethod
    def from_json(obj: dict) -> "Reference":
        return Reference(
            snapshot_id=int(obj["snapshot-id"]),
            type=obj["type"],
            min_snapshots_to_keep=obj.get("min-snapshots-to-keep"),
            max_snapshot_age_ms=obj.get("max-snapshot-age-ms"),
            max_ref_age_ms=obj.get("max-ref-age-ms"),
        )
