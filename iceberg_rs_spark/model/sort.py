"""Sort orders (reference: src/model/sort.rs).

A SortOrder is an ordered list of SortFields — "order of the sort fields
within the list defines the order in which the sort is applied"
(sort.rs:47-57); order_id 0 = unsorted (sort.rs:53). SortFields reuse
partition transforms (sort.rs:8) and carry direction + null order.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column

from iceberg_rs_spark.model.partition import Transform

_DIRECTIONS = ("asc", "desc")  # sort.rs:11-20
_NULL_ORDERS = ("nulls-first", "nulls-last")  # sort.rs:22-31


@dataclass(frozen=True)
class SortField:
    source_id: int
    transform: Transform
    direction: str  # "asc" | "desc"
    null_order: str  # "nulls-first" | "nulls-last"

    def __post_init__(self):
        if self.direction not in _DIRECTIONS:
            raise ValueError(f"invalid sort direction: {self.direction!r}")
        if self.null_order not in _NULL_ORDERS:
            raise ValueError(f"invalid null order: {self.null_order!r}")

    def to_json(self) -> dict:
        return {
            "source-id": self.source_id,
            "transform": self.transform.to_json(),
            "direction": self.direction,
            "null-order": self.null_order,
        }

    @staticmethod
    def from_json(obj: dict) -> "SortField":
        return SortField(
            source_id=int(obj["source-id"]),
            transform=Transform.parse(obj["transform"]),
            direction=obj["direction"],
            null_order=obj["null-order"],
        )

    def apply(self, col: Column) -> Column:
        """The four direction × null-order combinations as a Spark sort
        expression (Column.asc_nulls_first family — SURVEY.md §1.4)."""
        if self.direction == "asc":
            return col.asc_nulls_first() if self.null_order == "nulls-first" else col.asc_nulls_last()
        return col.desc_nulls_first() if self.null_order == "nulls-first" else col.desc_nulls_last()


@dataclass(frozen=True)
class SortOrder:
    order_id: int
    fields: tuple[SortField, ...] = ()

    UNSORTED_ID = 0

    def to_json(self) -> dict:
        return {"order-id": self.order_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(obj: dict) -> "SortOrder":
        return SortOrder(
            order_id=int(obj["order-id"]),
            fields=tuple(SortField.from_json(f) for f in obj.get("fields", [])),
        )

    @property
    def is_unsorted(self) -> bool:
        return self.order_id == self.UNSORTED_ID or not self.fields
