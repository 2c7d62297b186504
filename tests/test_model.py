"""Metadata-model tests, mirroring the reference's three techniques
(SURVEY.md §5): serde round-trips, negative/validation cases, and
property-based round-trips — plus the reference's own full-metadata
fixture document (reference table.rs:110-160 / README.md:35-85)."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_rs_spark.model import (
    IceField,
    IcePrimitive,
    IceSchema,
    IceStruct,
    PartitionField,
    PartitionSpec,
    Reference,
    Snapshot,
    SortField,
    SortOrder,
    TableMetadata,
    Transform,
    ice_to_spark,
    parse_type,
    spark_to_ice,
    type_to_json,
)
from pyspark.sql import types as T

# The reference's own test fixture (reference: src/model/table.rs:110-160).
FULL_METADATA_JSON = """
{
    "format-version" : 2,
    "table-uuid": "fb072c92-a02b-11e9-ae9c-1bb7bc9eca94",
    "location": "s3://b/wh/data.db/table",
    "last-sequence-number" : 1,
    "last-updated-ms": 1515100955770,
    "last-column-id": 1,
    "schemas": [
        {
            "schema-id" : 1,
            "type" : "struct",
            "fields" :[
                {
                    "id": 1,
                    "name": "struct_name",
                    "required": true,
                    "type": "fixed[1]"
                }
            ]
        }
    ],
    "current-schema-id" : 1,
    "partition-specs": [
        {
            "spec-id": 1,
            "fields": [
                {
                    "source-id": 4,
                    "field-id": 1000,
                    "name": "ts_day",
                    "transform": "day"
                }
            ]
        }
    ],
    "default-spec-id": 1,
    "last-partition-id": 1000,
    "properties": {
        "commit.retry.num-retries": "1"
    },
    "metadata-log": [
        {
            "metadata-file": "s3://bucket/.../v1.json",
            "timestamp-ms": 1515100
        }
    ],
    "sort-orders": [],
    "default-sort-order-id": 0
}
"""

ALL_PRIMITIVES = [
    "boolean", "int", "long", "float", "double", "decimal(9,2)", "date",
    "time", "timestamp", "timestamptz", "string", "uuid", "fixed[8]", "binary",
]


class TestTypes:
    @pytest.mark.parametrize("name", ALL_PRIMITIVES)
    def test_primitive_round_trip(self, name):
        # mirrors reference schema.rs:357-391 (all primitives round-trip)
        t = parse_type(name)
        assert type_to_json(t) == name

    def test_timestampz_alias_accepted(self):
        assert parse_type("timestampz") == IcePrimitive("timestamptz")

    def test_decimal_scale_overflow_rejected(self):
        # reference schema.rs:301-309: scale is u8
        with pytest.raises(ValueError):
            parse_type("decimal(1,1000)")

    def test_fixed_non_integer_rejected(self):
        # reference schema.rs:345-353
        with pytest.raises(ValueError):
            parse_type("fixed[0.1]")

    def test_unknown_primitive_rejected(self):
        with pytest.raises(ValueError):
            parse_type("varchar(10)")

    def test_non_struct_tag_rejected(self):
        # reference schema.rs:274-279
        with pytest.raises(ValueError):
            IceSchema.from_json({"schema-id": 1, "type": "map", "fields": []})

    def test_nested_list_round_trip(self):
        # reference schema.rs:426-433
        j = {"type": "list", "element-id": 3, "element-required": True, "element": "string"}
        assert type_to_json(parse_type(j)) == j

    def test_nested_map_round_trip(self):
        # reference schema.rs:446-455
        j = {
            "type": "map", "key-id": 4, "key": "string",
            "value-id": 5, "value-required": False, "value": "double",
        }
        assert type_to_json(parse_type(j)) == j

    def test_deep_nesting_round_trip(self):
        j = {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "m", "required": False, "type": {
                    "type": "map", "key-id": 2, "key": "string", "value-id": 3,
                    "value-required": True, "value": {
                        "type": "list", "element-id": 4, "element-required": False,
                        "element": {"type": "struct", "fields": [
                            {"id": 5, "name": "x", "required": True, "type": "decimal(10,3)",
                             "doc": "inner"},
                        ]},
                    },
                }},
            ],
        }
        assert type_to_json(parse_type(j)) == j

    def test_spark_mapping(self):
        assert ice_to_spark(parse_type("long")) == T.LongType()
        assert ice_to_spark(parse_type("timestamp")) == T.TimestampNTZType()
        assert ice_to_spark(parse_type("timestamptz")) == T.TimestampType()
        assert ice_to_spark(parse_type("decimal(10,2)")) == T.DecimalType(10, 2)
        assert ice_to_spark(parse_type("uuid")) == T.StringType()
        assert ice_to_spark(parse_type("time")) == T.LongType()
        assert ice_to_spark(parse_type("fixed[16]")) == T.BinaryType()

    def test_spark_round_trip_via_ice(self):
        st_ = T.StructType([
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.ArrayType(T.StringType(), True), True),
            T.StructField("c", T.MapType(T.StringType(), T.DoubleType(), True), True),
        ])
        ice = spark_to_ice(st_)
        back = ice_to_spark(ice)
        # nullability + shape preserved
        assert [f.name for f in back.fields] == ["a", "b", "c"]
        assert back["a"].dataType == T.LongType() and not back["a"].nullable


class TestTransforms:
    @pytest.mark.parametrize(
        "s", ["void", "identity", "year", "month", "day", "hour", "bucket[16]", "truncate[4]"]
    )
    def test_round_trip(self, s):
        # mirrors reference partition.rs:163-189 (all 8 transforms)
        assert Transform.parse(s).to_json() == s

    def test_invalid_rejected(self):
        for bad in ("bucket[a]", "truncate[]", "bucketing", "year2", ""):
            with pytest.raises(ValueError):
                Transform.parse(bad)

    def test_spec_round_trip(self):
        spec = PartitionSpec(
            spec_id=1,
            fields=(PartitionField(4, 1000, "ts_day", Transform.parse("day")),),
        )
        assert PartitionSpec.from_json(spec.to_json()) == spec


class TestSort:
    def test_round_trip(self):
        # mirrors reference sort.rs:67-100 (bucket[4], desc, nulls-last)
        j = {
            "order-id": 1,
            "fields": [
                {"source-id": 2, "transform": "bucket[4]",
                 "direction": "desc", "null-order": "nulls-last"},
            ],
        }
        assert SortOrder.from_json(j).to_json() == j

    def test_invalid_direction_rejected(self):
        with pytest.raises(ValueError):
            SortField(1, Transform.parse("identity"), "up", "nulls-first")

    def test_unsorted_is_order_zero(self):
        # reference sort.rs:53: order id 0 = unsorted
        assert SortOrder(order_id=0).is_unsorted


class TestSnapshot:
    def test_round_trip_with_refs(self):
        # mirrors reference snapshot.rs:111-173 (snapshot + branch/tag refs)
        snap = Snapshot(
            snapshot_id=3051729675574597004,
            sequence_number=0,
            timestamp_ms=1515100955770,
            manifest_list="s3://b/wh/.../snap-1.json",
            summary={"operation": "append"},
            schema_id=0,
        )
        assert Snapshot.from_json(snap.to_json()) == snap
        branch = Reference(
            snapshot_id=1, type="branch",
            min_snapshots_to_keep=10, max_snapshot_age_ms=604800000,
        )
        assert Reference.from_json(branch.to_json()) == branch
        tag = Reference(snapshot_id=1, type="tag", max_ref_age_ms=10000000)
        assert Reference.from_json(tag.to_json()) == tag

    def test_unknown_operation_rejected(self):
        with pytest.raises(ValueError):
            Snapshot.from_json({
                "snapshot-id": 1, "sequence-number": 0, "timestamp-ms": 0,
                "manifest-list": "x", "summary": {"operation": "compact-ish"},
            })

    def test_tag_with_branch_retention_rejected(self):
        with pytest.raises(ValueError):
            Reference(snapshot_id=1, type="tag", min_snapshots_to_keep=3)


class TestTableMetadata:
    def test_reference_fixture_parses_and_round_trips(self):
        md = TableMetadata.from_json_str(FULL_METADATA_JSON)
        assert md.table_uuid == "fb072c92-a02b-11e9-ae9c-1bb7bc9eca94"
        assert md.location == "s3://b/wh/data.db/table"
        assert md.properties["commit.retry.num-retries"] == "1"
        assert md.current_schema().field_by_id(1).type == IcePrimitive("fixed[1]")
        assert md.default_spec().fields[0].transform == Transform.parse("day")
        # full round-trip equality (reference table.rs:162-165)
        assert TableMetadata.from_json(md.to_json()) == md

    def test_v1_rejected(self):
        # reference table.rs:182-190
        bad = json.loads(FULL_METADATA_JSON)
        bad["format-version"] = 1
        with pytest.raises(ValueError):
            TableMetadata.from_json(bad)

    def test_invalid_uuid_rejected(self):
        # reference table.rs:171-180
        bad = json.loads(FULL_METADATA_JSON)
        bad["table-uuid"] = "xxxx"
        with pytest.raises(ValueError):
            TableMetadata.from_json(bad)


# ---------------------------------------------------------------------------
# Property-based round-trips (reference uses proptest — sort.rs:103-171)
# ---------------------------------------------------------------------------

transforms_st = st.one_of(
    st.sampled_from(["void", "identity", "year", "month", "day", "hour"]),
    st.integers(min_value=0, max_value=2**32 - 1).map(lambda n: f"bucket[{n}]"),
    st.integers(min_value=0, max_value=2**32 - 1).map(lambda w: f"truncate[{w}]"),
)

sort_fields_st = st.builds(
    SortField,
    source_id=st.integers(min_value=1, max_value=1000),
    transform=transforms_st.map(Transform.parse),
    direction=st.sampled_from(["asc", "desc"]),
    null_order=st.sampled_from(["nulls-first", "nulls-last"]),
)


@settings(max_examples=200, deadline=None)
@given(transforms_st)
def test_transform_round_trip_prop(s):
    assert Transform.parse(s).to_json() == s


@settings(max_examples=100, deadline=None)
@given(st.lists(sort_fields_st, min_size=1, max_size=10), st.integers(1, 100))
def test_sort_order_round_trip_prop(fields, order_id):
    so = SortOrder(order_id=order_id, fields=tuple(fields))
    assert SortOrder.from_json(so.to_json()) == so


primitive_names_st = st.one_of(
    st.sampled_from(ALL_PRIMITIVES),
    st.tuples(st.integers(1, 38), st.integers(0, 38)).map(lambda ps: f"decimal({ps[0]},{ps[1]})"),
    st.integers(1, 4096).map(lambda l: f"fixed[{l}]"),
)


@settings(max_examples=200, deadline=None)
@given(primitive_names_st)
def test_primitive_round_trip_prop(name):
    assert type_to_json(parse_type(name)) == name
