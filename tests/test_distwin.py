"""Distributed global window functions vs the native single-partition
window (operators/distwin.py). The native ``Window.orderBy`` result is
the semantic oracle; distwin must reproduce it bit-for-bit while its
physical plan carries NO single-partition Exchange — that pair of
assertions is the whole point of the module (VERDICT r4 #3).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from iceberg_rs_spark.operators import packing
from iceberg_rs_spark.operators.distwin import (
    ntile_global,
    rank_global,
    row_number_global,
    running_sum_global,
)


@pytest.fixture(scope="module")
def base(spark):
    rng = random.Random(20260814)
    rows = [(i, rng.randint(0, 25), rng.random()) for i in range(1201)]
    df = spark.createDataFrame(rows, "id long, k int, v double").repartition(8)
    df = df.persist()
    df.count()
    yield df
    df.unpersist()
    packing.release_caches()


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestRowNumber:
    def test_matches_native_asc(self, base):
        got = row_number_global(base, [F.col("v"), F.col("id")], "rn").select(
            "id", "rn"
        )
        exp = base.select(
            "id",
            F.row_number().over(Window.orderBy(F.col("v"), "id")).alias("rn"),
        )
        assert _same(got, exp)

    def test_matches_native_desc_multicol(self, base):
        order = [F.col("k").desc(), F.col("v").desc(), F.col("id")]
        got = row_number_global(base, order, "rn").select("id", "rn")
        exp = base.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rn")
        )
        assert _same(got, exp)

    def test_no_single_partition_exchange(self, base):
        got = row_number_global(base, [F.col("v"), F.col("id")], "rn")
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan

    def test_totals_attached(self, base):
        got = row_number_global(base, [F.col("id")], "rn")
        assert got._icelake_prefix_totals == {(): 1201}


class TestRank:
    def test_ties_share_min_and_skip(self, base):
        got = rank_global(base, [F.col("k"), F.col("id")], ["k"], "r").select(
            "id", "r"
        )
        exp = base.select(
            "id", F.rank().over(Window.orderBy(F.col("k"))).alias("r")
        )
        assert _same(got, exp)

    def test_desc_ties(self, base):
        got = rank_global(
            base, [F.col("k").desc(), F.col("id")], ["k"], "r"
        ).select("id", "r")
        exp = base.select(
            "id", F.rank().over(Window.orderBy(F.col("k").desc())).alias("r")
        )
        assert _same(got, exp)


class TestNtile:
    @pytest.mark.parametrize("n", [1, 2, 4, 7, 10, 100, 1201, 1500])
    def test_exact_sql_fill_rule(self, base, n):
        got = ntile_global(base, n, [F.col("v"), F.col("id")], "t").select(
            "id", "t"
        )
        exp = base.select(
            "id",
            F.ntile(n).over(Window.orderBy(F.col("v"), "id")).alias("t"),
        )
        assert _same(got, exp)

    def test_desc_order(self, base):
        got = ntile_global(
            base, 10, [F.col("v").desc(), F.col("id")], "t"
        ).select("id", "t")
        exp = base.select(
            "id",
            F.ntile(10)
            .over(Window.orderBy(F.col("v").desc(), "id"))
            .alias("t"),
        )
        assert _same(got, exp)


class TestRunningSum:
    def test_matches_native_including_negatives(self, base):
        signed = base.withColumn("w", (F.col("k") - 12).cast("long"))
        got = running_sum_global(
            signed, [F.col("id")], "w", "s"
        ).select("id", "s")
        w = Window.orderBy("id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        exp = signed.select("id", F.sum("w").over(w).alias("s"))
        assert _same(got, exp)

    def test_tiebreak_secondary_order(self, base):
        # (k, id) total order with the weight keyed off v's sign —
        # exercises multi-column ordering through the range partitioner.
        signed = base.withColumn(
            "w", F.when(F.col("v") > 0.5, 1).otherwise(-1).cast("long")
        )
        got = running_sum_global(
            signed, [F.col("k"), F.col("id")], "w", "s"
        ).select("id", "s")
        w = Window.orderBy("k", "id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        exp = signed.select("id", F.sum("w").over(w).alias("s"))
        assert _same(got, exp)


class TestRunningMax:
    def test_inclusive_matches_native(self, base):
        from iceberg_rs_spark.operators.distwin import running_max_global

        got = running_max_global(
            base, [F.col("id")], "v", "m", inclusive=True
        ).select("id", "m")
        w = Window.orderBy("id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        exp = base.select("id", F.max("v").over(w).alias("m"))
        assert _same(got, exp)

    def test_exclusive_matches_native_including_null_first_row(self, base):
        from iceberg_rs_spark.operators.distwin import running_max_global

        got = running_max_global(
            base, [F.col("v"), F.col("id")], "k", "m", inclusive=False
        ).select("id", "m")
        w = Window.orderBy("v", "id").rowsBetween(
            Window.unboundedPreceding, -1
        )
        exp = base.select("id", F.max("k").over(w).alias("m"))
        assert _same(got, exp)

    def test_no_single_partition_exchange(self, base):
        from iceberg_rs_spark.operators.distwin import running_max_global

        got = running_max_global(base, [F.col("id")], "v", "m")
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan


class TestMultiWeightRunningSum:
    def test_two_sums_one_pass(self, base):
        signed = base.withColumn("w1", F.lit(1).cast("long")).withColumn(
            "w2", (F.col("k") - 12).cast("long")
        )
        got = running_sum_global(
            signed, [F.col("id")], ["w1", "w2"], ["s1", "s2"]
        ).select("id", "s1", "s2")
        w = Window.orderBy("id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        exp = signed.select(
            "id",
            F.sum("w1").over(w).alias("s1"),
            F.sum("w2").over(w).alias("s2"),
        )
        assert _same(got, exp)

    def test_multi_totals_attached(self, base):
        signed = base.withColumn("w1", F.lit(1).cast("long")).withColumn(
            "w2", F.lit(2).cast("long")
        )
        got = running_sum_global(
            signed, [F.col("id")], ["w1", "w2"], ["s1", "s2"]
        )
        assert got._icelake_prefix_totals == {(): (1201, 2402)}


class TestPartitionInvariance:
    """The answer must not depend on how the two-pass scheme splits
    the data — the same invariance packing.py pins. One partition is
    the degenerate all-local case; 64 > row groups exercises empties."""

    @pytest.mark.parametrize("n_part", [1, 5, 64])
    def test_row_number_invariant(self, base, n_part):
        got = row_number_global(
            base, [F.col("v"), F.col("id")], "rn", num_partitions=n_part
        ).select("id", "rn")
        exp = base.select(
            "id",
            F.row_number().over(Window.orderBy(F.col("v"), "id")).alias("rn"),
        )
        assert _same(got, exp)

    @pytest.mark.parametrize("n_part", [1, 5, 64])
    def test_running_max_invariant(self, base, n_part):
        from iceberg_rs_spark.operators.distwin import running_max_global

        got = running_max_global(
            base,
            [F.col("v"), F.col("id")],
            "k",
            "m",
            num_partitions=n_part,
            inclusive=False,
        ).select("id", "m")
        w = Window.orderBy("v", "id").rowsBetween(
            Window.unboundedPreceding, -1
        )
        exp = base.select("id", F.max("k").over(w).alias("m"))
        assert _same(got, exp)


class TestGroupedRunningSum:
    def test_restarts_per_group_matches_native(self, base):
        got = running_sum_global(
            base.withColumn("w", F.lit(1).cast("long")),
            [F.col("v"), F.col("id")],
            "w",
            "s",
            group_cols=["k"],
        ).select("id", "s")
        w = (
            Window.partitionBy("k")
            .orderBy("v", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        exp = base.withColumn("w", F.lit(1).cast("long")).select(
            "id", F.sum("w").over(w).alias("s")
        )
        assert _same(got, exp)


class TestPrefixScanKeyed:
    """VERDICT r13 ask #5: the sessionize chunked pattern generalized
    to per-key running aggregates. The native per-key window plan is
    the semantic oracle; prefix_scan_keyed must reproduce it
    bit-for-bit under any partition count (range boundaries move, so
    every arm exercises the boundary stitch), while driver traffic
    stays at one boundary row per partition and no window in the plan
    is partitioned by the bare key."""

    @staticmethod
    def _native(df, keys, order, w_map):
        win = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = df
        for oc, w in w_map.items():
            out = out.withColumn(oc, F.sum(w).over(win))
        return out

    def test_matches_native_random(self, base, spark):
        from iceberg_rs_spark.operators.distwin import prefix_scan_keyed

        w_df = base.withColumn("w", (F.col("v") * 100).cast("long"))
        exp = self._native(w_df, ["k"], ["v", "id"], {"s": "w"}).select(
            "id", "s"
        )
        for parts in (3, 17, 64):
            got = prefix_scan_keyed(
                w_df, "k", [F.col("v"), F.col("id")], "w", "s",
                num_partitions=parts,
            ).select("id", "s")
            assert _same(got, exp), f"mismatch at num_partitions={parts}"

    def test_hot_key_chain_stitches(self, spark):
        """One key holding ~half the rows, forced across many small
        range partitions: every boundary the hot key straddles needs a
        carried-offset correction, including runs of whole partitions
        owned by the key."""
        rng = random.Random(23)
        rows = [(i, 0, rng.random()) for i in range(900)] + [
            (1000 + i, 1 + rng.randint(0, 20), rng.random())
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "id long, k int, v double")
        w_df = df.withColumn("w", F.lit(1).cast("long"))
        exp = self._native(w_df, ["k"], ["id"], {"s": "w"}).select("id", "s")
        from iceberg_rs_spark.operators.distwin import prefix_scan_keyed

        for parts in (8, 48):
            got = prefix_scan_keyed(
                w_df, "k", ["id"], "w", "s", num_partitions=parts
            ).select("id", "s")
            assert _same(got, exp)

    def test_null_keys_and_null_weights_sql_semantics(self, spark):
        """NULL keys form one group; a running sum is NULL only while
        every weight seen so far in its key is NULL — both matching
        the native window bit-for-bit, across the stitch."""
        rows = []
        for i in range(200):
            k = None if i % 3 == 0 else i % 5
            w = None if i % 4 < 2 else i  # leading nulls per key
            rows.append((i, k, w))
        df = spark.createDataFrame(rows, "id long, k int, w long")
        exp = self._native(df, ["k"], ["id"], {"s": "w"}).select("id", "s")
        from iceberg_rs_spark.operators.distwin import prefix_scan_keyed

        got = prefix_scan_keyed(
            df, "k", ["id"], "w", "s", num_partitions=16
        ).select("id", "s")
        assert _same(got, exp)

    def test_multi_weight_and_count_share_one_pass(self, base, spark):
        from iceberg_rs_spark.operators.distwin import prefix_scan_keyed

        w_df = base.withColumn("w1", F.lit(1).cast("long")).withColumn(
            "w2", (F.col("v") * 10).cast("long")
        )
        got = prefix_scan_keyed(
            w_df,
            "k",
            [F.col("v"), F.col("id")],
            ["w1", "w2"],
            ["s1", "s2"],
            num_partitions=11,
            count_col="n",
        ).select("id", "s1", "s2", "n")
        win = (
            Window.partitionBy("k")
            .orderBy("v", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        exp = w_df.select(
            "id",
            F.sum("w1").over(win).alias("s1"),
            F.sum("w2").over(win).alias("s2"),
            F.count("*").over(win).alias("n"),
        )
        assert _same(got, exp)

    def test_multikey_composite(self, spark):
        rng = random.Random(11)
        rows = [
            (i, rng.randint(0, 3), rng.randint(0, 3), rng.random())
            for i in range(600)
        ]
        df = spark.createDataFrame(rows, "id long, a int, b int, v double")
        w_df = df.withColumn("w", F.lit(2).cast("long"))
        exp = self._native(w_df, ["a", "b"], ["v", "id"], {"s": "w"}).select(
            "id", "s"
        )
        from iceberg_rs_spark.operators.distwin import prefix_scan_keyed

        got = prefix_scan_keyed(
            w_df, ["a", "b"], [F.col("v"), F.col("id")], "w", "s",
            num_partitions=13,
        ).select("id", "s")
        assert _same(got, exp)

    def test_no_bare_key_window_in_plan(self, base):
        """The plan contract: every Window node's partition spec
        includes the range-partition id — a hot key can never
        serialize into one task."""
        import re

        from iceberg_rs_spark.operators.distwin import prefix_scan_keyed

        w_df = base.withColumn("w", F.lit(1).cast("long"))
        plan = (
            prefix_scan_keyed(w_df, "k", ["id"], "w", "s", num_partitions=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "_pid" in spec, f"bare-key window spec: {spec}"

    def test_empty_input(self, spark):
        from iceberg_rs_spark.operators.distwin import prefix_scan_keyed

        df = spark.createDataFrame([], "id long, k int, w long")
        assert (
            prefix_scan_keyed(df, "k", ["id"], "w", "s", num_partitions=4).count()
            == 0
        )


class TestConfDerivedDefault:
    """num_partitions=None derives from spark.sql.shuffle.partitions
    (VERDICT r5 #3): parallelism follows the cluster's shuffle sizing,
    not a dev-box literal."""

    def test_default_tracks_shuffle_partitions_conf(self, spark, base):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        try:
            ranged = row_number_global(
                base, [F.col("v"), F.col("id")], "rn"
            )._icelake_packing_cache
            assert ranged is not None
            assert ranged.rdd.getNumPartitions() == 7
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            packing.release_caches()

    def test_explicit_argument_still_wins(self, base):
        ranged = row_number_global(
            base, [F.col("v"), F.col("id")], "rn", num_partitions=5
        )._icelake_packing_cache
        assert ranged.rdd.getNumPartitions() == 5
        packing.release_caches()


class TestRankNoValueFunnel:
    """rank_global's tie resolution must not partition a window by the
    order-value columns — a 3-distinct-value metric would cap
    parallelism at 3 tasks (ADVICE r5 #4). The plan over a
    low-cardinality rank key must carry no Window.partitionBy on it:
    resolution is a grouped min (map-side partial agg) + join back."""

    def test_low_cardinality_rank_matches_native(self, base):
        flag = base.withColumn("f", (F.col("k") % 3).cast("int"))
        got = rank_global(
            flag, [F.col("f"), F.col("id")], ["f"], "r"
        ).select("id", "r")
        exp = flag.select(
            "id", F.rank().over(Window.orderBy("f")).alias("r")
        )
        assert _same(got, exp)

    def test_no_window_partitioned_by_tie_cols(self, base):
        flag = base.withColumn("f", (F.col("k") % 3).cast("int"))
        got = rank_global(flag, [F.col("f"), F.col("id")], ["f"], "r")
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        # the tie min must come from HashAggregate (partial+final), not
        # a Window over partitionBy(f)
        assert "windowspecdefinition(f" not in plan.lower()

    def test_null_tie_values_rank_as_one_group(self, spark, base):
        """SQL RANK() puts NULL order values in one tie group; the
        null-safe join back must KEEP those rows (a plain equi-join
        silently drops every NULL-keyed row)."""
        flag = base.withColumn(
            "f",
            F.when(F.col("k") % 4 == 0, F.lit(None)).otherwise(
                F.col("k") % 3
            ).cast("int"),
        )
        got = rank_global(flag, [F.col("f"), F.col("id")], ["f"], "r")
        exp = flag.select(
            "id", F.rank().over(Window.orderBy("f")).alias("r")
        )
        assert got.count() == flag.count()
        assert _same(got.select("id", "r"), exp)
        packing.release_caches()

    def test_column_expression_tie_cols(self, base):
        """tie_cols accepts Column expressions (the declared
        ``list[str | Column]`` signature): expressions are materialized
        as resolvable temp keys and dropped from the output."""
        got = rank_global(
            base,
            [(F.col("k") % 3).asc(), F.col("id")],
            [F.col("k") % 3],
            "r",
        )
        exp = base.select(
            "id", F.rank().over(Window.orderBy(F.col("k") % 3)).alias("r")
        )
        assert _same(got.select("id", "r"), exp)
        assert all(not c.startswith("_tie") for c in got.columns)
        packing.release_caches()


class TestRandomizedDifferential:
    """Property-based cross-check of every distwin operator against the
    native single-partition window on adversarial SMALL frames — heavy
    tie blocks, NULL order keys, negative/zero weights, n < num_partitions,
    n < ntile buckets — shapes a fixed 1201-row fixture cannot cover.
    The native ``Window.orderBy`` result is the semantic oracle; the
    two-pass scheme must reproduce it on every generated input."""

    @staticmethod
    def _sorted_rows(df):
        return sorted(map(tuple, df.collect()), key=lambda t: tuple(
            (v is None, v) for v in t
        ))

    def _check_all(self, spark, rows):
        from hypothesis import assume

        from iceberg_rs_spark.operators.distwin import running_max_global

        assume(len(rows) >= 1)
        data = [(i, k, v, w) for i, (k, v, w) in enumerate(rows)]
        df = spark.createDataFrame(data, "id long, k int, v int, w long")
        n = len(data)
        inc = Window.orderBy("v", "id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        exc = Window.orderBy("v", "id").rowsBetween(
            Window.unboundedPreceding, -1
        )
        try:
            got = row_number_global(
                df, [F.col("v"), F.col("id")], "rn", num_partitions=4
            ).select("id", "rn")
            exp = df.select(
                "id", F.row_number().over(Window.orderBy("v", "id")).alias("rn")
            )
            assert self._sorted_rows(got) == self._sorted_rows(exp)

            got = rank_global(
                df, [F.col("k"), F.col("id")], ["k"], "r", num_partitions=4
            ).select("id", "r")
            exp = df.select("id", F.rank().over(Window.orderBy("k")).alias("r"))
            assert self._sorted_rows(got) == self._sorted_rows(exp)

            for nt in (1, 3, n + 2):  # n + 2 > n rows: first-N-tiles fill rule
                got = ntile_global(
                    df, nt, [F.col("v"), F.col("id")], num_partitions=4
                ).select("id", "tile")
                exp = df.select(
                    "id",
                    F.ntile(nt).over(Window.orderBy("v", "id")).alias("tile"),
                )
                assert self._sorted_rows(got) == self._sorted_rows(exp), f"ntile({nt})"

            got = running_sum_global(
                df, [F.col("v"), F.col("id")], "w", "s", num_partitions=4
            ).select("id", "s")
            exp = df.select("id", F.sum("w").over(inc).alias("s"))
            assert self._sorted_rows(got) == self._sorted_rows(exp)

            got = running_max_global(
                df,
                [F.col("v"), F.col("id")],
                "k",
                "m",
                num_partitions=4,
                inclusive=False,
            ).select("id", "m")
            exp = df.select("id", F.max("k").over(exc).alias("m"))
            assert self._sorted_rows(got) == self._sorted_rows(exp)
        finally:
            packing.release_caches()

    def test_randomized_frames_match_native(self, spark):
        from hypothesis import HealthCheck, example, given, settings
        from hypothesis import strategies as st

        row = st.tuples(
            st.one_of(st.none(), st.integers(min_value=-2, max_value=2)),
            st.integers(min_value=-5, max_value=5),
            st.integers(min_value=-3, max_value=3),
        )

        @given(rows=st.lists(row, min_size=1, max_size=30))
        @example(rows=[(None, 0, 0)])                 # one all-NULL-key row
        @example(rows=[(1, 2, 1)] * 7)                # one total tie block
        @example(rows=[(None, -5, -3), (None, -5, 3), (0, -5, 0)])
        @settings(
            max_examples=5,  # + the 3 pinned examples; each example runs
            # 7 operator comparisons, so the budget is Spark-job count,
            # not hypothesis's default example volume
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        def run(rows):
            self._check_all(spark, rows)

        run()


class TestEmptyInput:
    """Zero-row frames flow through the two-pass scheme without error
    and yield zero rows — the degenerate case a pipeline hits when an
    upstream filter drains a partition of the corpus."""

    def test_all_operators_empty(self, spark):
        from iceberg_rs_spark.operators.distwin import running_max_global
        from iceberg_rs_spark.operators.packing import with_global_offset

        df = spark.createDataFrame([], "id long, k int, v int, w long")
        try:
            assert row_number_global(df, [F.col("v"), F.col("id")], "rn").count() == 0
            assert rank_global(df, [F.col("k"), F.col("id")], ["k"], "r").count() == 0
            assert ntile_global(df, 3, [F.col("v"), F.col("id")]).count() == 0
            assert (
                running_sum_global(df, [F.col("v"), F.col("id")], "w", "s").count()
                == 0
            )
            assert (
                running_max_global(df, [F.col("v"), F.col("id")], "k", "m").count()
                == 0
            )
            assert (
                with_global_offset(df, [F.col("v"), F.col("id")], "w").count() == 0
            )
        finally:
            packing.release_caches()


class TestPackBinsRandomized:
    """pack_bins against an INDEPENDENT python prefix-sum oracle (not a
    Spark window): randomized per-group weight streams, zero weights,
    bins smaller/larger than any document, groups with one row."""

    def test_pack_bins_matches_python_prefix_sum(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from iceberg_rs_spark.operators.packing import pack_bins

        row = st.tuples(
            st.integers(min_value=0, max_value=1),   # group
            st.integers(min_value=0, max_value=7),   # weight (0 allowed)
        )

        @given(
            rows=st.lists(row, min_size=1, max_size=25),
            ctx=st.sampled_from([1, 3, 8]),
        )
        @settings(
            max_examples=6,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        def run(rows, ctx):
            data = [(i, g, w) for i, (g, w) in enumerate(rows)]
            df = spark.createDataFrame(data, "id long, g int, w long")
            try:
                got = {
                    (r["g"], r["id"]): r["bin"]
                    for r in pack_bins(
                        df, "id", "w", ctx, num_partitions=3, group_cols=["g"]
                    ).collect()
                }
            finally:
                packing.release_caches()
            exp = {}
            offsets = {0: 0, 1: 0}
            for i, g, w in sorted(data):
                exp[(g, i)] = offsets[g] // ctx
                offsets[g] += w
            assert got == exp

        run()
