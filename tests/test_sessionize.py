"""Differential pins for the skew-proof sessionization operator
(operators/sessionize.py — the r13 window-skew audit's fix).

The distributed chunked plan must match the classic per-key window
plan bit-for-bit: same session counts for every user, under any
partition count (the range boundaries land in different places, so
partitioning invariance exercises the edge-correction stitch), on
random data, on a hot-key distribution, and at the exact-gap boundary
(FIXTURES rule 10: == gap merges, only strictly greater splits).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import Row

from iceberg_rs_spark.operators.sessionize import (
    session_counts_distributed,
    session_counts_window,
)

T0 = dt.datetime(2024, 1, 1)


def _events_df(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=ts) for i, (u, ts) in enumerate(rows)]
    )


def _counts(df):
    return {
        r["user_id"]: (r["n_sessions"], r["n_events"]) for r in df.collect()
    }


class TestSessionizeDistributed:
    def test_matches_window_plan_random(self, spark):
        rng = random.Random(7)
        rows = [
            (
                rng.randrange(40),
                T0 + dt.timedelta(seconds=rng.randrange(30 * 86_400)),
            )
            for _ in range(4_000)
        ]
        df = _events_df(spark, rows)
        want = _counts(session_counts_window(df, gap="2 hours"))
        for parts in (3, 17, 64):
            got = _counts(
                session_counts_distributed(
                    df, gap="2 hours", num_partitions=parts
                )
            )
            assert got == want, f"mismatch at num_partitions={parts}"

    def test_matches_window_plan_hot_key(self, spark):
        """The regime the operator exists for: one user holding ~half
        the events, its timeline split across many range partitions —
        every cross-partition session continuation must stitch."""
        rng = random.Random(23)
        rows = []
        t = T0
        for i in range(3_000):
            # hot user 0: a dense, gap-riddled timeline
            t += dt.timedelta(seconds=rng.choice([60, 600, 7_201, 10_000]))
            rows.append((0, t))
        for _ in range(1_000):
            rows.append(
                (
                    1 + rng.randrange(20),
                    T0 + dt.timedelta(seconds=rng.randrange(30 * 86_400)),
                )
            )
        df = _events_df(spark, rows)
        want = _counts(session_counts_window(df, gap="2 hours"))
        for parts in (8, 48):
            got = _counts(
                session_counts_distributed(
                    df, gap="2 hours", num_partitions=parts
                )
            )
            assert got == want

    def test_exact_gap_merges_strictly_greater_splits(self, spark):
        """FIXTURES rule 10 at the operator level: events exactly
        `gap` apart form ONE session; one second more opens a new
        one — including when the chain crosses partition boundaries
        (64 partitions over 12 rows forces fragments)."""
        gap = dt.timedelta(hours=2)
        exact = [(5, T0 + i * gap) for i in range(6)]
        split = [
            (6, T0 + i * (gap + dt.timedelta(seconds=1))) for i in range(6)
        ]
        df = _events_df(spark, exact + split)
        got = _counts(
            session_counts_distributed(df, gap="2 hours", num_partitions=64)
        )
        assert got[5] == (1, 6)
        assert got[6] == (6, 6)
        assert got == _counts(session_counts_window(df, gap="2 hours"))

    def test_subsecond_gaps_agree_between_plans(self, spark):
        """ADVICE r13 #1: the window plan's gap must be exact
        fractional seconds, not unix_timestamp whole-second
        truncation. A gap of gap+0.5s SPLITS and a gap of gap-0.5s
        (and exactly gap, with fractional components) MERGES — in
        BOTH plans, identically."""
        gap = dt.timedelta(minutes=30)
        half = dt.timedelta(milliseconds=500)
        rows = [
            # user 7: chains split by gap + 0.5s — truncation would
            # read the gap as exactly 1800s and merge them all
            (7, T0),
            (7, T0 + gap + half),
            (7, T0 + 2 * (gap + half)),
            # user 8: gap - 0.5s merges; fractional starting offset
            (8, T0 + half),
            (8, T0 + half + gap - half),
            # user 9: EXACTLY gap apart with fractional endpoints —
            # one session (FIXTURES rule 10 at sub-second resolution)
            (9, T0 + half),
            (9, T0 + half + gap),
        ]
        df = _events_df(spark, rows)
        win = _counts(session_counts_window(df, gap="30 minutes"))
        dist = _counts(
            session_counts_distributed(df, gap="30 minutes", num_partitions=5)
        )
        assert win == dist
        assert win[7] == (3, 3)
        assert win[8] == (1, 2)
        assert win[9] == (1, 2)

    def test_single_row_users_and_default_partitions(self, spark):
        df = _events_df(spark, [(u, T0) for u in range(5)])
        got = _counts(session_counts_distributed(df))
        assert got == {u: (1, 1) for u in range(5)}

    def test_no_per_key_window_in_plan(self, spark):
        """The plan contract: no window operator anywhere — the whole
        point is that a hot key can never serialize into one task."""
        df = _events_df(spark, [(0, T0), (0, T0 + dt.timedelta(hours=3))])
        plan = session_counts_distributed(df)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
