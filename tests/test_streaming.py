"""Streaming behavior tests the batch-replay corpus can't express:
watermark semantics across restarts (late-data drop, bounded dedup
state) and the foreachBatch → icelake table sink (the engine's
"Iceberg sink", one `append` snapshot per epoch — reference
snapshot.rs:19).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_rs_spark.sources.fixtures import load_table
from iceberg_rs_spark.sources.icelake import Catalog
from iceberg_rs_spark.streaming import events_stream, replay_to_memory

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_once(spark, src, chk, plan_fn, mode):
    """One availableNow run over the source directory with a persistent
    checkpoint — restarting continues from the stored offsets and
    watermark, exactly like a long-running production query. The sink
    is foreachBatch (memory sink cannot recover from a checkpoint);
    emitted rows are collected driver-side."""
    emitted: list = []
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        plan_fn(stream)
        .writeStream.foreachBatch(lambda df, _eid: emitted.extend(df.collect()))
        .option("checkpointLocation", chk)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return emitted


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


class TestWatermarkSemantics:
    def test_late_rows_below_watermark_are_dropped(self, spark, tmp_path):
        """Append-mode tumbling agg: after run 1 the checkpointed
        watermark passes 10:00; a 09:30 event arriving in run 2 must
        not reopen the 09:00 window."""
        src, chk = str(tmp_path / "src"), str(tmp_path / "chk")

        def plan(stream):
            return (
                stream.withWatermark("ts", "30 minutes")
                .groupBy(F.window("ts", "1 hour"))
                .agg(F.count("*").alias("n"))
                .select(F.col("window.start").alias("ws"), "n")
            )

        _write_batch(
            spark,
            src,
            [Row(event_id=1, ts=_ts(9, 10), value=1.0),
             Row(event_id=2, ts=_ts(11, 50), value=1.0)],
        )
        out1 = _run_once(spark, src, chk, plan, "append")
        # watermark after run 1 = 11:50 - 0:30 = 11:20 → 09:00 window closed
        assert {(r.ws.hour, r.n) for r in out1} == {(9, 1)}

        _write_batch(
            spark,
            src,
            [Row(event_id=3, ts=_ts(9, 30), value=1.0),   # late: below watermark
             Row(event_id=4, ts=_ts(11, 55), value=1.0)],  # on time, window open
        )
        out2 = _run_once(spark, src, chk, plan, "append")
        hours = {r.ws.hour for r in out2}
        assert 9 not in hours, "late event reopened a closed window"

    def test_dedup_state_evicted_past_watermark(self, spark, tmp_path):
        """dropDuplicatesWithinWatermark keyed state is bounded: a key
        re-appearing after its expiry (first-seen ts + delay) passes
        the watermark is emitted again, while an in-window duplicate
        is suppressed. (Plain dropDuplicates would suppress forever —
        and grow state forever.)"""
        src, chk = str(tmp_path / "src"), str(tmp_path / "chk")

        def plan(stream):
            return stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
                ["event_id"]
            )

        _write_batch(
            spark,
            src,
            [Row(event_id=1, ts=_ts(9), value=1.0),
             Row(event_id=1, ts=_ts(9, 5), value=2.0),  # duplicate, suppressed
             Row(event_id=2, ts=_ts(12), value=3.0)],
        )
        out1 = _run_once(spark, src, chk, plan, "append")
        assert sorted(r.event_id for r in out1) == [1, 2]

        # run 2: id 1's state expired at 09:30 (first-seen + delay) and
        # the checkpointed watermark is 11:30, so the 13:00
        # re-occurrence is a brand-new key and is emitted again
        _write_batch(spark, src, [Row(event_id=1, ts=_ts(13), value=4.0)])
        out2 = _run_once(spark, src, chk, plan, "append")
        assert [r.event_id for r in out2] == [1]

        # run 3: the 13:00 occurrence re-armed state until 13:30, and
        # the watermark (12:30) hasn't passed it — 14:00 is suppressed
        _write_batch(spark, src, [Row(event_id=1, ts=_ts(14), value=5.0)])
        out3 = _run_once(spark, src, chk, plan, "append")
        assert [r.event_id for r in out3] == []


class TestIcelakeSink:
    def test_foreach_batch_appends_one_snapshot_per_epoch(
        self, spark, tmp_path, sf_dir
    ):
        """Stream → foreachBatch → icelake append: final table equals
        the batch read, and each epoch committed one `append` snapshot
        (the reference's snapshot operation semantics)."""
        events = load_table(spark, sf_dir, "events")
        catalog = Catalog(spark, str(tmp_path / "wh"))
        table = catalog.create_table("db.events_sink", events.schema)

        def sink(batch_df, epoch_id):
            table.append(batch_df)

        q = (
            events_stream(spark, sf_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        got = table.scan().agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s")
        ).collect()[0]
        exp = events.agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s")
        ).collect()[0]
        assert (got.n, got.s) == (exp.n, exp.s)
        ops = [r["operation"] for r in table.snapshots().collect()]
        assert set(ops) == {"append"} and len(ops) >= 1


class TestReplayToIcelake:
    def test_batch_id_idempotence(self, spark, sf_dir, tmp_path):
        """Replaying the same stream twice must not duplicate rows: the
        second delivery's micro-batch ids are already recorded in the
        snapshot summaries and are skipped (the at-least-once →
        effectively-once upgrade for append-only foreachBatch sinks)."""
        from iceberg_rs_spark.sources.icelake import Catalog
        from iceberg_rs_spark.streaming import events_stream, replay_to_icelake

        ev = events_stream(spark, sf_dir).select("event_id", "event_type", "value")
        catalog = Catalog(spark, str(tmp_path / "wh"))
        t = catalog.create_table("db.ing", ev.schema)
        replay_to_icelake(ev, t)
        n1 = t.to_df().count()
        assert n1 > 0
        snaps1 = len(t.metadata.snapshots)
        assert any("streaming-batch-id" in s.summary for s in t.metadata.snapshots)
        replay_to_icelake(ev, t)  # re-delivery: same batch ids
        assert t.to_df().count() == n1
        assert len(t.metadata.snapshots) == snaps1


class TestReplayHarness:
    def test_memory_sink_names_are_unique_per_run(self, spark, sf_dir):
        ev = events_stream(spark, sf_dir).groupBy("event_type").count()
        t1 = replay_to_memory(ev, "uniq", "complete")
        t2 = replay_to_memory(ev, "uniq", "complete")
        assert t1.count() == t2.count() > 0


class TestCdcUpsertSink:
    def test_multi_batch_last_writer_wins(self, spark, tmp_path):
        """Three CDC files streamed one-per-trigger: each micro-batch
        is one merge-on-read commit, later batches' versions replace
        earlier ones by sequence ordering, and within a batch only the
        newest row per key lands."""
        from iceberg_rs_spark.streaming import replay_cdc_to_icelake

        src = tmp_path / "cdc"
        src.mkdir()
        base = dt.datetime(2024, 1, 1)

        def write_file(name, rows):
            spark.createDataFrame(
                [Row(event_id=i, ts=base + dt.timedelta(minutes=m), value=v)
                 for (i, m, v) in rows],
                SCHEMA,
            ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

        # key = event_id; file 1: keys 1,2; file 2: re-upserts key 1
        # (twice in-batch — only minute 20 may win); file 3: key 3
        write_file("f1", [(1, 0, 1.0), (2, 0, 2.0)])
        write_file("f2", [(1, 10, 10.0), (1, 20, 20.0)])
        write_file("f3", [(3, 30, 3.0)])

        catalog = Catalog(spark, str(tmp_path / "wh"))
        t = catalog.create_table("db.cdc", SCHEMA)
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        replay_cdc_to_icelake(stream, t, keys=["event_id"], order=["ts"])

        got = {r.event_id: r.value for r in t.to_df().collect()}
        assert got == {1: 20.0, 2: 2.0, 3: 3.0}
        # one merge-on-read commit per micro-batch, each with eq-deletes
        merges = [
            s for s in t.metadata.snapshots
            if "streaming-batch-id" in s.summary
        ]
        assert len(merges) == 3
        assert all(int(s.summary["added-delete-files"]) >= 1 for s in merges)
        # no data file was ever rewritten: every committed one survives
        files = t.files().collect()
        assert sum(1 for r in files if r.content == "data") == 3
        assert sum(1 for r in files if r.content == "equality-deletes") == 3
        # compaction folds it all down
        t.compact(target_file_size_bytes=1)
        assert t.files().where("content != 'data'").count() == 0
        assert {r.event_id: r.value for r in t.to_df().collect()} == got


class TestSessionGapBoundary:
    def test_exact_gap_merges_strictly_greater_splits(self, spark):
        """Spark session_window's TRUE gap boundary, pinned empirically
        (found by the r8 randomized streaming differential): an event
        at EXACTLY start+gap merges into the session, one second past
        it starts a new session. Every sessionization oracle in the
        corpus uses the strictly-greater convention to match."""
        import datetime as dtm

        from pyspark.sql import functions as F

        base = dtm.datetime(2024, 3, 1, 0, 0, 0)
        rows = [
            (1, 1, base, 1.0),
            (2, 1, base + dtm.timedelta(seconds=7200), 1.0),   # exact gap
            (3, 2, base, 1.0),
            (4, 2, base + dtm.timedelta(seconds=7201), 1.0),   # gap + 1s
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )
        out = (
            df.groupBy(F.session_window("ts", "2 hours"), "user_id")
            .agg(F.count("*").alias("n"))
            .groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"))
        )
        got = {r.user_id: r.n_sessions for r in out.collect()}
        assert got == {1: 1, 2: 2}


class TestRandomizedStreamingDifferential:
    """Randomized multi-micro-batch differential for the streaming
    ops: random events split across files (maxFilesPerTrigger=1 forces
    one micro-batch per file, so state genuinely carries across
    batches) replayed to completion and compared against plain python
    oracles. Values are multiples of 0.25 so float sums are exact in
    both engines regardless of summation order."""

    GAP_S = 2 * 3600  # session gap, matches session_agg's "2 hours"

    def _write_batches(self, spark, tmp_path, rows, n_files=4):
        import math

        src = tmp_path / "stream_src"
        src.mkdir()
        per = math.ceil(len(rows) / n_files)
        schema = "event_id long, user_id long, ts timestamp, value double"
        for b in range(n_files):
            chunk = rows[b * per : (b + 1) * per]
            if chunk:
                spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(str(src / f"batch_{b}.parquet"))
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/batch_*")
        )
        return raw

    @staticmethod
    def _gen(seed):
        import datetime as dtm
        import random

        rnd = random.Random(seed)
        base = dtm.datetime(2024, 3, 1, 0, 0, 0)
        rows = []
        eid = 0
        for user in range(5):
            t = base + dtm.timedelta(minutes=rnd.randrange(0, 180))
            for _ in range(rnd.randint(3, 12)):
                # mixture of in-session gaps and > gap jumps; the
                # exact-GAP_S jump exercises the merge side of the
                # boundary (exact gap MERGES; only strictly greater
                # splits — FIXTURES.md rule 10)
                jump = rnd.choice([60, 600, 1800, 7200, 7200, 9000, 20000])
                t = t + dtm.timedelta(seconds=jump)
                rows.append((eid, user, t, rnd.randrange(0, 40) * 0.25))
                eid += 1
        rnd.shuffle(rows)  # arrival order decoupled from event time
        return rows

    def _session_oracle(self, rows):
        import datetime as dtm
        from collections import defaultdict

        by_user = defaultdict(list)
        for _eid, user, ts, val in rows:
            by_user[user].append((ts, val))
        out = []
        for user, evs in by_user.items():
            evs.sort()
            start, n, tot, prev = None, 0, 0.0, None
            for ts, val in evs:
                # strictly greater: an exact-gap event merges (Spark
                # session_window semantics, TestSessionGapBoundary)
                if start is None or (ts - prev).total_seconds() > self.GAP_S:
                    if start is not None:
                        out.append((user, start, n, round(tot, 2)))
                    start, n, tot = ts, 0, 0.0
                n += 1
                tot += val
                prev = ts
            out.append((user, start, n, round(tot, 2)))
        return sorted(
            (u, s.strftime("%Y-%m-%d %H:%M:%S"), n, t) for u, s, n, t in out
        )

    def test_session_windows_match_python_oracle(self, spark, tmp_path):
        from iceberg_rs_spark.streaming.ops import replay_to_memory, session_agg

        rows = self._gen(seed=7)
        stream = self._write_batches(spark, tmp_path, rows)
        got = sorted(
            (r.user_id, r.session_start, r.n_events, r.sum_value)
            for r in replay_to_memory(
                session_agg(stream), "rand_sessions", "complete"
            ).collect()
        )
        assert got == self._session_oracle(rows)

    def test_stateful_session_counts_across_batches(self, spark, tmp_path):
        """Cross-batch continuation of the arbitrary-state sessionizer:
        batches are event-time-ordered (the operator's declared arrival
        contract) but shuffled WITHIN each batch, and session
        boundaries land both inside and astride micro-batch cuts. A
        state that forgot the last event time would count every batch
        head as a new session (the pre-fix behavior); the python
        oracle is plain global gaps-and-islands with the > boundary."""
        import math
        import random
        from collections import defaultdict

        from iceberg_rs_spark.streaming.ops import (
            replay_to_memory,
            stateful_session_counts,
        )

        rows = sorted(self._gen(seed=43), key=lambda r: (r[2], r[0]))
        # shuffle inside each batch chunk only: intra-batch disorder is
        # sorted away by the operator; batch-monotone arrival is its
        # declared contract
        n_files = 6
        per = math.ceil(len(rows) / n_files)
        rnd = random.Random(91)
        chunks = [rows[b * per : (b + 1) * per] for b in range(n_files)]
        shuffled = []
        for chunk in chunks:
            rnd.shuffle(chunk)
            shuffled.extend(chunk)
        # the fixture must actually exercise cross-batch continuation:
        # at least one user's session straddles a batch cut (a state
        # that forgot the last event time would split it)
        straddles = 0
        for prev_chunk, cur_chunk in zip(chunks, chunks[1:]):
            last = {u: ts for _e, u, ts, _v in sorted(prev_chunk, key=lambda r: r[2])}
            first = {}
            for _e, u, ts, _v in sorted(cur_chunk, key=lambda r: r[2]):
                first.setdefault(u, ts)
            straddles += sum(
                1
                for u, ts in first.items()
                if u in last and (ts - last[u]).total_seconds() <= self.GAP_S
            )
        assert straddles > 0, "fixture never exercises cross-batch continuation"

        stream = self._write_batches(spark, tmp_path, shuffled, n_files=n_files)
        upd = replay_to_memory(
            stateful_session_counts(stream), "rand_stateful_sessions", "update"
        )
        # update mode emits one row per key per batch; counters are
        # monotone, so the final state is the per-key max
        got = {
            r.user_id: (r.n_sessions, r.n_events)
            for r in upd.groupBy("user_id")
            .agg(
                F.max("n_sessions").alias("n_sessions"),
                F.max("n_events").alias("n_events"),
            )
            .collect()
        }
        by_user = defaultdict(list)
        for _eid, user, ts, _val in rows:
            by_user[user].append(ts)
        exp = {}
        for user, tss in by_user.items():
            tss.sort()
            n_sessions, prev = 0, None
            for ts in tss:
                if prev is None or (ts - prev).total_seconds() > self.GAP_S:
                    n_sessions += 1
                prev = ts
            exp[user] = (n_sessions, len(tss))
        assert got == exp

    def test_stateful_session_counts_across_restarts(self, spark, tmp_path):
        """Checkpoint-recovery dimension for the custom sessionizer:
        the same event-time-ordered feed is delivered across THREE
        separate availableNow runs sharing one checkpoint, so the
        GroupState (counters + last event time) must round-trip through
        the state store between query restarts — a different surface
        from micro-batch handoff inside one run. A session straddling a
        RUN boundary must not split; the oracle is the same global
        gaps-and-islands count."""
        import math
        from collections import defaultdict

        from iceberg_rs_spark.streaming.ops import stateful_session_counts

        rows = sorted(self._gen(seed=29), key=lambda r: (r[2], r[0]))
        n_runs = 3
        per = math.ceil(len(rows) / n_runs)
        src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
        schema = "event_id long, user_id long, ts timestamp, value double"
        final: dict[int, tuple[int, int]] = {}
        for run in range(n_runs):
            chunk = rows[run * per : (run + 1) * per]
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            stream = spark.readStream.schema(schema).parquet(src)
            updates: list = []
            q = (
                stateful_session_counts(stream)
                .writeStream.foreachBatch(
                    lambda df, _eid: updates.extend(df.collect())
                )
                .option("checkpointLocation", chk)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            for r in updates:
                final[r.user_id] = (r.n_sessions, r.n_events)

        by_user = defaultdict(list)
        for _eid, user, ts, _val in rows:
            by_user[user].append(ts)
        exp = {}
        for user, tss in by_user.items():
            tss.sort()
            n_sessions, prev = 0, None
            for ts in tss:
                if prev is None or (ts - prev).total_seconds() > self.GAP_S:
                    n_sessions += 1
                prev = ts
            exp[user] = (n_sessions, len(tss))
        assert final == exp

    def test_stateful_session_counts_late_batch_never_rewinds(self, spark, tmp_path):
        """A batch delivered entirely OLDER than the stored anchor
        (violating the batch-monotone contract) must merge into the
        latest session without rewinding the state's last event time.
        Pre-clamp, the rewound anchor made the NEXT in-gap batch look
        out-of-gap and split the session: 10:00/10:30 → late 08:00 →
        11:30 counted 2 sessions instead of 1. Three availableNow runs
        over one checkpoint give deterministic batch boundaries."""
        import datetime as dt

        from iceberg_rs_spark.streaming.ops import stateful_session_counts

        base = dt.datetime(2024, 3, 1, 10, 0, 0)
        batches = [
            [(1, 1, base, 1.0), (2, 1, base + dt.timedelta(minutes=30), 1.0)],
            [(3, 1, base - dt.timedelta(hours=2), 1.0)],  # fully late
            [(4, 1, base + dt.timedelta(minutes=90), 1.0)],  # in-gap of 10:30
        ]
        src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
        schema = "event_id long, user_id long, ts timestamp, value double"
        final: dict[int, tuple[int, int]] = {}
        for chunk in batches:
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            stream = spark.readStream.schema(schema).parquet(src)
            updates: list = []
            q = (
                stateful_session_counts(stream)
                .writeStream.foreachBatch(
                    lambda df, _eid: updates.extend(df.collect())
                )
                .option("checkpointLocation", chk)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            for r in updates:
                final[r.user_id] = (r.n_sessions, r.n_events)
        assert final == {1: (1, 4)}

    def test_tumbling_windows_match_python_oracle(self, spark, tmp_path):
        from collections import defaultdict

        from iceberg_rs_spark.streaming.ops import replay_to_memory

        from pyspark.sql import functions as F

        rows = self._gen(seed=19)
        stream = self._write_batches(spark, tmp_path, rows)
        # per-user hourly tumbling (the fixture op groups by event_type,
        # which this synthetic schema doesn't carry — group by user)
        agg = (
            stream.groupBy(F.window("ts", "1 hour"), "user_id")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
            .select(
                F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("ws"),
                "user_id", "n", "sv",
            )
        )
        got = sorted(
            (r.ws, r.user_id, r.n, r.sv)
            for r in replay_to_memory(agg, "rand_tumbling", "complete").collect()
        )
        acc = defaultdict(lambda: [0, 0.0])
        for _eid, user, ts, val in rows:
            ws = ts.replace(minute=0, second=0, microsecond=0)
            k = (ws.strftime("%Y-%m-%d %H:%M:%S"), user)
            acc[k][0] += 1
            acc[k][1] += val
        exp = sorted((w, u, n, round(t, 2)) for (w, u), (n, t) in acc.items())
        assert got == exp

    def test_stream_stream_interval_join_across_batches(self, spark, tmp_path):
        """Stream-stream inner interval join with the two sides'
        matching rows scattered across DIFFERENT micro-batches in
        random arrival order — the join buffer must hold early rows
        until their partner arrives batches later. Event times are
        bounded within 30 min under the 1 h watermark (like the dedup
        test), so no buffered row can be evicted and the final append
        output must equal the full batch join; the python oracle is
        the quadratic all-pairs check. Crafted rows pin the interval
        boundary: r_ts == l_ts + interval matches (inclusive),
        one second past it does not."""
        import random

        import datetime as dtm

        from iceberg_rs_spark.streaming.ops import (
            replay_to_memory,
            stream_stream_interval_join,
        )

        rnd = random.Random(61)
        base = dtm.datetime(2024, 3, 1, 12, 0, 0)
        rows = [
            (
                eid,
                rnd.randrange(5),
                base + dtm.timedelta(seconds=rnd.randrange(1800)),
                rnd.randrange(0, 40) * 0.25,
            )
            for eid in range(40)
        ]
        # boundary pins for user 4: even ids are the left side below
        t0 = base + dtm.timedelta(seconds=100)
        rows += [
            (100, 4, t0, 1.0),                              # left
            (101, 4, t0 + dtm.timedelta(seconds=600), 1.0),  # exactly at interval: match
            (103, 4, t0 + dtm.timedelta(seconds=601), 1.0),  # one past: no match
        ]
        rnd.shuffle(rows)  # partners land in arbitrary micro-batches
        stream = self._write_batches(spark, tmp_path, rows, n_files=6)
        joined = stream_stream_interval_join(
            stream.where("event_id % 2 = 0"),
            stream.where("event_id % 2 = 1"),
            key="user_id",
            interval="10 minutes",
            watermark="1 hour",
        )
        got = sorted(
            (r.l_id, r.r_id)
            for r in replay_to_memory(
                joined.select("l_id", "r_id"), "rand_ssjoin", "append"
            ).collect()
        )
        exp = sorted(
            (le, re)
            for le, lu, lt, _lv in rows
            if le % 2 == 0
            for re, ru, rt, _rv in rows
            if re % 2 == 1
            and ru == lu
            and lt <= rt <= lt + dtm.timedelta(minutes=10)
        )
        assert (100, 101) in exp and (100, 103) not in exp  # boundary fixture live
        assert got == exp

    def test_stream_stream_left_outer_join_closed_windows_only(
        self, spark, tmp_path
    ):
        """Randomized differential for the LEFT OUTER interval join —
        the eviction path the inner-join sweep above deliberately never
        reaches (its event times are bounded under the watermark). Here
        random rows span 4 hours under a 30 min watermark, so old
        unmatched left rows MUST be evicted and emitted with NULL right
        columns while still-open windows must stay buffered forever.

        Arrival is in EVENT-TIME order (rows sorted before batching):
        no input row is ever late, so the python oracle is exact —
        matched pairs are the quadratic all-pairs interval check, and a
        NULL row appears iff the left has no partner AND its window
        provably closed under the final global watermark
        W = min(max left ts, max right ts) - delay (the
        multipleWatermarkPolicy=min rule: the slower side gates
        eviction for both). Two availableNow passes over one
        checkpoint drain the final no-data batch (ops.py
        replay_to_parquet). Data rows sit at odd-second offsets and
        both sides' maxima at whole minutes, so no window boundary can
        equal W and eviction strictness cannot flake the oracle."""
        import random

        import datetime as dtm

        from iceberg_rs_spark.streaming.ops import (
            replay_to_parquet,
            stream_stream_interval_join,
        )

        rnd = random.Random(83)
        base = dtm.datetime(2024, 3, 1, 12, 0, 0)
        interval = dtm.timedelta(minutes=10)
        delay = dtm.timedelta(minutes=30)
        rows = [
            (
                eid,
                rnd.randrange(4),
                base
                + dtm.timedelta(
                    minutes=rnd.randrange(240), seconds=2 * rnd.randrange(30) + 1
                ),
                1.0,
            )
            for eid in range(48)
        ]
        # whole-minute maxima pins (even ids = left, odd = right): the
        # global watermark lands at min(maxL, maxR) - 30 min exactly on
        # a minute, away from every odd-second window boundary
        rows += [
            (200, 0, base + dtm.timedelta(minutes=250), 1.0),  # left max
            (201, 0, base + dtm.timedelta(minutes=246), 1.0),  # right max
        ]
        # eviction-boundary pins on a user nobody else has: W closes at
        # min(250, 246) - 30 = base+216 min; a lone left 1 s below the
        # close boundary must emit NULL, 1 s above must stay buffered
        w_final = base + dtm.timedelta(minutes=216)
        rows += [
            (210, 9, w_final - interval - dtm.timedelta(seconds=1), 1.0),
            (212, 9, w_final - interval + dtm.timedelta(seconds=1), 1.0),
        ]
        rows.sort(key=lambda r: r[2])  # in-order arrival: nothing late
        stream = self._write_batches(spark, tmp_path, rows, n_files=6)
        joined = stream_stream_interval_join(
            stream.where("event_id % 2 = 0"),
            stream.where("event_id % 2 = 1"),
            key="user_id",
            interval="10 minutes",
            watermark="30 minutes",
            how="left_outer",
        )
        got = sorted(
            (r.l_id, r.r_id)
            for r in replay_to_parquet(
                joined.select("l_id", "r_id"), "rand_ssouter", passes=2
            ).collect()
        )
        lefts = [(e, u, t) for e, u, t, _ in rows if e % 2 == 0]
        rights = [(e, u, t) for e, u, t, _ in rows if e % 2 == 1]
        assert w_final == min(
            max(t for *_, t in lefts), max(t for *_, t in rights)
        ) - delay
        # oracle safety: no left window boundary may EQUAL the final
        # watermark, or eviction strictness decides the row's fate
        assert all(lt + interval != w_final for *_, lt in lefts)
        matched = sorted(
            (le, re)
            for le, lu, lt in lefts
            for re, ru, rt in rights
            if ru == lu and lt <= rt <= lt + interval
        )
        matched_ids = {le for le, _ in matched}
        nulls = sorted(
            (le, None)
            for le, _lu, lt in lefts
            if le not in matched_ids and lt + interval < w_final
        )
        exp = sorted(matched + nulls)
        # vacuity guards: the sweep must exercise matches, closed-window
        # NULLs, AND still-open buffered rows, and both boundary pins
        still_open = [
            le
            for le, _lu, lt in lefts
            if le not in matched_ids and lt + interval > w_final
        ]
        assert matched and nulls and still_open
        assert (210, None) in nulls and 212 in still_open
        assert got == exp

    def test_stateful_dedup_across_batches(self, spark, tmp_path):
        import random

        from iceberg_rs_spark.streaming.ops import replay_to_memory, stateful_dedup

        import datetime as dtm

        rnd = random.Random(31)
        # event times bounded within 30 min — under the 1h watermark
        # delay, so NO row can ever be late-dropped regardless of which
        # micro-batch it lands in (the watermark-drop semantics proper
        # are pinned directly in TestWatermarkSemantics); this test
        # isolates cross-batch duplicate collapse
        base = dtm.datetime(2024, 3, 1, 12, 0, 0)
        rows = [
            (
                eid,
                rnd.randrange(5),
                base + dtm.timedelta(seconds=rnd.randrange(1800)),
                rnd.randrange(0, 40) * 0.25,
            )
            for eid in range(40)
        ]
        # re-deliver ~30% of rows verbatim, shuffled across batches —
        # duplicates must collapse regardless of which micro-batch saw
        # the copy
        dups = [r for r in rows if rnd.random() < 0.3]
        both = rows + dups
        rnd.shuffle(both)
        stream = self._write_batches(spark, tmp_path, both)
        got = sorted(
            (r.event_id, r.user_id, r.ts, r.value)
            for r in replay_to_memory(
                stateful_dedup(stream), "rand_dedup", "append"
            ).collect()
        )
        assert got == sorted(rows)


class TestRandomizedStreamingCDC:
    """Randomized differential for the CDC upsert sink, mirroring what
    the r8 randomized layer did for session windows: random change
    streams with heavy key collisions and out-of-order event times
    split across micro-batches, replayed through replay_cdc_to_icelake
    and reconciled against a dict oracle applied batch-by-batch — with
    time travel to every merge commit and a verbatim re-delivery that
    must be a no-op. The CDC contract under test: within a batch the
    max (ts, event_id) version of a key wins; ACROSS batches the later
    commit wins unconditionally (the stream IS the change order —
    sequence numbers, not event time, order commits)."""

    CDC_SCHEMA = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def _gen_batches(self, seed, n_keys=6, n_batches=7, rows_per=8):
        import random

        rnd = random.Random(seed)
        base = dt.datetime(2024, 5, 1)
        eid = 0
        batches = []
        for _b in range(n_batches):
            rows = []
            for _ in range(rnd.randint(1, rows_per)):
                u = rnd.randrange(n_keys)  # heavy collisions
                # event time is random, NOT monotone with batch index:
                # a later batch may carry an older ts and must still win
                ts = base + dt.timedelta(minutes=rnd.randrange(0, 600))
                rows.append((u, eid, ts, rnd.randrange(0, 40) * 0.25))
                eid += 1
            if rnd.random() < 0.5:
                # same key twice in one batch with IDENTICAL ts:
                # event_id is the declared tiebreaker
                u, _e, ts, v = rows[0]
                rows.append((u, eid, ts, v + 0.25))
                eid += 1
            batches.append(rows)
        return batches

    @staticmethod
    def _oracle_states(batches):
        """Upsert-dict state after each batch."""
        state, states = {}, []
        for rows in batches:
            latest = {}
            for u, e, ts, v in rows:
                cur = latest.get(u)
                if cur is None or (ts, e) > (cur[1], cur[0]):
                    latest[u] = (e, ts, v)
            state.update(latest)
            states.append(dict(state))
        return states

    @staticmethod
    def _table_state(t, snapshot_id=None):
        return {
            r.user_id: (r.event_id, r.ts, r.value)
            for r in t.scan(snapshot_id=snapshot_id).collect()
        }

    def test_random_cdc_stream_matches_dict_oracle(self, spark, tmp_path):
        from iceberg_rs_spark.streaming import replay_cdc_to_icelake

        batches = self._gen_batches(seed=53)
        states = self._oracle_states(batches)
        src = tmp_path / "cdc_src"
        src.mkdir()
        for b, rows in enumerate(batches):
            spark.createDataFrame(rows, self.CDC_SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"batch_{b}.parquet"))

        catalog = Catalog(spark, str(tmp_path / "wh"))
        t = catalog.create_table("db.cdc_rand", self.CDC_SCHEMA)

        def replay():
            stream = (
                spark.readStream.schema(self.CDC_SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{src}/batch_*")
            )
            replay_cdc_to_icelake(
                stream, t, keys=["user_id"], order=["ts", "event_id"]
            )

        replay()
        assert self._table_state(t) == states[-1]

        # one merge commit per micro-batch, in batch order — time
        # travel to each must reproduce the oracle's prefix state
        merges = [
            s for s in t.metadata.snapshots if "streaming-batch-id" in s.summary
        ]
        assert len(merges) == len(batches)
        assert [int(s.summary["streaming-batch-id"]) for s in merges] == list(
            range(len(batches))
        )
        for i, snap in enumerate(merges):
            assert self._table_state(t, snapshot_id=snap.snapshot_id) == states[i], (
                f"time travel to merge commit {i} diverged from the dict oracle"
            )

        # verbatim re-delivery: every batch id is already in the
        # ancestry, so the second replay must commit nothing
        n_snaps = len(t.metadata.snapshots)
        replay()
        assert len(t.metadata.snapshots) == n_snaps
        assert self._table_state(t) == states[-1]

    def test_cross_batch_older_event_time_still_wins(self, spark, tmp_path):
        """Directed pin of the contract corner randomized above: a
        later BATCH carrying an older EVENT TIME replaces the row (CDC
        commit order beats event time across batches), while within a
        single batch the newer event time wins."""
        from iceberg_rs_spark.streaming import replay_cdc_to_icelake

        base = dt.datetime(2024, 5, 1)
        batches = [
            [(1, 0, base + dt.timedelta(minutes=50), 1.0)],
            # same key, strictly older ts, later batch -> must win
            [(1, 1, base + dt.timedelta(minutes=10), 2.0)],
        ]
        src = tmp_path / "cdc_src"
        src.mkdir()
        for b, rows in enumerate(batches):
            spark.createDataFrame(rows, self.CDC_SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"batch_{b}.parquet"))
        catalog = Catalog(spark, str(tmp_path / "wh"))
        t = catalog.create_table("db.cdc_oot", self.CDC_SCHEMA)
        stream = (
            spark.readStream.schema(self.CDC_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/batch_*")
        )
        replay_cdc_to_icelake(stream, t, keys=["user_id"], order=["ts", "event_id"])
        assert self._table_state(t) == self._oracle_states(batches)[-1]
        assert {r.event_id for r in t.scan().collect()} == {1}
