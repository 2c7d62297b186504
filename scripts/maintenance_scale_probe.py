"""Maintenance-path planning cost at 100k manifest entries (VERDICT
r10 #7).

test_planning_scale pins the predicate-scan planning budget; the
heaviest TABLE queries are commit-count-dominated, so this probe
measures the remaining maintenance paths — incremental scan,
changelog, expire_snapshots — against a snapshot holding 100k sharded
manifest entries (the `_distributed_prune` regime: shard-size 25000 →
4+ shards), and reports µs/entry so BASELINE.md records a number, not
a guess. Optimization is warranted only if a path is super-linear in
entries (the probe prints a 10k-entry point for comparison).

The 100k data files are REAL parquet (one seed file hard-linked 100k
times — identical footers, zero extra storage), so DataFrame
construction walks the true planning path (manifest json-load +
read-group construction); nothing is collected, because the probe
measures planning, not data movement. Snapshots are forged through the
table's own commit machinery (`_new_snapshot` + `_commit`), so
sequence stamping, sharding, and the metadata log behave exactly as a
real 100k-file append's would.

    python scripts/maintenance_scale_probe.py            # 100k + 10k points
    python scripts/maintenance_scale_probe.py --entries 50000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

ROOT = Path("/tmp/maint_probe")
SHARD_SIZE = 25_000  # the default write.manifest.shard-size
ADDED = 0.05  # the incremental delta: 5% of the base entry count


def _build_table(spark, n: int, tag: str):
    """A table whose current snapshot holds n (+ n*ADDED) entries:
    S1 = append of n synthetic entries, S2 = append of n*ADDED more."""
    from iceberg_rs_spark.sources.icelake import (
        MAIN_BRANCH,
        Catalog,
        DataFileEntry,
    )

    wh = ROOT / f"wh_{tag}"
    if wh.exists():
        shutil.rmtree(wh)
    seed_df = spark.range(1).selectExpr(
        "cast(id as long) as event_id", "cast(0.5 as double) as value"
    )
    catalog = Catalog(spark, str(wh))
    t = catalog.create_table(
        f"db.maint_{tag}",
        seed_df.schema,
        properties={"write.manifest.shard-size": str(SHARD_SIZE)},
    )
    data_dir = Path(t.location) / "data" / "probe"
    data_dir.mkdir(parents=True, exist_ok=True)
    seed_dir = ROOT / f"seed_{tag}"
    seed_df.coalesce(1).write.mode("overwrite").parquet(str(seed_dir))
    seed = next(p for p in seed_dir.glob("*.parquet"))
    size = seed.stat().st_size
    # ext4 caps a file at ~65k hard links; rotate seed copies per 50k
    seeds: dict[int, Path] = {}

    def _seed_for(i: int) -> Path:
        k = i // 50_000
        if k not in seeds:
            cp = seed_dir / f"seed_{k}.parquet"
            shutil.copy(seed, cp)
            seeds[k] = cp
        return seeds[k]

    def entry(i: int) -> DataFileEntry:
        path = data_dir / f"part-{i:07d}.parquet"
        os.link(_seed_for(i), path)
        lo = i * 1000
        return DataFileEntry(
            path=str(path),
            record_count=1,
            file_size_bytes=size,
            schema_id=0,
            spec_id=0,
            partition={},
            stats={"event_id": {"min": lo, "max": lo + 999, "nulls": 0}},
        )

    n_added = int(n * ADDED)
    base = [entry(i) for i in range(n)]
    t._commit(lambda md: t._new_snapshot(md, "append", list(base), MAIN_BRANCH))
    md1 = t.metadata
    s1 = md1.current_snapshot_id
    more = [entry(n + i) for i in range(n_added)]
    # append semantics: the S2 manifest carries the full state — S1's
    # entries AS STAMPED IN ITS MANIFEST (re-read, so they keep
    # sequence_number=1 and the incremental delta is exactly `more`)
    # plus the fresh unstamped ones.
    carried = t._read_manifest(md1.snapshot_by_id(s1))
    assert all(e.sequence_number for e in carried)
    t._commit(
        lambda md: t._new_snapshot(
            md, "append", carried + list(more), MAIN_BRANCH
        )
    )
    s2 = t.metadata.current_snapshot_id
    return t, s1, s2, n, n_added


def _probe(spark, n: int) -> dict:
    t, s1, s2, n_base, n_added = _build_table(spark, n, f"{n}")
    md = t.metadata
    snap2 = md.snapshot_by_id(s2)
    total = n_base + n_added
    out: dict = {"entries": total, "added": n_added, "paths": {}}

    parts = t._manifest_parts(snap2)
    out["manifest_shards"] = len(parts) if parts else 0

    def rec(name: str, seconds: float, denom: int) -> None:
        out["paths"][name] = {
            "sec": round(seconds, 3),
            "us_per_entry": round(seconds * 1e6 / denom, 2),
            "denom": denom,
        }
        print(f"  {name:28s} {seconds:8.3f}s  {seconds * 1e6 / denom:8.2f} us/entry ({denom})")

    t0 = time.perf_counter()
    entries = t._read_manifest(snap2)
    rec("read_manifest", time.perf_counter() - t0, total)
    assert len(entries) == total, (len(entries), total)

    t0 = time.perf_counter()
    inc = t.incremental_scan(start_snapshot_id=s1, end_snapshot_id=s2)
    rec("incremental_scan_plan", time.perf_counter() - t0, total)
    assert inc is not None

    t0 = time.perf_counter()
    ch = t.changelog_scan(start_snapshot_id=s1, end_snapshot_id=s2)
    rec("changelog_scan_plan", time.perf_counter() - t0, total)
    assert ch is not None

    t0 = time.perf_counter()
    sc = t.scan(where="event_id >= 1000000 AND event_id < 2000000")
    rec("predicate_scan_plan", time.perf_counter() - t0, total)
    assert sc is not None

    # S3 overwrites everything; expiring down to it must walk every
    # snapshot's manifest for reachability and delete the 100k+
    # now-orphaned files + shard parts.
    fresh = spark.range(1).selectExpr(
        "cast(id + 999999 as long) as event_id", "cast(1.5 as double) as value"
    )
    t.overwrite(fresh)
    t0 = time.perf_counter()
    removed = t.expire_snapshots(retain_last=1)
    rec("expire_snapshots", time.perf_counter() - t0, total)
    assert len(removed) == 2, removed
    assert t.to_df().count() == 1
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", type=int, default=100_000)
    args = ap.parse_args()

    from iceberg_rs_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    ROOT.mkdir(parents=True, exist_ok=True)

    results = []
    for n in (args.entries // 10, args.entries):
        print(f"-- {n} base entries --")
        results.append(_probe(spark, n))
    doc = {"probe": "maintenance-planning-scale", "points": results}
    # super-linearity check: ratio of us/entry between the two points
    small, big = results
    doc["us_per_entry_ratio_10x"] = {
        k: round(
            big["paths"][k]["us_per_entry"] / small["paths"][k]["us_per_entry"], 2
        )
        for k in big["paths"]
        if small["paths"][k]["us_per_entry"] > 0
    }
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
