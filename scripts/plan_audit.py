"""Corpus-wide physical-plan anti-pattern sweep (maintenance tool).

Builds and executes every corpus query at sf0.001 and reports, per
query: CartesianProduct nodes, BroadcastNestedLoopJoin nodes, and
Window operators fed by a single-partition Exchange. The repo's
standing posture (SURVEY.md §Scale-posture):

- CartesianProduct: ZERO anywhere (round-5 audit: 0/294; recorded per-run in BENCH_FULL.json since round 6);
- BroadcastNestedLoopJoin: allowed only when the broadcast side is a
  1-row scalar, a literal frame, or a k-bounded top-k result;
- single-partition Windows: allowed only over bounded rollups
  (day-level, decile-level, vocabulary heads, explicit LIMIT slices);
  unbounded relations route through operators/distwin.py.

Run:  python scripts/plan_audit.py            # sf0.001
      SPARK_GRAFT_SF_DIR=... python scripts/plan_audit.py

The per-query gates in tests/test_plan_quality.py enforce the
load-bearing cases in CI; this sweep is the periodic full audit (it
executes the full corpus (295 queries as of round 6), ~8 min — too slow for the default suite).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def sp_fed_windows(plan: str) -> int:
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if "Window " in line and "windowspecdefinition" in line:
            for j in range(i + 1, min(i + 5, len(lines))):
                if "Exchange SinglePartition" in lines[j]:
                    hits += 1
                    break
    return hits


def audit_counts(executed_plan: str) -> "tuple[int, int, int]":
    """(cartesians, broadcast-nested-loop joins, single-partition-fed
    windows) for one executed-plan string. Shared by this sweep and by
    bench.py, which audits every query's plan as a free by-product of
    the timing run (VERDICT r5 #6) and records the result in
    BENCH_FULL.json.

    AQE note (VERDICT r5): callers read ``executedPlan().toString()``
    AFTER ``collect()``, so for an ``AdaptiveSparkPlan`` the string
    leads with ``== Final Plan ==`` — the plan that actually ran,
    including any runtime re-optimizations — followed by
    ``== Initial Plan ==``. The split keeps only the final plan and
    drops the initial one (which would double-count nodes and could
    report shapes AQE replaced, e.g. a sort-merge join that became a
    broadcast join at runtime)."""
    plan = executed_plan.split("== Initial Plan ==")[0]
    return (
        plan.count("CartesianProduct"),
        plan.count("BroadcastNestedLoopJoin"),
        sp_fed_windows(plan),
    )


def main() -> None:
    from iceberg_rs_spark.operators import packing
    from iceberg_rs_spark.plans import CORPUS
    from iceberg_rs_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged, cart_total = [], 0
    for name, spec in sorted(CORPUS.items()):
        try:
            df = spec.builder(spark, sf)
            df.collect()
            cart, bnlj, spw = audit_counts(
                df._jdf.queryExecution().executedPlan().toString()
            )
            cart_total += cart
            if cart or bnlj or spw:
                flagged.append((name, cart, bnlj, spw))
        except Exception as exc:  # surface, keep sweeping
            flagged.append((name, "ERR", str(exc)[:80], ""))
        finally:
            packing.release_caches()
    print(f"queries={len(CORPUS)} flagged={len(flagged)} cartesians={cart_total}")
    print(f"{'query':44s} cart bnlj sp_win")
    for name, cart, bnlj, spw in flagged:
        print(f"{name:44s} {cart!s:>4} {bnlj!s:>4} {spw!s:>6}")
    if cart_total:
        sys.exit(1)  # cartesians are never acceptable


if __name__ == "__main__":
    main()
