"""PRIORITY-rotation helper (maintenance tool for the next round).

The driver certifies only the first 50 `queries()` entries per round,
so `iceberg_rs_spark/plans/corpus.py:PRIORITY` must lead with queries
that (a) have no green driver CORRECTNESS row yet, or (b) changed
implementation since their last green row. This script computes the
remaining backlog after each round:

    python scripts/rotate_priority.py

It prints, in current PRIORITY order:
- the names already certified (candidates to rotate OUT of the head);
- the never-certified backlog (what the next 50-window should lead
  with), grouped by family;
- any certified name still sitting inside the first 50 (wasted window
  slots, unless deliberately kept for re-verification of a change).

It does NOT edit corpus.py — the head also encodes judgment calls
(changed implementations, one-of-a-kind execution modes), so apply the
rotation by hand and keep `test_priority_queries_lead_registry` green.
"""

from __future__ import annotations

import glob
import json
import sys
from collections import Counter
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    import iceberg_rs_spark.plans  # noqa: F401 — populate the registry
    from iceberg_rs_spark.plans import corpus

    certified: set[str] = set()
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = row.get("hash_match") or (
                row.get("rows_match") and row.get("err") is None
            )
            if ok:
                certified.add(name)
    names = list(corpus.CORPUS)
    backlog = [n for n in names if n not in certified]
    head50 = [n for n in corpus.PRIORITY if n in corpus.CORPUS][:50]
    stale = [n for n in head50 if n in certified]

    print(f"corpus={len(names)} certified={len(certified)} backlog={len(backlog)}")
    print("backlog by family:", dict(Counter(n.split('_')[0] for n in backlog)))
    print("\n-- never-certified backlog (current PRIORITY order) --")
    order = {n: i for i, n in enumerate(corpus.PRIORITY)}
    for n in sorted(backlog, key=lambda n: order.get(n, 10**6)):
        print(f"  {n}")
    if stale:
        print("\n-- certified names inside the 50-window (rotate out unless "
              "kept for re-verification of a change) --")
        for n in stale:
            print(f"  {n}")


if __name__ == "__main__":
    main()
