"""PRIORITY-rotation helper (run after EVERY CORRECTNESS recording).

The driver certifies only the first 50 `queries()` entries per round,
so `iceberg_rs_spark/plans/corpus.py:PRIORITY` must lead with queries
that (a) have no green driver CORRECTNESS row yet, or (b) changed
implementation since their last green row. This script computes the
remaining backlog after each round:

    python scripts/rotate_priority.py            # report only
    python scripts/rotate_priority.py --write    # rewrite corpus.PRIORITY

Report mode prints, in current PRIORITY order:
- the never-certified backlog (what the next 50-window should lead
  with), grouped by family;
- any certified name still sitting inside the first 50 (wasted window
  slots, unless deliberately kept for re-verification of a change).

``--write`` regenerates the PRIORITY block mechanically: hash-
certifiable backlog first (family-grouped, stable order), then
certified names in their previous relative order, then the no-oracle
rows-only queries last. Changed-implementation re-certs lead the head
automatically via ``corpus.RECERT`` (record the change THERE, next to
the code that changed — not as a flag someone must remember); ``--lead
name1,name2`` pins additional names ahead of everything for one-off
judgment calls. The r5 miss (recorded a round, forgot to rotate) is
the failure mode --write exists to kill: the bench-record commit
ritual is  record CORRECTNESS → update RECERT → rotate --write →
commit (VERDICT r5 asks #1-#2).
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import sys
from collections import Counter
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

#: rotation order between families (VERDICT r5 #1); unknown families
#: sort after, alphabetically.
FAMILY_ORDER = [
    "fn", "win", "sim", "text", "pipeline", "graph", "join",
    "table", "sub", "dedup", "ingest", "ts",
]


def certified_names(paths: "list[str] | None" = None) -> set[str]:
    """Names with a PASSING driver CORRECTNESS row in any round.

    A hash-checked query (has an oracle in the current registry)
    counts only on ``hash_match``; a rows-only query (no oracle, by
    the declared determinism rules) counts on ``rows_match``. A row
    with ``rows_match`` but ``hash_match: false`` is a hash FAILURE
    (r01 recorded three) and must stay in the backlog — the old
    either/or rule would have silently certified it."""
    import iceberg_rs_spark.plans  # noqa: F401 — populate the registry
    from iceberg_rs_spark.plans import corpus

    if paths is None:
        paths = sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json"))
    out: set[str] = set()
    for path in paths:
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("err") is not None or not row.get("rows_match"):
                continue
            spec = corpus.CORPUS.get(name)
            needs_hash = spec is not None and spec.oracle is not None
            if needs_hash and not row.get("hash_match"):
                continue
            out.add(name)
    return out


def rotation(lead: "list[str] | None" = None) -> list[str]:
    """The full PRIORITY list a mechanical rotation would produce.
    ``corpus.RECERT`` (changed implementations awaiting a fresh driver
    row) is always prepended to ``lead`` — a rotation that dropped a
    queued re-cert would recreate the r5 miss class silently."""
    from iceberg_rs_spark.plans import corpus

    recert = [n for n in getattr(corpus, "RECERT", []) if n in corpus.CORPUS]
    lead = recert + [n for n in (lead or []) if n not in set(recert)]
    certified = certified_names()
    names = list(corpus.CORPUS)
    fam_rank = {f: i for i, f in enumerate(FAMILY_ORDER)}

    def fam_key(n: str):
        f = n.split("_")[0]
        return (fam_rank.get(f, len(FAMILY_ORDER)), f)

    cur_order = {n: i for i, n in enumerate(corpus.PRIORITY)}
    backlog = [
        n for n in names
        if n not in certified and corpus.CORPUS[n].oracle is not None
    ]
    backlog.sort(key=lambda n: (fam_key(n), cur_order.get(n, 10**6)))
    rest = [n for n in names if n not in set(backlog) and n not in set(lead)]
    rest.sort(
        key=lambda n: (
            corpus.CORPUS[n].oracle is None,  # rows-only queries last
            cur_order.get(n, 10**6),
        )
    )
    lead = [n for n in lead if n in corpus.CORPUS]
    return lead + [n for n in backlog if n not in set(lead)] + rest


def write_priority(names: list[str], path: "str | None" = None) -> None:
    path = path or f"{REPO}/iceberg_rs_spark/plans/corpus.py"
    src = open(path).read()
    # Locate the PRIORITY literal by AST, not by string search: hand
    # edits between rotations are expected, and a comment ending in
    # "]" would derail a first-"]\n" scan and splice mid-block.
    node = next(
        n
        for n in ast.walk(ast.parse(src))
        if isinstance(n, ast.AnnAssign)
        and getattr(n.target, "id", "") == "PRIORITY"
    )
    lines_src = src.splitlines(keepends=True)
    start = sum(len(l) for l in lines_src[: node.lineno - 1])
    end = sum(len(l) for l in lines_src[: node.end_lineno])
    lines = ["PRIORITY: list[str] = ["]
    lines.append("    # Mechanically rotated by scripts/rotate_priority.py --write:")
    lines.append("    # RECERT queue + --lead first, then never-driver-certified")
    lines.append("    # (hash-certifiable) queries family-grouped; certified names")
    lines.append("    # follow in prior order; rows-only last.")
    for n in names:
        lines.append(f'    "{n}",')
    lines.append("]")
    open(path, "w").write(src[:start] + "\n".join(lines) + "\n" + src[end:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="rewrite corpus.PRIORITY with the mechanical rotation")
    ap.add_argument("--lead", default="",
                    help="comma-separated names to pin at the very head "
                         "(changed implementations needing re-certification)")
    args = ap.parse_args()

    import iceberg_rs_spark.plans  # noqa: F401 — populate the registry
    from iceberg_rs_spark.plans import corpus

    certified = certified_names()
    names = list(corpus.CORPUS)
    backlog = [n for n in names if n not in certified]
    head50 = [n for n in corpus.PRIORITY if n in corpus.CORPUS][:50]
    stale = [n for n in head50 if n in certified]

    print(f"corpus={len(names)} certified={len(certified)} backlog={len(backlog)}")
    print("backlog by family:", dict(Counter(n.split('_')[0] for n in backlog)))
    recert = [n for n in getattr(corpus, "RECERT", []) if n in corpus.CORPUS]
    if recert:
        print(
            "recert queue (changed implementations, auto-lead on --write):",
            recert,
        )
    print("\n-- never-certified backlog (current PRIORITY order) --")
    order = {n: i for i, n in enumerate(corpus.PRIORITY)}
    for n in sorted(backlog, key=lambda n: order.get(n, 10**6)):
        tag = "" if corpus.CORPUS[n].oracle else "  [rows-only: no oracle]"
        print(f"  {n}{tag}")
    if stale:
        print("\n-- certified names inside the 50-window (rotate out unless "
              "kept for re-verification of a change) --")
        for n in stale:
            print(f"  {n}")

    if args.write:
        lead = [s.strip() for s in args.lead.split(",") if s.strip()]
        unknown = [n for n in lead if n not in corpus.CORPUS]
        if unknown:
            # A silently-dropped --lead name recreates the r5 miss
            # class (a changed implementation shipping uncertified).
            sys.exit(f"--lead names not in the corpus: {unknown}")
        rotated = rotation(lead)
        assert sorted(rotated) == sorted(names)
        write_priority(rotated)
        n_new = sum(1 for n in rotated[:50] if n not in certified)
        print(f"\nwrote corpus.PRIORITY: {len(rotated)} names, "
              f"{n_new} never-certified in the 50-window")


if __name__ == "__main__":
    main()
