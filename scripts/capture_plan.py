"""Capture `.explain("formatted")` output for named corpus queries.

    python scripts/capture_plan.py q1,q2,... --suffix before [--sf DIR]

Writes plans/r14/<query>_<suffix>.txt — the committed plan evidence the
optimization rounds' judge checks claims against (OPTIMIZATION_r14.md).
The plan is captured without executing the query (table-family builders
still execute their fixture DDL to produce the final frame, as always).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated corpus query names")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", default=f"{REPO}/plans/r14")
    args = ap.parse_args()

    from iceberg_rs_spark.plans.corpus import CORPUS
    from iceberg_rs_spark.session import get_spark

    spark = get_spark(app_name="capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for name in [s.strip() for s in args.names.split(",") if s.strip()]:
        df = CORPUS[name].builder(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = outdir / f"{name}_{args.suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
