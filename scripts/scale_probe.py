"""Informational sf0.1 -> sf1.0 scaling probe (VERDICT r7 ask #8).

Times the five heaviest LLM-pipeline queries at sf0.1 and at a
synthesized 10x scale, and reports the per-query scaling exponent
alpha = log(t_10x / t_1x) / log(10) — empirical evidence for the
100 TB posture claims (alpha ~= 1.0 means linear scale-out work,
the shape a 1000-executor cluster can absorb; alpha >> 1 means a
super-linear stage hides in the plan).

The 10x inputs are DERIVED from the driver's own sf0.1 fixtures, not
invented: each replica r in 1..9 re-keys ids (id + r*stride) and
perturbs content deterministically —

- documents.text gets a per-replica suffix token, so exact/near-dup
  GROUP sIZES stay organic (verbatim copies would inflate minhash
  pair counts quadratically and measure the wrong thing);
- embeddings get a small deterministic per-replica rotation of two
  coordinates, preserving norm scale and cluster geometry.

This is a PROBE, not a gate: one timing each, nothing re-pinned
(first-recording rule untouched). Usage:

    python scripts/scale_probe.py            # writes /tmp/scale_probe/sf1.0 on first run
    python scripts/scale_probe.py --runs 2   # best-of-2 per point
    python scripts/scale_probe.py --midpoint pipeline_training_data --runs 2
        # three-point series (1x -> 5x -> 10x) for ONE query: a rising
        # pairwise alpha means the 1x point was fixed-cost-dominated
        # (amortization), a flat alpha ~= 1 means a genuinely linear
        # stage (VERDICT r8 ask #8)
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SRC = Path(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
DST = Path("/tmp/scale_probe/sf1.0")
REPLICAS = 10  # 1 original + 9 derived
MID_REPLICAS = 5
MID_DST = Path("/tmp/scale_probe/sf0.5")
MIN_ALPHA_T = 0.01  # floor for log-ratio exponents; timings are ms-rounded

#: the five heaviest LLM ops per VERDICT r7 ask #8 (sim_topk_ivf's
#: timing includes its index build — seeds + assignment + probe).
QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_connected_components",
    "pipeline_sequence_packing",
    "sim_topk_ivf",
    "pipeline_training_data",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build_scaled(replicas: int = REPLICAS, dst: Path = DST) -> None:
    """Materialize the replicas-x probe inputs (idempotent per SRC).

    The _READY marker records the resolved SRC it was built from, so
    pointing SPARK_GRAFT_SF_DIR at a different fixture rebuilds instead
    of silently reusing replicas of the old one."""
    import duckdb

    marker = dst / "_READY"
    src_tag = str(SRC.resolve())
    if marker.exists() and marker.read_text() == src_tag:
        return
    if dst.exists():
        shutil.rmtree(dst)
    dst.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        if t not in ("documents", "embeddings"):
            shutil.copy(SRC / f"{t}.parquet", dst / f"{t}.parquet")
    con = duckdb.connect()
    n_doc = con.sql(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    n_vec = con.sql(
        f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
            SELECT d.doc_id + r.r * {n_doc} AS doc_id,
                   CASE WHEN r.r = 0 THEN d.text
                        ELSE d.text || ' #v' || CAST(r.r AS VARCHAR) END AS text,
                   d.lang, d.source,
                   CASE WHEN r.r = 0 THEN d.n_chars
                        ELSE d.n_chars + 4 END AS n_chars
            FROM read_parquet('{SRC}/documents.parquet') d
            CROSS JOIN (SELECT unnest(range({replicas})) AS r) r
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    # Two-coordinate perturbation: coordinates (r-1) and r of replica r
    # get +/- 0.01*r — norm drift is O(1e-2), cluster geometry intact.
    con.execute(f"""
        COPY (
            SELECT e.vec_id + r.r * {n_vec} AS vec_id,
                   CASE WHEN r.r = 0 THEN e.embedding
                        ELSE list_transform(
                            e.embedding,
                            (x, i) -> CAST(
                                x + CASE WHEN i = r.r THEN 0.01 * r.r
                                         WHEN i = r.r + 1 THEN -0.01 * r.r
                                         ELSE 0 END AS FLOAT)
                        ) END AS embedding,
                   e.label
            FROM read_parquet('{SRC}/embeddings.parquet') e
            CROSS JOIN (SELECT unnest(range({replicas})) AS r) r
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    marker.write_text(src_tag)


#: Adversarial-duplication regime (VERDICT r10 #5): the fraction of
#: docs replaced by single-token variants of ONE template. Organic
#: replicas keep band buckets narrow; this regime collides a constant
#: fraction of the corpus into one hot bucket per band, where the
#: all-pairs output is O(n²) regardless of join strategy.
ADV_HOT_MOD = 5  # doc_id % 5 == 0 -> ~20% of the corpus
ADV_TEMPLATE = (
    "standard quarterly compliance boilerplate disclaimer the contents "
    "of this document are provided for informational purposes only and "
    "do not constitute legal financial or investment advice recipients "
    "should consult their own advisors before acting on any statement"
)
ADV_DST = {1: Path("/tmp/scale_probe/adv_1x"), 10: Path("/tmp/scale_probe/adv_10x")}


def build_adversarial(replicas: int, dst: Path) -> None:
    """documents.parquet where ~20% of rows are SINGLE-TOKEN variants
    of one template (suffix token ' v<doc_id>') and the rest keep
    organic text (re-keyed + perturbed per replica, same scheme as
    build_scaled). Idempotent per SRC."""
    import duckdb

    marker = dst / "_READY"
    src_tag = f"{SRC.resolve()}|{replicas}|{ADV_HOT_MOD}"
    if marker.exists() and marker.read_text() == src_tag:
        return
    if dst.exists():
        shutil.rmtree(dst)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    n_doc = con.sql(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
            SELECT d.doc_id + r.r * {n_doc} AS doc_id,
                   CASE WHEN d.doc_id % {ADV_HOT_MOD} = 0
                        THEN '{ADV_TEMPLATE}' || ' v'
                             || CAST(d.doc_id + r.r * {n_doc} AS VARCHAR)
                        WHEN r.r = 0 THEN d.text
                        ELSE d.text || ' #v' || CAST(r.r AS VARCHAR)
                   END AS text,
                   d.lang, d.source, d.n_chars
            FROM read_parquet('{SRC}/documents.parquet') d
            CROSS JOIN (SELECT unnest(range({replicas})) AS r) r
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    marker.write_text(src_tag)


def run_adversarial(runs: int, cap: int) -> None:
    """Pair counts + wall time for the banded dedup candidate
    generators on the adversarial fixture at 1x and 10x, uncapped vs
    max_bucket_width=cap. The uncapped pair count scales ~quadratically
    (the regime's signature); the capped run must stay ~linear with
    the forgone pairs explicitly accounted."""
    from pyspark.sql import functions as PF

    from iceberg_rs_spark.operators import dedup as D
    from iceberg_rs_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def docs(dst: Path):
        return spark.read.parquet(str(dst / "documents.parquet")).select(
            "doc_id", "text"
        )

    def timed_count(build_df) -> "tuple[float, int]":
        best, n = math.inf, -1
        for _ in range(runs):
            t0 = time.perf_counter()
            n = build_df().count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), n

    out: dict = {"probe": "adversarial-duplication", "hot_frac": 1 / ADV_HOT_MOD,
                 "cap": cap, "points": {}}
    for mult, dst in ADV_DST.items():
        d = docs(dst)
        pt: dict = {}
        mh_t, mh_n = timed_count(lambda: D.minhash_candidate_pairs(d))
        pt["minhash_uncapped"] = {"sec": mh_t, "pairs": mh_n}
        mhc_t, mhc_n = timed_count(
            lambda: D.minhash_candidate_pairs(d, max_bucket_width=cap)
        )
        pt["minhash_capped"] = {"sec": mhc_t, "pairs": mhc_n}
        sh_t, sh_n = timed_count(lambda: D.simhash_near_dup_pairs(d))
        pt["simhash_uncapped"] = {"sec": sh_t, "pairs": sh_n}
        shc_t, shc_n = timed_count(
            lambda: D.simhash_near_dup_pairs(d, max_bucket_width=cap)
        )
        pt["simhash_capped"] = {"sec": shc_t, "pairs": shc_n}
        acct = (
            D.lsh_bucket_width_stats(d, max_bucket_width=cap)
            .agg(
                PF.sum("width").alias("banded_docs_in_hot_buckets"),
                PF.sum("pairs_forgone").alias("banded_pairs_forgone"),
                PF.count(PF.lit(1)).alias("hot_buckets"),
                PF.max("width").alias("max_width"),
            )
            .collect()[0]
            .asDict()
        )
        pt["cap_accounting"] = {k: (int(v) if v is not None else 0) for k, v in acct.items()}
        # banded_* sums count per (band, bucket) — a pair colliding in
        # k bands is counted k times there. The DISTINCT forgone count
        # is exact from the two measured pair sets: chain pairs live in
        # the same buckets as the all-pairs output, so capped ⊆ uncapped
        # and the difference is precisely the distinct pairs the cap
        # forgoes.
        pt["cap_accounting"]["distinct_pairs_forgone"] = mh_n - mhc_n
        out["points"][f"{mult}x"] = pt
        print(f"-- {mult}x --")
        for k, v in pt.items():
            print(f"  {k}: {v}")

    def alpha(metric: str, field: str) -> float:
        lo = max(out["points"]["1x"][metric][field], MIN_ALPHA_T)
        hi = max(out["points"]["10x"][metric][field], MIN_ALPHA_T)
        return round(math.log(hi / lo) / math.log(10), 2)

    out["alpha"] = {
        m: {"time": alpha(m, "sec"), "pairs": alpha(m, "pairs")}
        for m in ("minhash_uncapped", "minhash_capped",
                  "simhash_uncapped", "simhash_capped")
    }
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=1, help="best-of-N per point")
    ap.add_argument(
        "--midpoint",
        default=None,
        metavar="QUERY",
        help="three-point series (1x/5x/10x) for ONE query: pairwise "
        "alphas separate fixed-cost amortization (rising) from a "
        "genuinely linear stage (flat ~1)",
    )
    ap.add_argument(
        "--adversarial",
        action="store_true",
        help="adversarial-duplication probe (VERDICT r10 #5): ~20%% of "
        "docs are single-token variants of one template; measures the "
        "banded candidate generators' pair counts and wall time at 1x "
        "and 10x, uncapped vs --cap, with forgone-pair accounting",
    )
    ap.add_argument("--cap", type=int, default=64,
                    help="max_bucket_width for the capped arm")
    args = ap.parse_args()

    if args.adversarial:
        for mult, dst in ADV_DST.items():
            build_adversarial(mult, dst)
        run_adversarial(args.runs, args.cap)
        return

    build_scaled(REPLICAS, DST)
    if args.midpoint:
        build_scaled(MID_REPLICAS, MID_DST)

    import iceberg_rs_spark.plans  # noqa: F401
    from iceberg_rs_spark.operators import packing
    from iceberg_rs_spark.plans.corpus import CORPUS
    from iceberg_rs_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # JIT warmup outside the timed region
    CORPUS["dedup_minhash_lsh_pairs"].builder(spark, str(SRC)).collect()

    def run(name: str, sf_dir: str) -> float:
        best = math.inf
        for _ in range(args.runs):
            packing.release_caches()
            t0 = time.perf_counter()
            CORPUS[name].builder(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    if args.midpoint:
        name = args.midpoint
        if name not in CORPUS:
            sys.exit(f"--midpoint query not in the corpus: {name}")
        t1 = run(name, str(SRC))
        t5 = run(name, str(MID_DST))
        t10 = run(name, str(DST))
        # timings are rounded to 3 decimals; a sub-centisecond point
        # makes log-ratio alphas meaningless (or divides by zero)
        if min(t1, t5, t10) < MIN_ALPHA_T:
            sys.exit(
                f"{name}: a timed point is below {MIN_ALPHA_T}s "
                f"({t1=}, {t5=}, {t10=}) — too fast for a meaningful "
                "scaling exponent at this fixture; probe a heavier query"
            )
        a_1_5 = round(math.log(t5 / t1) / math.log(MID_REPLICAS), 2)
        a_5_10 = round(
            math.log(t10 / t5) / math.log(REPLICAS / MID_REPLICAS), 2
        )
        a_1_10 = round(math.log(t10 / t1) / math.log(REPLICAS), 2)
        print(
            f"{name}: {t1:.3f}s (1x) -> {t5:.3f}s (5x) -> {t10:.3f}s (10x)\n"
            f"alpha 1x->5x={a_1_5}  5x->10x={a_5_10}  1x->10x={a_1_10}"
        )
        print(
            json.dumps(
                {
                    "probe": "midpoint",
                    "query": name,
                    "points": {"1x_s": t1, "5x_s": t5, "10x_s": t10},
                    "alpha": {
                        "1x->5x": a_1_5,
                        "5x->10x": a_5_10,
                        "1x->10x": a_1_10,
                    },
                }
            )
        )
        return

    rows = []
    for name in QUERIES:
        t1 = max(run(name, str(SRC)), MIN_ALPHA_T)
        t10 = max(run(name, str(DST)), MIN_ALPHA_T)
        alpha = round(math.log(t10 / t1) / math.log(REPLICAS), 2)
        rows.append({"query": name, "sf0.1_s": t1, "sf1.0_s": t10, "alpha": alpha})
        print(f"{name:32s} {t1:8.3f}s -> {t10:8.3f}s   alpha={alpha}")
    print(json.dumps({"probe": "sf0.1->sf1.0", "replicas": REPLICAS, "rows": rows}))


if __name__ == "__main__":
    main()
