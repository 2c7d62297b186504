"""Adversarial-skew probe for the wedge-based graph operators
(VERDICT r12 ask #3).

The corpus trade graph is dimension-bounded (25 nations), but the
wedge joins behind triangle counting and common-neighbour link
prediction are Σdeg² shapes: a power-law hub holding a constant
fraction of the edges is the graph analog of the dedup hot bucket.
This probe synthesizes that regime — a random bounded-degree graph
plus ONE hub holding ~20% of all edges — at 1x and 10x, and measures
the wedge/pair OUTPUT counts and wall time of:

  - naive u<v wedge triangles (the pre-r13 corpus plan shape) vs
    triangles_degree_oriented (the skew-safe orientation);
  - uncapped common_neighbor_pairs vs the max_neighbor_degree-capped
    arm, with hub_exclusion_stats' forgone-wedge accounting.

alpha = log(y_10x / y_1x) / log(10): ~1 is linear scale-out, ~2 is the
quadratic regime the guards exist to close. Deterministic synthesis
(xxhash64 off the row id), so runs are reproducible.

    python scripts/graph_skew_probe.py [--cap 64]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

#: 1x shape: n nodes, m random edges (avg degree ~4), hub adjacent to
#: h distinct nodes -> hub holds h/(m+h) ~ 20% of all edges. The hub
#: id sits mid-range so the naive u<v wedge join sees it on BOTH sides
#: (an extreme id would accidentally orient it out of the join).
N_NODES = 1_000
M_ORGANIC = 2_000
H_HUB = 500


def synth_edges(spark, scale: int):
    n, m, h = N_NODES * scale, M_ORGANIC * scale, H_HUB * scale
    hub = n // 2
    organic = (
        spark.range(m)
        .select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n)).alias("a"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
    )
    hub_edges = (
        spark.range(h)
        .select(
            F.lit(hub).cast("long").alias("a"),
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n)).alias("b"),
        )
        .where(F.col("b") != hub)
    )
    return (
        organic.unionByName(hub_edges)
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )


def timed_count(df) -> "tuple[int, float]":
    t0 = time.perf_counter()
    c = df.count()
    return c, round(time.perf_counter() - t0, 3)


def naive_wedges(edges):
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    return e1.join(e2, F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
    )


def oriented_wedges(edges):
    """The degree-oriented intermediate, isolated for the output-size
    evidence (triangles_degree_oriented's own wedge stage)."""
    from iceberg_rs_spark.operators import graph as G

    # reuse the operator's orientation by rebuilding its first stages:
    # count wedges = pairs of out-edges sharing an apex
    e = edges.select("u", "v").distinct()
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ranked = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u", "v",
            F.struct(F.col("du").alias("d"), F.col("u").alias("n")).alias("ru"),
            F.struct(F.col("dv").alias("d"), F.col("v").alias("n")).alias("rv"),
        )
    )
    oriented = ranked.select(
        F.when(F.col("ru") < F.col("rv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("ru") < F.col("rv"), F.col("rv")).otherwise(F.col("ru")).alias("rdst"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    return o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (F.col("o1.rdst") < F.col("o2.rdst")),
    )


def naive_triangles(edges):
    e3 = edges.alias("e3")
    return naive_wedges(edges).join(
        e3,
        (F.col("a") == F.col("e3.u")) & (F.col("c") == F.col("e3.v")),
        "left_semi",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=64,
                    help="max_neighbor_degree for the capped arm")
    args = ap.parse_args()

    from iceberg_rs_spark.operators import graph as G
    from iceberg_rs_spark.operators.dedup import barrier
    from iceberg_rs_spark.session import get_spark

    spark = get_spark(app_name="graph-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[int, dict]] = {}
    for scale in (1, 10):
        edges = barrier(synth_edges(spark, scale))
        n_edges = edges.count()
        adj = barrier(
            edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
                edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
            )
        )
        hub_deg = (
            adj.groupBy("nbr").count().agg(F.max("count")).collect()[0][0]
        )
        row: dict[str, dict] = {}
        nw, t_nw = timed_count(naive_wedges(edges))
        row["naive_wedges"] = {"count": nw, "sec": t_nw}
        ow, t_ow = timed_count(oriented_wedges(edges))
        row["oriented_wedges"] = {"count": ow, "sec": t_ow}
        nt, t_nt = timed_count(naive_triangles(edges))
        row["naive_triangles"] = {"count": nt, "sec": t_nt}
        ot, t_ot = timed_count(G.triangles_degree_oriented(edges))
        row["oriented_triangles"] = {"count": ot, "sec": t_ot}
        assert ot == nt, f"orientation changed the result: {ot} != {nt}"
        up, t_up = timed_count(G.common_neighbor_pairs(adj))
        row["cn_pairs_uncapped"] = {"count": up, "sec": t_up}
        cp, t_cp = timed_count(
            G.common_neighbor_pairs(adj, max_neighbor_degree=args.cap)
        )
        row["cn_pairs_capped"] = {"count": cp, "sec": t_cp}
        stats = G.hub_exclusion_stats(adj, args.cap).collect()
        row["excluded_hubs"] = [
            {"hub": r["hub"], "degree": r["degree"],
             "forgone_wedges": r["forgone_wedges"]}
            for r in stats
        ]
        row["meta"] = {"edges": n_edges, "max_degree": hub_deg}
        results[str(scale)] = row
        edges.unpersist(); adj.unpersist()

    out = {"shape": {"n": N_NODES, "m": M_ORGANIC, "hub": H_HUB},
           "cap": args.cap, "scales": results}
    for key in ("naive_wedges", "oriented_wedges", "naive_triangles",
                "oriented_triangles", "cn_pairs_uncapped", "cn_pairs_capped"):
        y1 = results["1"][key]["count"]
        y10 = results["10"][key]["count"]
        out.setdefault("alpha_count", {})[key] = (
            round(math.log(y10 / y1) / math.log(10), 3) if y1 else None
        )
        t1, t10 = results["1"][key]["sec"], results["10"][key]["sec"]
        out.setdefault("alpha_sec", {})[key] = (
            round(math.log(t10 / t1) / math.log(10), 3) if t1 > 0 else None
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
