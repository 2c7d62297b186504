"""Deduplication operators (SURVEY.md §2C north-star; the core of a
training-data pipeline at 100 TB).

Five strategies, all pure DataFrame transforms:

- exact:   content-hash groupBy — one shuffle on a 60-bit hash.
- MinHash+LSH: shingle rows (explode) → per-seed min via map-side
  partial aggregation (one shuffle of 12-long partials per doc) →
  band buckets → candidate pairs via bucket self-join → exact-Jaccard
  verify. The self-join is *bucketed*: only documents sharing a band
  signature meet, so the pair count stays near-linear instead of
  O(n²).
- SimHash: 60-bit sign-sum fingerprint; near-dups = equal fingerprint
  (or small Hamming distance at verify time).
- n-gram Jaccard: exact pairwise Jaccard, restricted to LSH candidates.
- embedding cosine: near-identical vectors within a blocking key.

All hashing is the portable h60 (functions/hashing.py), so every one
of these is hash-checkable against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from iceberg_rs_spark.functions.hashing import h60, h60_seeded
from iceberg_rs_spark.operators.text import normalize, shingles_of_tokens, tokens


def barrier(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    """Materialization barrier for a plan subtree referenced more than
    once — Catalyst does not plan a ReusedExchange across self-join
    aliases, so without one the whole upstream pipeline is re-derived
    per reference.

    ``reliable=True`` persists at MEMORY_AND_DISK and fills the cache
    eagerly: spill-safe under memory pressure AND lineage-retaining,
    so losing an executor recomputes the lost partitions instead of
    failing the job — the posture a 1000-executor cluster needs.
    ``reliable=False`` is the ``localCheckpoint`` barrier: ~30% faster
    to materialize (RDD blocks, no columnar cache build), but its
    blocks are pinned to specific executors and die with them (a
    non-reliable checkpoint truncates lineage).

    ``reliable=None`` (default) picks by deployment: on a ``local[*]``
    master the driver and executors share one JVM — there is no
    executor-loss failure mode the persist path would protect against,
    so the cheaper localCheckpoint is strictly better; on a real
    cluster the spill-safe persist is the default."""
    if reliable is None:
        reliable = not df.sparkSession.sparkContext.master.startswith("local")
    if not reliable:
        return df.localCheckpoint()
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()  # eager fill: every fan-out branch reads the cache
    return out


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def content_hash(col: Column) -> Column:
    """Normalized-content hash (sha2-256 would also do; h60 keeps the
    oracle portable)."""
    return h60(normalize(col))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per identical (normalized) content.
    One hash-shuffle; no sort of the full data."""
    h = content_hash(F.col(text_col)).alias("_h")
    keep = (
        df.select(F.col(id_col), h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _spread(df: DataFrame, target_bytes: "int | None" = None) -> DataFrame:
    """Redistribute a narrow scan before compute-heavy per-row work.
    A single small parquet file arrives as one partition, serializing
    the hash pipeline on one core; at real scale the scan has many
    splits and this is a no-op. One cheap shuffle of raw rows buys
    full-cluster parallelism on everything downstream. r15: the
    partition count derives from the input size
    (skew.spread_partitions) instead of a fixed full-width fan-out —
    32 near-empty kernel tasks on a sub-MB input each pay fixed
    scheduling + Python round-trip cost for almost no rows (the r14
    driver's 8-core run was FASTER on these queries); real inputs
    saturate the cluster-width cap unchanged."""
    from iceberg_rs_spark.operators.skew import spread_partitions

    sc = df.sparkSession.sparkContext
    cur = df.rdd.getNumPartitions()
    if cur < sc.defaultParallelism:
        n = spread_partitions(df, sc.defaultParallelism, target_bytes)
        if n > cur:
            return df.repartition(n)
    return df


def shingle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """(id, shingle) rows, distinct per document. Tokens are
    materialized as a column before shingling so the shingle lambda
    references only an attribute (interpreted HOF lambdas re-evaluate
    outer *expressions* once per element — staging keeps tokenization
    O(words), not O(words²), per row). Docs with < k tokens vanish."""
    from iceberg_rs_spark.operators.skew import HASH_PIPELINE_TARGET_BYTES

    # r15: the downstream signature stage runs `num_hashes` seeded md5s
    # per shingle row — compute-dense far beyond its input bytes, so it
    # saturates width early (the default byte target chose 2 partitions
    # at sf0.1 and the signature stage ran 4.7 s vs ~1.2 s full-width).
    w = _spread(
        df.select(F.col(id_col), F.col(text_col)),
        target_bytes=HASH_PIPELINE_TARGET_BYTES,
    ).select(F.col(id_col), tokens(F.col(text_col)).alias("_w"))
    return w.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_of_tokens(F.col("_w"), shingle_k))).alias("_s"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    shingle_k: int = 3,
    shingle_rows_df: DataFrame | None = None,
) -> DataFrame:
    """(id, _sig array<long>) — permutation-free MinHash as explode +
    per-seed min. The groupBy is ONE shuffle on the id with map-side
    partial mins (num_hashes longs per id), so this is the shape that
    survives 100 TB: shingle rows never cross the network, only the
    12-long partial signatures do."""
    rows = (
        shingle_rows_df
        if shingle_rows_df is not None
        else shingle_rows(df, id_col, text_col, shingle_k)
    )
    hashed = rows.select(
        F.col(id_col),
        *[h60_seeded(i, F.col("_s")).alias(f"_h{i}") for i in range(num_hashes)],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        F.col(id_col), F.array(*[f"_h{i}" for i in range(num_hashes)]).alias("_sig")
    )


def lsh_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Band signatures: md5 of the concatenated rows of each band."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.array_join(
                F.transform(
                    F.slice(sig, b * rows_per_band + 1, rows_per_band),
                    lambda h: h.cast("string"),
                ),
                ",",
            )
        ),
    )


def _bucketed_pairs(
    keyed: DataFrame,
    id_col: str,
    bucket_cols: list[str],
    max_bucket_width: int | None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs from bucket co-membership, with the hot-bucket
    guard (VERDICT r10 #5). ``keyed`` has one row per (doc, bucket).

    Without a cap, a bucket of width w emits C(w,2) pairs — quadratic
    in w. Organic corpora keep w small (that is the point of banding),
    but boilerplate-heavy corpora produce one hot bucket holding a
    constant FRACTION of the corpus (near-identical template variants
    all collide), and C(0.2n, 2) is O(n²) pairs: the regime that kills
    banded dedup at 100 TB no matter how the join is bucketed, because
    the OUTPUT is quadratic.

    With ``max_bucket_width`` set, buckets wider than the cap switch
    from all-pairs to a CHAIN over the bucket's ids in sorted order
    (w-1 pairs): connectivity-preserving, so downstream connected
    components still merges the whole bucket into one cluster, while
    the emitted-pair count becomes linear in w. This is a CAP WITH
    EXPLICIT ACCOUNTING, not a silent drop: ``lsh_bucket_width_stats``
    reports, per capped bucket, the exact pairs forgone — callers that
    verify pairs individually (e.g. exact-Jaccard gates) must either
    raise the cap or treat capped buckets as clusters, because a
    chained pair may verify-fail where some skipped pair would have
    passed."""
    carry = carry_cols or []
    if max_bucket_width is None:
        # r15 (guide §3.2, VERDICT r14 #6): width >= 2 semi-join
        # prefilter. A width-1 bucket emits no pairs, and in organic
        # banding MOST buckets are width-1 — they only inflate both
        # shuffle/sort sides of the self-join. Filtering them first is
        # provably output-identical (every surviving pair's bucket has
        # width >= 2 by definition of a pair). The widths aggregate is
        # map-side-partial (one row per distinct bucket crosses), and
        # the filtered relation is barriered because BOTH self-join
        # aliases reference it (no ReusedExchange across the pair) —
        # colliding rows are the join's working set, strictly smaller
        # than `keyed`.
        widths = keyed.groupBy(*bucket_cols).agg(F.count("*").alias("_bw"))
        colliding = barrier(
            keyed.join(
                widths.where(F.col("_bw") >= 2).select(*bucket_cols),
                bucket_cols,
                "left_semi",
            )
        )
        return _all_pairs_join(colliding, id_col, bucket_cols, carry)
    # Bucket width via hash aggregation (map-side partials) + equi-join,
    # NOT a count window: Window.partitionBy(bucket) would materialize
    # every row of the hot bucket in ONE task — the exact single-point
    # regime the guard exists to survive.
    # The armed path references `keyed` three times (widths aggregate,
    # small-bucket join side, big-bucket chain input); barrier it so
    # the upstream banding pipeline is derived once, not per reference
    # (ADVICE r11 #1 — Catalyst does not reuse subtrees across these).
    keyed = barrier(keyed)
    widths = keyed.groupBy(*bucket_cols).agg(F.count("*").alias("_bw"))
    wide = keyed.join(widths, bucket_cols)
    # _bw >= 2 is the same prefilter for free — width-1 buckets cannot
    # pair (the widths are already joined on here).
    small = wide.where(
        (F.col("_bw") <= max_bucket_width) & (F.col("_bw") >= 2)
    ).drop("_bw")
    exact = _all_pairs_join(small, id_col, bucket_cols, carry)
    big = wide.where(F.col("_bw") > max_bucket_width).drop("_bw")
    chain = _chain_pairs_distributed(big, id_col, bucket_cols, carry)
    return exact.unionByName(chain)


def _all_pairs_join(
    keyed: DataFrame,
    id_col: str,
    bucket_cols: list[str],
    carry: list[str],
) -> DataFrame:
    """The raw (id_a < id_b) bucket self-join — factored out so the
    armed path's small-bucket arm does not recompute the widths its
    caller already joined on."""
    a, b = keyed.alias("a"), keyed.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry],
        *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry],
    )


def _chain_pairs_distributed(
    big: DataFrame,
    id_col: str,
    bucket_cols: list[str],
    carry: list[str],
) -> DataFrame:
    """Consecutive-id links per bucket WITHOUT ever holding a bucket in
    one task. A hot bucket is, by the guard's premise, a constant
    fraction of the corpus — a per-bucket window (lag over
    Window.partitionBy(bucket)) would sort all of it in a single task.
    Instead:

    1. range-partition on (bucket..., id) and sort within partitions —
       the hot bucket spans MANY partitions, each holding a contiguous
       sorted slice;
    2. each partition streams its Arrow batches once through
       mapInPandas, linking consecutive rows that share a bucket (one
       row of state carried across batch boundaries);
    3. the links that straddle PARTITION boundaries are reconstructed
       from a metadata-sized per-(partition, bucket-fragment) min/max
       aggregate — two endpoint rows per fragment cross the driver,
       never data.

    The emitted pair set is exactly "consecutive ids per bucket in
    global sorted order" regardless of where the range boundaries
    fall, so the output is partitioning-invariant."""
    from pyspark.sql import types as T

    sess = big.sparkSession
    cols = [*bucket_cols, id_col, *carry]
    schema = {f.name: f.dataType for f in big.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField("id_a", schema[id_col]),
            T.StructField("id_b", schema[id_col]),
            *[T.StructField(f"{c}_a", schema[c]) for c in carry],
            *[T.StructField(f"{c}_b", schema[c]) for c in carry],
        ]
    )
    sorted_df = barrier(
        big.select(*cols)
        .repartitionByRange(*bucket_cols, id_col)
        .sortWithinPartitions(*bucket_cols, id_col)
    )

    def link_batches(batches):
        import pandas as pd

        tail = None  # last row of the previous batch (1-row DataFrame)
        for pdf in batches:
            if pdf.empty:
                continue
            cur = pdf if tail is None else pd.concat(
                [tail, pdf], ignore_index=True
            )
            # Slice-and-compare, never shift(): shift() widens int64 to
            # float64 (NaN fill), which silently corrupts 60-bit
            # fingerprints past 2^53.
            a_rows = cur.iloc[:-1].reset_index(drop=True)
            b_rows = cur.iloc[1:].reset_index(drop=True)
            if len(a_rows):
                same = (
                    (a_rows[bucket_cols].values == b_rows[bucket_cols].values)
                    .all(axis=1)
                )
                out = pd.DataFrame(
                    {
                        "id_a": a_rows[id_col],
                        "id_b": b_rows[id_col],
                        **{f"{c}_a": a_rows[c] for c in carry},
                        **{f"{c}_b": b_rows[c] for c in carry},
                    }
                )[same]
                yield out
            tail = cur.tail(1)

    within = sorted_df.mapInPandas(link_batches, schema=out_schema)

    # Fragment endpoints: one (lo, hi) row pair per bucket PER
    # PARTITION it spans — O(buckets + partitions) rows, driver-safe.
    row_struct = F.struct(F.col(id_col).alias("id"), *carry)
    frags = (
        sorted_df.groupBy(
            F.spark_partition_id().alias("_pid"), *bucket_cols
        )
        .agg(
            F.min_by(row_struct, F.col(id_col)).alias("_lo"),
            F.max_by(row_struct, F.col(id_col)).alias("_hi"),
        )
        .collect()
    )
    by_bucket: dict[tuple, list] = {}
    for r in frags:
        by_bucket.setdefault(tuple(r[c] for c in bucket_cols), []).append(r)
    stitch_rows = []
    for rs in by_bucket.values():
        rs.sort(key=lambda r: r["_pid"])
        for a, b in zip(rs, rs[1:]):
            stitch_rows.append(
                (
                    a["_hi"]["id"],
                    b["_lo"]["id"],
                    *[a["_hi"][c] for c in carry],
                    *[b["_lo"][c] for c in carry],
                )
            )
    if not stitch_rows:
        return within
    return within.unionByName(
        sess.createDataFrame(stitch_rows, out_schema)
    )


def lsh_bucket_width_stats(
    df: DataFrame,
    max_bucket_width: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """The guard's explicit accounting (the 'no silent caps' rule):
    one row per OVER-CAP band bucket — width, the C(w,2) pairs an
    uncapped run would emit from it, the w-1 chain pairs the capped
    run emits, and the difference forgone. Empty output means the cap
    never fired and the capped run is pair-for-pair identical to the
    uncapped one."""
    if num_hashes % bands:
        raise ValueError(f"num_hashes={num_hashes} not divisible by bands={bands}")
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(
        id_col,
        F.posexplode(lsh_bands(F.col("_sig"), bands, rows_per_band)).alias(
            "_band_idx", "_band_sig"
        ),
    )
    w = F.col("width")
    return (
        banded.groupBy("_band_idx", "_band_sig")
        .agg(F.count("*").alias("width"))
        .where(w > max_bucket_width)
        .select(
            F.col("_band_idx").alias("band_idx"),
            F.col("_band_sig").alias("band_sig"),
            w.cast("long").alias("width"),
            (w * (w - 1) / 2).cast("long").alias("exact_pairs"),
            (w - 1).cast("long").alias("chain_pairs"),
            (w * (w - 1) / 2 - (w - 1)).cast("long").alias("pairs_forgone"),
        )
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_k: int = 3,
    shingle_rows_df: DataFrame | None = None,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """(id_a < id_b) pairs sharing at least one LSH band bucket.

    ``max_bucket_width`` arms the hot-bucket guard: band buckets wider
    than the cap emit a sorted id CHAIN (w-1 pairs, connectivity
    preserved for clustering) instead of all C(w,2) pairs — the
    boilerplate-corpus regime where one template's variants all
    collide into a bucket holding a constant fraction of the corpus
    and the all-pairs output is O(n²). Account for what the cap
    forgoes with :func:`lsh_bucket_width_stats` (see
    :func:`_bucketed_pairs` for the exact semantics)."""
    if num_hashes % bands:
        # Silent truncation would quietly change the s-curve the caller
        # tuned (bands x rows sets the similarity threshold); make the
        # geometry explicit instead.
        raise ValueError(
            f"num_hashes={num_hashes} not divisible by bands={bands}; "
            f"{num_hashes - bands * (num_hashes // bands)} signature "
            "rows would be silently unused"
        )
    rows_per_band = num_hashes // bands
    # The bucket self-join references the signature relation twice;
    # signatures are one row of `num_hashes` longs per doc — a trivial
    # materialization even at corpus scale.
    sigs = barrier(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, shingle_rows_df)
    )
    banded = sigs.select(
        id_col,
        F.posexplode(lsh_bands(F.col("_sig"), bands, rows_per_band)).alias(
            "_band_idx", "_band_sig"
        ),
    )
    return _bucketed_pairs(
        banded, id_col, ["_band_idx", "_band_sig"], max_bucket_width
    ).distinct()


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    shingle_rows_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B| via the
    exploded-shingle join (distinct shingles only). ``pairs`` and the
    shingle relation are each referenced several times — pass
    materialized inputs (localCheckpoint) to avoid re-deriving them
    per reference."""
    sh = (
        shingle_rows_df
        if shingle_rows_df is not None
        else shingle_rows(df, id_col, text_col, shingle_k)
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("_n"))
    inter = (
        pairs.join(sh.alias("sa"), F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(
            sh.alias("sb"),
            (F.col("id_b") == F.col(f"sb.{id_col}")) & (F.col("sa._s") == F.col("sb._s")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"_inter": 0})
        .join(sizes.alias("na"), F.col("id_a") == F.col(f"na.{id_col}"))
        .join(sizes.alias("nb"), F.col("id_b") == F.col(f"nb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("_inter")
                / (F.col("na._n") + F.col("nb._n") - F.col("_inter"))
            ).alias("jaccard"),
        )
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.6,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """LSH candidates → exact-Jaccard verify → pairs over threshold.

    ``max_bucket_width`` (default off) arms the hot-bucket guard on
    the candidate generator (VERDICT r11 #5 — the composed purge
    pipelines must survive a boilerplate-heavy corpus). Because the
    Jaccard gate verifies pairs individually, capped buckets emit a
    sorted-id CHAIN whose links are all template-variant pairs — on a
    genuine boilerplate cluster every chain link is near-identical and
    passes the gate, so downstream clustering still collapses the
    cluster; account for what the cap forgoes with
    :func:`lsh_bucket_width_stats`.

    Both the shingle relation and the candidate set are materialized
    once behind a :func:`barrier` (spill-safe persist). Shingles feed
    the signature stage once and the verify stage three times (sizes +
    the two intersection sides); candidates feed the verify joins
    three times. Without the barriers each reference re-runs the whole
    tokenize→shingle (or shingle→minhash→bucket-join) pipeline —
    Catalyst does not reuse plan subtrees across self-join aliases.
    This is the standard persist-shingles-then-verify shape; at
    cluster scale the shingle relation is the corpus token stream, and
    persisting it once is still cheaper than deriving it four times."""
    sh = barrier(shingle_rows(df, id_col, text_col, shingle_k))
    cands = barrier(
        minhash_candidate_pairs(
            df,
            id_col,
            text_col,
            num_hashes,
            bands,
            shingle_k,
            shingle_rows_df=sh,
            max_bucket_width=max_bucket_width,
        )
    )
    jac = jaccard_pairs(df, cands, id_col, text_col, shingle_k, shingle_rows_df=sh)
    return jac.where(F.col("jaccard") >= threshold)


def near_dedup_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Drop the higher-id member of every near-dup pair (greedy
    keep-first; transitive clusters collapse to their minimum id over
    repeated application — single pass is the standard large-scale
    compromise, no iterative connected-components)."""
    pairs = near_dup_pairs_minhash(df, id_col, text_col, **kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``, where component
    is the MINIMUM node id of its connected component — the transitive
    closure the single-pass :func:`near_dedup_minhash` explicitly
    skips, for when near-dup chains (A~B, B~C) must collapse to one
    survivor.

    Alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): each round is two bounded
    groupBy shuffles over the edge list, and the edge set converges to
    per-component stars rooted at the minimum in O(log n) rounds —
    unlike naive label propagation, whose round count is the graph
    DIAMETER (a 1M-node chain needs 1M rounds vs ~20). The per-round
    convergence check is one count over the symmetric difference. The
    driver loop holds only iteration control; all data stays
    distributed.
    """
    e = (
        pairs.select(
            F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    edges = barrier(e)
    n_edges = edges.count()
    for _ in range(max_iterations):
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: connect every strictly-larger neighbor of u to
        # min(N(u) ∪ {u}). Duplicate edges are harmless below (the
        # groupBy-min dedups), so no distinct here — one less shuffle.
        lmins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        lmins = lmins.select("u", F.least("u", "mn").alias("m"))
        ls = (
            sym.join(lmins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        )
        # small-star on the (u > v)-directed list: connect u and all its
        # smaller neighbors to their minimum
        smins = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
        )
        new_edges = barrier(ss)
        # Convergence check, exact but cheap (r14): both edge sets are
        # DISTINCT, so they are equal iff |new| == |old| AND new ⊆ old.
        # The old-edge count is carried from the previous round (free),
        # the new count is one no-shuffle job over the barriered frame,
        # and the subset probe — a left_anti limit 1 — only runs when
        # the counts match (unequal counts already prove non-
        # convergence). Replaces the former two-exceptAll + union +
        # count plan, which re-shuffled both edge sets every round.
        n_new = new_edges.count()
        changed = 1
        if n_new == n_edges:
            changed = (
                new_edges.join(edges, ["u", "v"], "left_anti").limit(1).count()
            )
        edges.unpersist()
        edges = new_edges
        n_edges = n_new
        if changed == 0:
            break
    # converged: (u, v) edges are per-component stars, v = component min
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    reps = (
        edges.select(F.col("v").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return members.union(reps).groupBy("node").agg(
        F.min("component").alias("component")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60


def simhash(col: Column, bits: int = SIMHASH_BITS) -> Column:
    """Sign-sum fingerprint over token h60 hashes: bit b is set iff
    more token-hashes have bit b set than unset. Pure nested array
    expression — no explode, no shuffle."""
    from iceberg_rs_spark.operators.text import tokens

    t = tokens(col)
    th = F.transform(t, lambda w: h60(w))
    zero = F.array_repeat(F.lit(0).cast("long"), bits)
    # one pass over the token hashes, accumulating a per-bit sign count
    counts = F.aggregate(
        th,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda b: F.getbit(h, b).cast("long") * 2 - 1,
            ),
            lambda a, v: a + v,
        ),
    )
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    return F.aggregate(
        F.zip_with(
            counts,
            powers,
            lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(id, _fp) — the scalable SimHash: explode tokens, hash each
    once (codegen md5), then 60 per-bit sign sums in one hash
    aggregation (map-side partials: 60 longs per doc cross the
    network, not the tokens). Matches :func:`simhash` bit-for-bit on
    every non-NULL document (blank text tokenizes to the [""]
    pseudo-token in both). NULL text differs: the column expression
    yields a NULL fingerprint, while the explode drops the row from
    this output entirely — callers needing every row should left-join
    back."""
    # r14 (guide §4.2): the fingerprint is per-document, so it needs NO
    # shuffle at all — the former explode + 60-sum hash aggregation
    # paid a full token-row shuffle plus 60 aggregate updates per token
    # (the 60-function update loop is far past the JIT inlining budget,
    # so it ran as interpreted bytecode; measured ~2.5 s of the 3 s
    # query at sf0.1). Tokenization stays JVM-side (the exact oracle
    # regex), then ONE mapInPandas kernel hashes each token with the
    # portable h60 (hashlib.md5 — bit-identical by definition) and
    # computes the per-bit sign sums in integer numpy: exact integer
    # math, same fp for every row the old plan emitted. NULL-text rows
    # are dropped, matching the explode plan (pinned in
    # test_operators.py::test_simhash_blank_and_null_text).
    w = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_w")
    )
    id_dtype = dict(w.dtypes)[id_col]
    n_bits = int(bits)

    def _kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        shifts = np.arange(n_bits, dtype=np.uint64)
        one = np.uint64(1)
        for pdf in batches:
            ids, fps = [], []
            for i, toks in zip(pdf[id_col], pdf["_w"]):
                if toks is None or len(toks) == 0:
                    continue  # NULL text: the explode plan drops the row
                hs = np.fromiter(
                    (
                        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                        for t in toks
                    ),
                    dtype=np.uint64,
                    count=len(toks),
                )
                ones = ((hs[:, None] >> shifts) & one).sum(axis=0, dtype=np.int64)
                counts = 2 * ones - np.int64(len(hs))
                fp = int(((counts > 0).astype(np.uint64) << shifts).sum())
                ids.append(i)
                fps.append(fp)
            yield pd.DataFrame({id_col: ids, "_fp": fps})

    return w.mapInPandas(_kernel, f"{id_col} {id_dtype}, _fp long")


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two long fingerprints via bit_count."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    band_bits: int = 15,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the fingerprint into 4 chunks
    (pigeonhole: distance ≤3 ⇒ at least one identical chunk), bucket-join
    on chunks, verify Hamming ≤ max_hamming.

    Fingerprints are materialized before the bucket self-join (one long
    per doc): the two join sides otherwise each re-run the full
    tokenize→hash→60-sum aggregation — Catalyst plans no ReusedExchange
    across the alias pair.

    ``max_bucket_width`` arms the hot-bucket guard (see
    :func:`_bucketed_pairs`): over-cap chunk buckets emit a sorted id
    chain instead of all pairs. The Hamming verify still applies to
    chain pairs, so in a capped bucket whose members sit up to
    2*max_hamming apart, a chain link may verify-fail where a skipped
    pair would have passed — capped buckets are cluster candidates,
    not an exhaustive pair list."""
    fp = barrier(simhash_fingerprints(df, id_col, text_col))
    chunks = fp.select(
        id_col,
        "_fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("_fp"), i * band_bits).bitwiseAND(
                        F.lit((1 << band_bits) - 1)
                    )
                    for i in range(4)
                ]
            )
        ).alias("_chunk_idx", "_chunk"),
    )
    cands = _bucketed_pairs(
        chunks,
        id_col,
        ["_chunk_idx", "_chunk"],
        max_bucket_width,
        carry_cols=["_fp"],
    ).select(
        "id_a", "id_b", F.col("_fp_a").alias("_fpa"), F.col("_fp_b").alias("_fpb")
    ).distinct()
    return cands.where(hamming64(F.col("_fpa"), F.col("_fpb")) <= max_hamming).select(
        "id_a", "id_b", hamming64(F.col("_fpa"), F.col("_fpb")).alias("hamming")
    )
