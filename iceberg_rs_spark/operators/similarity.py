"""Similarity search over embedding columns (SURVEY.md §2C north-star).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set against the embedding table — a map-side join, no shuffle of
the big side — then per-query top-k via TakeOrdered-style window.

The scale path is LSH bucketing (random-hyperplane sign bits): each
vector lands in one bucket; queries probe their own bucket plus the
buckets within ``probe_hamming`` sign flips (multi-probe). At 1000
executors this turns a 100 TB scan per query into a few bucket-local
scans; recall is tunable by planes × probe radius (asserted against
brute force in tests/test_operators.py).

The dot product stays JVM-side: zip_with + aggregate over the float
arrays cast to double — deterministic left-to-right summation, which
also makes results bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60


#: Ceiling on the QUERY-batch size the serving-shaped ANN paths accept.
#: :func:`ivf_topk` and :func:`pq_topk` materialize per-query probe /
#: LUT structures driver-side and broadcast them (|Q|·n_probe·dim and
#: |Q|·m·ksub doubles respectively) — correct for the bounded
#: query-batch serving shape they implement (queries ≪ corpus), and a
#: silent OOM machine if a corpus-sized frame is passed as `queries`.
#: At the default 16,384 the pq LUT is ≈ 16 MB and the IVF probe
#: broadcast ≈ 34 MB at dim 64 / n_probe 4. Raise via the
#: ``max_query_batch`` parameter only with the driver memory to match;
#: corpus-×-corpus jobs belong to :func:`embedding_near_dup_pairs`.
DEFAULT_MAX_QUERY_BATCH = 16_384


def _check_query_batch(queries: DataFrame, ceiling: int | None, op: str) -> None:
    """Loud guard for the bounded-query-batch serving contract.

    Counts through a ``limit(ceiling + 1)`` so the check itself does
    bounded work: a full ``count()`` of a mistakenly corpus-sized
    `queries` frame would already be the scan this guard exists to
    prevent."""
    ceiling = DEFAULT_MAX_QUERY_BATCH if ceiling is None else ceiling
    n = queries.limit(ceiling + 1).count()
    if n > ceiling:
        raise ValueError(
            f"{op}: query batch exceeds max_query_batch={ceiling}. "
            "This operator collects/broadcasts per-query structures "
            "and is meant for serving-shaped workloads "
            "(queries ≪ corpus); for corpus-scale pairing use "
            "embedding_near_dup_pairs, or raise max_query_batch "
            "explicitly if the driver has the memory."
        )


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product. With ``dim`` known, an unrolled sum of element_at
    products — a flat codegen-able expression (higher-order functions
    are interpreted and ~100× slower per element). Fold order is
    left-to-right either way, so float results are bit-identical."""
    if dim is not None:
        terms = [
            F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            for i in range(1, dim + 1)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine (numpy over pandas-UDF batches) — the
    fast path for bulk pair scoring. A 64-term JVM expression tree
    blows past the JIT method-size limit and runs as interpreted
    bytecode, and interpreted HOF folds cost ~25µs/pair; numpy does
    the same work in vectorized C. Catalyst extracts the UDF into one
    ArrowEvalPython node, so filter + project share a single eval.
    numpy's summation order differs from the SQL left fold at ~1e-15;
    all hash-checked outputs are rounded to 4 decimals first."""
    return _cosine_udf()(a, b)


def cosine_arrow_exact(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine whose float result is BIT-IDENTICAL to
    the JVM left-fold / DuckDB list_sum sequential sum: the reduction
    runs vectorized ACROSS rows but sequential ACROSS dimensions
    (``acc = acc + x[:, j] * y[:, j]``), so every row performs exactly
    the IEEE additions of ``dot()``'s fold in the same order. Use this
    when the cosine decides a ranking cut in a hash-checked query
    (top-k selection flips on 1e-15 near-ties under einsum's pairwise
    summation); use :func:`cosine_arrow` when outputs are rounded."""
    return _cosine_exact_udf()(a, b)


_PCOS_EXACT = None


def _cosine_exact_udf():
    global _PCOS_EXACT
    if _PCOS_EXACT is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def pcos_exact(x: pd.Series, y: pd.Series) -> pd.Series:
            if len(x) == 0:
                return pd.Series([], dtype="float64")
            xa = np.stack(x.values).astype("float64")
            ya = np.stack(y.values).astype("float64")
            n = len(xa)
            d = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for j in range(xa.shape[1]):
                xj, yj = xa[:, j], ya[:, j]
                d = d + xj * yj
                na = na + xj * xj
                nb = nb + yj * yj
            return pd.Series(d / (np.sqrt(na) * np.sqrt(nb)))

        _PCOS_EXACT = pcos_exact
    return _PCOS_EXACT


_PCOS = None


def _cosine_udf():
    global _PCOS
    if _PCOS is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def pcos(x: pd.Series, y: pd.Series) -> pd.Series:
            if len(x) == 0:
                return pd.Series([], dtype="float64")
            xa = np.stack(x.values).astype("float64")
            ya = np.stack(y.values).astype("float64")
            d = np.einsum("ij,ij->i", xa, ya)
            na = np.sqrt(np.einsum("ij,ij->i", xa, xa))
            nb = np.sqrt(np.einsum("ij,ij->i", ya, ya))
            return pd.Series(d / (na * nb))

        _PCOS = pcos
    return _PCOS


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_query_batch: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries`` is expected to be small (it is force-broadcast —
    the bounded-query-batch serving contract, guarded by
    ``max_query_batch`` like the ANN paths); the big
    embeddings side is scanned once, map-side only. Scoring uses
    :func:`cosine_arrow_exact` — bit-identical to the JVM left fold /
    DuckDB list_sum by construction (vectorized across pairs,
    sequential across dimensions), so the unrounded rank cut below is
    still exact, without the interpreted per-element HOF fold the
    r13 version paid per pair (guide §4.2; r14 profile: the fold was
    the whole cost of the agreement-scalar queries).
    """
    from pyspark.sql import Window

    _check_query_batch(queries, max_query_batch, "brute_force_topk")
    emb = embeddings.select(F.col(id_col), F.col(vec_col))
    qry = queries.select(F.col(query_id_col), F.col(query_vec_col))
    joined = emb.join(F.broadcast(qry))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_arrow_exact(F.col(vec_col), F.col(query_vec_col)).alias("cos"),
    ).where(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(
            query_id_col,
            id_col,
            # UNROUNDED: display rounding is the caller's policy, applied
            # exactly once (ADVICE r7 #2 — rounding here and again in the
            # plan composed Spark HALF_UP under the portable rhalf, a
            # latent near-half hash flake vs the rhalf-on-raw oracle).
            F.col("cos"),
            F.col("_rn").alias("rank"),
        )
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from the portable h60 —
    reproducible across engines and runs without numpy RNG state."""
    import hashlib

    out = []
    for d in range(dim):
        hx = hashlib.md5(f"{plane_idx}|{d}".encode()).hexdigest()[:15]
        v = int(hx, 16) / float(1 << 60)  # [0, 1)
        out.append(2.0 * v - 1.0)
    return out


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes (JVM-side arithmetic)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(_as_double(vec), F.array(*[F.lit(x) for x in p]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_bucket_arrow(vec: Column, planes: list[list[float]]) -> Column:
    """:func:`lsh_bucket` computed in one Arrow kernel instead of one
    interpreted 64-term HOF fold PER PLANE PER ROW (guide §4.2 — the
    fold costs ~25 µs/row/plane and its unrolled expression tree also
    defeats whole-stage codegen). Bit-identical to the JVM fold and to
    the oracle's list_sum: each projection accumulates sequentially
    across dimensions (``acc = acc + x[:, j] * p[j]`` — the exact IEEE
    additions of the left fold, vectorized across rows), so the sign
    test — hence the bucket id, hence the candidate pair set — cannot
    differ."""
    from pyspark.sql.functions import pandas_udf

    pl = [list(map(float, p)) for p in planes]

    @pandas_udf("long")
    def pbucket(x: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="int64")
        xa = np.stack(x.values).astype("float64")
        n = len(xa)
        bucket = np.zeros(n, dtype="int64")
        for i, p in enumerate(pl):
            proj = np.zeros(n)
            for j in range(xa.shape[1]):
                proj = proj + xa[:, j] * p[j]
            bucket = bucket + np.where(proj > 0.0, np.int64(1 << i), np.int64(0))
        return pd.Series(bucket)

    return pbucket(vec)


def auto_num_planes(n: int, target_block: int = 256, lo: int = 2, hi: int = 24) -> int:
    """Hyperplane count sized to the corpus: expected bucket size is
    n / 2^planes, so planes = ceil(log2(n / target_block)) keeps the
    per-block all-pairs cost bounded as the corpus grows — the 100 TB
    posture is automatic instead of caller-tuned. Clamped to [lo, hi]
    (2^24 buckets is plenty below ~4B rows per block target)."""
    import math

    if n <= target_block:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n / target_block))))


def auto_n_centroids(n: int, lo: int = 4, hi: int = 1 << 16) -> int:
    """IVF list count sized to the corpus: the classic sqrt(n) balance
    point between list-scan cost (n / n_centroids per probe) and
    centroid-assignment cost (n_centroids per vector)."""
    import math

    return min(max(lo, min(hi, round(math.sqrt(n)))), max(n, 1))


def probe_masks(num_planes: int, probe_hamming: int) -> list[int]:
    """XOR masks for multi-probe LSH: the zero mask (own bucket) plus
    every bucket within Hamming distance ``probe_hamming`` of it."""
    from itertools import combinations

    masks = [0]
    for r in range(1, min(probe_hamming, num_planes) + 1):
        for idxs in combinations(range(num_planes), r):
            masks.append(sum(1 << i for i in idxs))
    return masks


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    dim: int = 64,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_query_batch: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket plus every bucket within Hamming distance ``probe_hamming``
    of it (multi-probe), then exact cosine rank within.

    Multi-probe is the standard recall lever that does NOT touch the
    index: a true neighbor differing on one sign bit lands one bucket
    away, so probing the 1 + C(planes,1) + ... buckets recovers it at
    the cost of scanning (probes/2^planes) of the data — still a
    vanishing fraction at scale, and only the tiny broadcast query
    side fans out (|Q| × probes rows — the bounded-query-batch
    serving contract, guarded by ``max_query_batch`` like the other
    paths). ``probe_hamming=0`` is the single-bucket probe."""
    from pyspark.sql import Window

    _check_query_batch(queries, max_query_batch, "lsh_topk")
    planes = [_hyperplane(dim, i) for i in range(num_planes)]
    # r14: corpus-side buckets via the Arrow kernel (bit-identical sign
    # test, see lsh_bucket_arrow) — the per-row interpreted fold grew
    # with the corpus; the tiny query side keeps the JVM fold (one
    # Python round trip would cost more than it saves on |Q| rows).
    emb_b = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket_arrow(F.col(vec_col), planes).alias("_bucket"),
    )
    q_b = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        lsh_bucket(F.col(query_vec_col), planes).alias("_qbucket"),
    )
    masks = probe_masks(num_planes, probe_hamming)
    # Fan the (tiny, broadcast) query side out to its probe buckets;
    # masks are distinct, so no candidate pair appears twice.
    q_probes = q_b.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.explode(F.array(*[F.lit(m).cast("long") for m in masks])).alias("_mask"),
        F.col("_qbucket"),
    ).select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.col("_qbucket").bitwiseXOR(F.col("_mask")).alias("_qbucket"),
    )
    joined = emb_b.join(F.broadcast(q_probes), F.col("_bucket") == F.col("_qbucket"))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        # exact (dimension-sequential) Arrow fold — bit-identical to
        # the JVM left fold; the unrounded cos decides the rank cut.
        cosine_arrow_exact(F.col(vec_col), F.col(query_vec_col)).alias("cos"),
    ).where(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        # unrounded cos — callers round once (ADVICE r7 #2)
        .select(query_id_col, id_col, F.col("cos"), F.col("_rn").alias("rank"))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    n_probe: int = 4,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_query_batch: int | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index, pure
    DataFrame ops — the other classic ANN scale path next to
    :func:`lsh_topk`.

    Bounded-query-batch contract: the probe relation (|Q| × n_probe
    rows carrying full query vectors) is BROADCAST onto the inverted
    lists, so this is a serving-shaped operator — queries ≪ corpus.
    The corpus side is never collected (seeds are √n-bounded); the
    query side is guarded by ``max_query_batch`` (default
    :data:`DEFAULT_MAX_QUERY_BATCH`) and raises rather than silently
    building a corpus-sized broadcast.

    Build: seed centroids = the ``n_centroids`` vectors with the
    LOWEST portable-hash of their id — a deterministic uniform
    hash-sample computed as a distributed TakeOrdered (map-side
    partial top-n per partition, driver merges only n_centroids rows),
    so seeds are unbiased even on id-sorted or time-clustered data
    (first-n-by-id seeding puts every seed in one corner of the
    corpus; VERDICT r3 §What's-wrong #3). Refined by ``lloyd_iters``
    Lloyd iterations where assignment is a map-side argmin against a
    ``SparkContext.broadcast`` of the centroid matrix (one torrent
    transfer per executor — NOT per-task closure serialization) and
    the centroid update is a partial-aggregated elementwise mean
    (posexplode → sum/count partials → one shuffle of
    n_centroids × dim rows). Driver memory stays budget-bounded: the
    only driver-side materializations are n_centroids vectors
    (seeds + per-iteration means), and :func:`auto_n_centroids` caps
    n_centroids at 2^16 ≈ 32 MB of float64 at dim 64 — this mirrors
    Spark MLlib's KMeans, which also keeps the centroid matrix on the
    driver per iteration (a centroid-DataFrame *join* assignment would
    avoid even that, but costs an n × n_centroids intermediate, which
    is strictly worse at every scale). Probe: each query scans only
    its ``n_probe`` nearest inverted lists — n_probe/n_centroids of
    the data instead of all of it, the fraction that keeps 100 TB
    searchable. ``n_centroids=None`` derives sqrt(n) lists from the
    corpus size. Recall vs brute force is asserted in
    tests/test_operators.py.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    _check_query_batch(queries, max_query_batch, "ivf_topk")
    emb = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    if n_centroids is None:
        n_centroids = auto_n_centroids(emb.count())
    n_probe = min(n_probe, n_centroids)
    sc = embeddings.sparkSession.sparkContext
    seed_rows = (
        emb.orderBy(h60(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    centroids = np.stack(
        [np.asarray(r["_v"], dtype="float64") for r in seed_rows]
    )

    def _assign_udf(cents: np.ndarray, topn: int):
        """Vectorized (numpy-over-Arrow) nearest-centroid assignment.
        The centroid matrix ships via an explicit Spark broadcast —
        fetched once per executor over the torrent protocol, not
        re-serialized into every task's closure. Returns the topn
        nearest list ids.

        FOLD-ORDER-MATCHED cosine (ADVICE r5 #2): the reduction runs
        vectorized across (row, centroid) cells but SEQUENTIAL across
        dimensions, on RAW vectors, so every similarity performs
        exactly the IEEE additions of the JVM left-fold / DuckDB
        list_sum cosine — a normalize-then-matmul (BLAS pairwise
        summation) can flip the rn=1 pick on 1e-15 near-ties and
        desync the assignment from a replaying oracle."""
        bc = sc.broadcast(cents)

        @pandas_udf("array<int>")
        def nearest(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype="object")
            cm = bc.value
            x = np.stack(v.values).astype("float64")
            n, dim = x.shape
            d = np.zeros((n, cm.shape[0]))
            nx = np.zeros(n)
            nc = np.zeros(cm.shape[0])
            for j in range(dim):
                xj, cj = x[:, j], cm[:, j]
                d = d + xj[:, None] * cj[None, :]
                nx = nx + xj * xj
                nc = nc + cj * cj
            sims = d / (np.sqrt(nx)[:, None] * np.sqrt(nc)[None, :])
            # argsort is stable → deterministic tie-break by list id
            order = np.argsort(-sims, kind="stable", axis=1)[:, :topn]
            return pd.Series(list(order.astype("int32")))

        return nearest

    for _ in range(lloyd_iters):
        one = _assign_udf(centroids, 1)
        assigned = emb.withColumn("_cid", one(F.col("_v"))[0])
        # centroid update: elementwise mean via posexplode → partial
        # sum/count combine → one shuffle of n_centroids × dim rows
        means = (
            assigned.select("_cid", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("_cid", "_pos")
            .agg(F.avg("_x").alias("_m"))
            .groupBy("_cid")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_pm"))
            .select("_cid", F.transform("_pm", lambda s: s["_m"]).alias("_c"))
            .collect()
        )
        new = centroids.copy()
        for r in means:
            new[int(r["_cid"])] = np.asarray(r["_c"], dtype="float64")
        centroids = new

    one = _assign_udf(centroids, 1)
    indexed = emb.withColumn("_cid", one(F.col("_v"))[0])
    qry = queries.select(
        F.col(query_id_col), _as_double(F.col(query_vec_col)).alias("_q")
    )
    topn = _assign_udf(centroids, n_probe)
    probe = qry.select(
        query_id_col, "_q", F.explode(topn(F.col("_q"))).alias("_cid")
    )
    joined = indexed.join(F.broadcast(probe), "_cid")
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        # exact (dimension-sequential) fold: the UNROUNDED cos decides
        # the rank cut below, so it must be bit-identical to the
        # sequential oracle — einsum's pairwise summation flips top-k
        # membership on near-ties (ADVICE r5 #2, the sim_knn_classify
        # treatment applied here).
        cosine_arrow_exact(F.col("_v"), F.col("_q")).alias("cos"),
    ).where(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        # unrounded cos — callers round once (ADVICE r7 #2)
        .select(
            query_id_col,
            id_col,
            F.col("cos"),
            F.col("_rn").alias("rank"),
        )
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.98,
    num_planes: int | None = None,
    dim: int = 64,
    probe_hamming: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vectors: cosine ≥ threshold within an LSH bucket.

    The blocking key is the random-hyperplane sign bucket — the key
    that scales: bucket count grows 2^num_planes, so block size (and
    the per-block all-pairs cost) shrinks geometrically as planes are
    added, independent of any data column's value skew. Blocking on a
    label-like column is O(n²) in the hottest label at 100 TB; the
    bucket key has no such hot spot by construction, and true
    near-dups (cos ≥ 0.98) agree on every sign bit with probability
    (1 - θ/π)^planes ≈ 0.92 at 4 planes (:func:`lsh_topk`'s
    multi-probe recovers the rest when needed). Scoring runs in the
    Arrow-vectorized cosine — this operator's volume is pairs, not
    rows, so the numpy batch path wins by ~14×.

    ``num_planes=None`` (default) derives the plane count from the
    corpus size via :func:`auto_num_planes`, so the expected block
    size stays bounded as the corpus grows.

    ``probe_hamming`` extends the block join to bucket pairs within
    that Hamming distance: a true near-dup that disagrees on r sign
    bits lands r buckets away and a same-bucket join misses it. Each
    candidate pair matches exactly ONE xor mask (the mask is
    determined by the two buckets), so multi-probe adds no duplicate
    pairs; the joined volume grows by the mask count
    (1 + C(planes,1) + ... — still geometric-block-bounded, never
    all-pairs)."""
    if num_planes is None:
        num_planes = auto_num_planes(embeddings.count())
    planes = [_hyperplane(dim, i) for i in range(num_planes)]
    # r14 (guide §4.2/§2.4): bucket assignment runs in the Arrow kernel
    # (bit-identical sign test — see lsh_bucket_arrow) instead of
    # num_planes interpreted HOF folds per row, and the bucketed base is
    # barriered: both self-join sides otherwise re-ran the scan AND the
    # per-row bucket computation (no ReusedExchange across the alias
    # pair). One narrow row per vector, O(corpus) — the same size class
    # as the fingerprint barrier in dedup.simhash_near_dup_pairs.
    from iceberg_rs_spark.operators.dedup import _spread, barrier

    base = barrier(
        _spread(embeddings).select(
            F.col(id_col),
            F.col(vec_col),
            lsh_bucket_arrow(F.col(vec_col), planes).alias("_bucket"),
        )
    )
    a = base.alias("a")
    if probe_hamming > 0:
        masks = probe_masks(num_planes, probe_hamming)
        b = base.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(
                F.array(*[F.lit(m).cast("long") for m in masks])
            ).alias("_mask"),
            F.col("_bucket"),
        ).select(
            F.col(id_col),
            F.col(vec_col),
            F.col("_bucket").bitwiseXOR(F.col("_mask")).alias("_bucket"),
        ).alias("b")
    else:
        b = base.alias("b")
    return (
        a.join(
            b,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_arrow(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        # unrounded cos — callers round once (ADVICE r7 #2); the
        # threshold above already cut on the raw value.
        .select("id_a", "id_b", F.col("cos"))
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column:
    per-vector scale = max|x|/127, q_i = clamp(floor(x_i/scale + 0.5),
    ±127) — the standard 4× memory/IO reduction for vector search at
    scale (a 100 TB float32 corpus becomes 25 TB of int8 + one scale
    per vector). floor(+0.5) rounding and IEEE division are
    bit-identical across engines, so the quantized grid — and
    everything computed from it — is oracle-checkable. Cosine between
    quantized vectors needs NO scales (they cancel in the ratio), and
    its integer dot product is exact, immune to summation order."""
    absmax = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    staged = df.withColumn("_scale", absmax / 127.0)
    q = F.when(
        F.col("_scale") > 0,
        F.transform(
            F.col(vec_col),
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x.cast("double") / F.col("_scale") + 0.5).cast("int"),
                ),
            ),
        ),
    ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0)))
    return staged.withColumn(out_col, q).drop("_scale")


def quantized_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    group_cols: "list[str] | None" = None,
    max_query_batch: int | None = None,
) -> DataFrame:
    """Exact top-k under int8-quantized cosine, with the true float
    cosine alongside for error measurement.

    Scoring runs in ONE Arrow-batched numpy kernel (mapInPandas) over
    the embeddings relation with the (bounded, collected) query batch
    as a closure constant — the guide-§4.2 shape. The r12/r13 JVM
    expression form (per-pair 64-term unrolled integer dot against a
    broadcast of the query rows) was measured in r14 at 2.0-2.6 s of
    Catalyst planning + codegen per occurrence at bench scale and,
    worse, showed a progressive JIT deopt cliff when re-planned in a
    long session (6.4 → 18.3 s across four same-session runs — the
    giant generated methods exceed the JIT inlining budget and fall
    back to interpreted bytecode). numpy does the identical arithmetic
    in vectorized C with none of that pathology, and the kernel emits
    only a per-batch partial top-k, so the final ranking window sees
    O(k · |Q| · batches) rows instead of |corpus| · |Q|.

    Bit-for-bit equivalence with the old plan (and the DuckDB oracle):
    the quantized grid is floor(x/scale + 0.5) clamped — elementwise
    IEEE ops, identical in numpy; the cross/self integer dots are
    EXACT int64 sums (immune to summation order, so the matmul is
    safe); qcos divides an exact int by the product of two IEEE sqrts;
    and the float `cos` reduction runs vectorized across rows but
    sequential across dimensions (the :func:`cosine_arrow_exact`
    pattern), reproducing `dot()`'s left fold addition-for-addition.
    Quantization spans the FULL array while dots/norms span elements
    1..dim only — the ADVICE-r12 over-length contract, pinned in
    tests/test_operators.py.

    ``group_cols`` makes it GROUPED top-k: k best per (query, group) —
    per-source/per-language quota retrieval. The per-batch partial
    selection keeps k per (query, group) so the exact global window
    stays metadata-sized. Queries are collected driver-side under the
    bounded-query-batch serving contract (``max_query_batch``, like
    :func:`pq_topk`); at 100 TB the corpus side streams through the
    kernel map-side only — no join, no shuffle of the embedding table."""
    import math

    from pyspark.sql import Window
    from pyspark.sql.types import DoubleType, StructField, StructType

    groups = list(group_cols or [])
    _check_query_batch(queries, max_query_batch, "quantized_topk")

    qrows = queries.select(query_id_col, query_vec_col).collect()
    qids_list = [r[0] for r in qrows]
    qvecs = [[float(x) for x in r[1]] for r in qrows]

    def _quant_full(v: "list[float]") -> "list[int]":
        # Mirrors quantize_int8 bit-for-bit: scale over the FULL array,
        # floor(x/scale + 0.5), clamp ±127, zero vector stays zero.
        scale = max(abs(x) for x in v) / 127.0
        if scale > 0:
            return [
                max(-127, min(127, int(math.floor(x / scale + 0.5))))
                for x in v
            ]
        return [0] * len(v)

    nq = len(qrows)
    if nq:
        qq = np.array([_quant_full(v)[:dim] for v in qvecs], dtype=np.int64)
    else:
        qq = np.zeros((0, dim), dtype=np.int64)
    # Query-side norms, computed once: the quantized self-dot is an
    # exact integer; the float norm is a sequential left fold over the
    # FULL array — the same IEEE additions norm() performs.
    qnb = np.sqrt((qq * qq).sum(axis=1).astype("float64"))

    def _float_norm(v: "list[float]") -> float:
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return math.sqrt(acc)

    nb = np.array([_float_norm(v) for v in qvecs], dtype="float64")
    qfull = [np.asarray(v, dtype="float64") for v in qvecs]
    qids_arr = np.asarray(qids_list)

    emb_fields = {f.name: f for f in embeddings.schema.fields}
    qid_field = next(
        f for f in queries.schema.fields if f.name == query_id_col
    )
    out_schema = StructType(
        [StructField(query_id_col, qid_field.dataType, True)]
        + [emb_fields[g] for g in groups]
        + [StructField(id_col, emb_fields[id_col].dataType, True)]
        + [
            StructField("qcos", DoubleType(), True),
            StructField("cos", DoubleType(), True),
        ]
    )

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0 or nq == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            ids = pdf[id_col].to_numpy()
            # int8 grid over the full array (IEEE-elementwise, exact)
            absmax = np.max(np.abs(X), axis=1)
            scale = absmax / 127.0
            safe = np.where(scale > 0, scale, 1.0)
            grid = np.clip(np.floor(X / safe[:, None] + 0.5), -127, 127)
            grid[scale <= 0] = 0.0
            qa = grid[:, :dim].astype(np.int64)
            qna = np.sqrt((qa * qa).sum(axis=1).astype("float64"))
            # exact integer cross dots, all queries at once
            qcos = (qa @ qq.T) / (qna[:, None] * qnb[None, :])
            # float cos: vectorized across rows, sequential across dims
            # (bit-identical to dot()'s left fold); a query whose full
            # length differs from the row length reproduces the old
            # zip_with-over-ragged NULL as NaN→null.
            b = len(X)
            cos = np.full((b, nq), np.nan)
            for qi in range(nq):
                qv = qfull[qi]
                if len(qv) != X.shape[1]:
                    continue
                d = np.zeros(b)
                na = np.zeros(b)
                for j in range(X.shape[1]):
                    xj = X[:, j]
                    d = d + xj * qv[j]
                    na = na + xj * xj
                cos[:, qi] = d / (np.sqrt(na) * nb[qi])
            res = pd.DataFrame(
                {
                    query_id_col: np.repeat(qids_arr, b),
                    **{
                        g: np.tile(pdf[g].to_numpy(), nq)
                        for g in groups
                    },
                    id_col: np.tile(ids, nq),
                    "qcos": qcos.T.ravel(),
                    "cos": cos.T.ravel(),
                }
            )
            res = res[res[query_id_col] != res[id_col]]
            # Partial top-k per (query, group) within the batch: global
            # top-k = top-k of the union of per-batch top-ks under the
            # same total order (qcos desc, id asc; NaN ranks first,
            # matching Spark's NaN-greatest ordering).
            res["_key"] = np.where(
                np.isnan(res["qcos"].to_numpy()), np.inf, res["qcos"].to_numpy()
            )
            res = res.sort_values(
                ["_key", id_col], ascending=[False, True], kind="mergesort"
            )
            res = (
                res.groupby([query_id_col] + groups, sort=False)
                .head(k)
                .drop(columns="_key")
            )
            yield res

    emb_sel = embeddings.select(id_col, vec_col, *groups)
    scored = emb_sel.mapInPandas(_score, schema=out_schema)
    w = Window.partitionBy(query_id_col, *groups).orderBy(
        F.col("qcos").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(
            query_id_col,
            *groups,
            id_col,
            F.col("qcos"),
            F.col("cos"),
            F.col("_rn").alias("rank"),
        )
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_query_batch: int | None = None,
) -> DataFrame:
    """Approximate top-k via product quantization (PQ) with asymmetric
    distance computation — the memory-compression ANN path: each
    vector is stored as ``m`` sub-space codes of log2(ksub) bits
    (64 float32 dims → 8 bytes here, a 32× compression), and queries
    score codes against a per-query lookup table instead of touching
    raw vectors. At 100 TB this is what makes the index *fit*:
    IVF/LSH shrink how much is scanned, PQ shrinks what each scanned
    row costs (the classic IVFADC pairing).

    Training mirrors :func:`ivf_topk`'s determinism posture: sub-space
    codebooks seed from the ``ksub`` lowest-portable-hash vectors (a
    distributed TakeOrdered — unbiased on sorted/clustered data, no
    full collect), refined by ``lloyd_iters`` iterations where
    assignment is a numpy-over-Arrow argmin against an explicit
    ``SparkContext.broadcast`` of the codebook and the update is a
    partial-aggregated mean of m × ksub × dsub cells (metadata-sized
    collect). Vectors are unit-normalized ONCE (Arrow-batched numpy)
    behind a :func:`~iceberg_rs_spark.operators.dedup.barrier` — the
    build references the normalized relation ~2 + lloyd_iters times,
    and without the barrier each reference re-derives the
    normalization from the scan. Scoring is pure JVM: the per-query
    LUT (m × ksub squared-distance partials, an ARRAY column —
    element_at on an array is O(1) vs a linear scan on a map)
    broadcasts onto the codes relation and ADC distance folds the m
    lookups in fixed sub-space order — deterministic summation, no
    Python in the hot path, no shuffle of the embedding table at all.

    Bounded-query-batch contract: the query set is COLLECTED to the
    driver to build the ADC LUT (|Q| × m × ksub doubles) which is then
    broadcast — the serving shape: queries ≪ corpus. The corpus side
    is never collected (codebook cells are m·ksub, metadata-sized).
    ``max_query_batch`` (default :data:`DEFAULT_MAX_QUERY_BATCH`)
    guards the collect so a corpus-sized `queries` frame raises loudly
    instead of OOM-ing the driver at 100 TB.

    Approximation quality (recall vs brute force) is asserted in
    tests/test_operators.py.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} sub-spaces")
    _check_query_batch(queries, max_query_batch, "pq_topk")
    dsub = dim // m

    # L2-normalize first: unit vectors make squared-L2 monotone in
    # cosine (L2² = 2 − 2·cos), so PQ's distance objective matches the
    # cosine ranking the exact baseline uses. Arrow-batched numpy, not
    # an interpreted per-element HOF.
    @pandas_udf("array<double>")
    def _unit(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        x = np.stack(v.values).astype("float64")
        # dimension-sequential norm (not np.linalg.norm: pairwise
        # summation over 64 dims) so the normalized values are
        # bit-identical to the oracle's sqrt(list_sum(v*v)) fold —
        # every downstream PQ distance starts from these values
        # (ADVICE r5 #2).
        nrm = np.zeros(len(x))
        for j in range(x.shape[1]):
            nrm = nrm + x[:, j] * x[:, j]
        x /= np.sqrt(nrm)[:, None]
        return pd.Series(list(x))

    from iceberg_rs_spark.operators.dedup import barrier

    emb = barrier(
        embeddings.select(F.col(id_col), _unit(F.col(vec_col)).alias("_v"))
    )
    sc = embeddings.sparkSession.sparkContext

    seed_rows = (
        emb.orderBy(h60(F.col(id_col).cast("string")), F.col(id_col))
        .limit(ksub)
        .collect()
    )
    if len(seed_rows) < ksub:
        raise ValueError(f"corpus smaller than ksub={ksub}")
    seeds = np.stack([np.asarray(r["_v"], dtype="float64") for r in seed_rows])
    # codebook[j] = the ksub sub-vectors of sub-space j: (m, ksub, dsub)
    codebook = np.stack([seeds[:, j * dsub : (j + 1) * dsub] for j in range(m)])

    def _encode_udf(cb: np.ndarray):
        bc = sc.broadcast(cb)

        @pandas_udf("array<int>")
        def encode(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype="object")
            c = bc.value  # (m, ksub, dsub)
            x = np.stack(v.values).astype("float64").reshape(len(v), c.shape[0], -1)
            # (B, m, ksub) squared distances, accumulated SEQUENTIALLY
            # across the dsub dims — np.sum's pairwise reduction only
            # happens to match the oracle's list_sum fold for dsub < 8,
            # so spell the fold out instead of relying on the geometry.
            # argmin is stable → lowest code wins ties deterministically
            d = np.zeros((x.shape[0], c.shape[0], c.shape[1]))
            for w in range(c.shape[2]):
                t = x[:, :, None, w] - c[None, :, :, w]
                d = d + t * t
            codes = d.argmin(axis=2)
            return pd.Series(list(codes.astype("int32")))

        return encode

    for _ in range(lloyd_iters):
        enc = _encode_udf(codebook)
        assigned = emb.withColumn("_codes", enc(F.col("_v")))
        cells = (
            assigned.select(F.posexplode("_v").alias("_pos", "_x"), "_codes")
            .select(
                (F.col("_pos") / dsub).cast("int").alias("_j"),
                (F.col("_pos") % dsub).alias("_w"),
                F.element_at("_codes", (F.col("_pos") / dsub).cast("int") + 1).alias(
                    "_c"
                ),
                "_x",
            )
            .groupBy("_j", "_c", "_w")
            .agg(F.avg("_x").alias("_mu"))
            .collect()
        )
        new = codebook.copy()
        for r in cells:
            new[int(r["_j"]), int(r["_c"]), int(r["_w"])] = r["_mu"]
        codebook = new

    enc = _encode_udf(codebook)
    codes = emb.select(id_col, enc(F.col("_v")).alias("_codes"))

    # Per-query ADC lookup table: key j*ksub+c -> partial squared
    # distance of the query's sub-vector j to codebook cell (j, c).
    q_rows = queries.select(
        F.col(query_id_col), _unit(F.col(query_vec_col)).alias("_q")
    ).collect()
    spark = embeddings.sparkSession
    lut_rows = []
    for r in q_rows:
        q = np.asarray(r["_q"], dtype="float64").reshape(m, dsub)
        # same sequential dsub fold as _encode_udf (oracle's _SUBDIST)
        part = np.zeros((m, codebook.shape[1]))  # (m, ksub)
        for w in range(dsub):
            t = q[:, None, w] - codebook[:, :, w]
            part = part + t * t
        lut_rows.append((r[query_id_col], [float(x) for x in part.reshape(-1)]))
    lut = spark.createDataFrame(
        lut_rows, f"{query_id_col} long, _lut array<double>"
    )

    # Unrolled flat sum in fixed sub-space order: codegen-able, O(1)
    # array lookups, deterministic summation.
    terms = [
        F.element_at(
            F.col("_lut"),
            F.lit(j * ksub + 1) + F.element_at(F.col("_codes"), j + 1),
        )
        for j in range(m)
    ]
    adc = terms[0]
    for t in terms[1:]:
        adc = adc + t
    scored = (
        codes.crossJoin(F.broadcast(lut))
        .select(query_id_col, id_col, adc.alias("_adc"))
        .where(F.col(query_id_col) != F.col(id_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("_adc").asc(), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        # unrounded ADC distance — callers round once (ADVICE r7 #2)
        .select(
            query_id_col,
            id_col,
            F.col("_adc").alias("adc_dist"),
            F.col("_rn").alias("rank"),
        )
    )
