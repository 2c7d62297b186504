"""Query operators beyond plain relational algebra (SURVEY.md §2C
north-star + §4.4 custom work): as-of join, per-group top-k, the dedup
family (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, and text analysis.

All are pure DataFrame transforms — no driver-side collects, no
unbounded crossJoins — so they scale with partition count."""

from iceberg_rs_spark.operators.joins import asof_join, interval_overlap_join  # noqa: F401
from iceberg_rs_spark.operators.topk import per_group_topk  # noqa: F401
