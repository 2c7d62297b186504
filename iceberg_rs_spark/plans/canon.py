"""Cross-engine numeric canonicalization helpers.

``ROUND()`` on doubles differs at exact half-way points between Spark
(HALF_UP via BigDecimal) and DuckDB — and money data (2-decimal inputs)
hits halves *constantly* when averaged (sum_of_cents / n). ``rhalf``
instead computes ``floor(x * 10^n + 0.5) / 10^n`` — pure double
arithmetic, bit-identical in both engines. Use it for any output that
divides (avg, ratios); plain ROUND is fine for sums of 2-decimal data
(no third decimal to be half-way on) and for irrational-ish stats.

Apply ``rhalf`` exactly ONCE, to the RAW value. Composing it on top of
a prior ``F.round(x, n)`` silently substitutes Spark's BigDecimal
HALF_UP for the portable floor wherever the raw value sits near a
half at the (n+1)th decimal — a latent hash flake vs an oracle that
rhalfs the raw (ADVICE r7 #2; operators therefore return unrounded
scores and the plan layer owns display rounding).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rhalf(col: Column, n: int = 2) -> Column:
    scale = float(10**n)
    return F.floor(col * scale + F.lit(0.5)) / scale


def rhalf_sql(expr: str, n: int = 2) -> str:
    scale = float(10**n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
