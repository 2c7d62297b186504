"""Text-analysis operators over the documents table (SURVEY.md §2C
north-star): normalization/tokenization, shingling, quality scoring,
language-ID heuristic, token counting, fingerprinting.

Everything is built from pyspark.sql.functions (JVM-side, inside
whole-stage codegen) — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60, h60_seeded

#: deterministic stopword list shared with the oracle SQL
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

#: marker tokens for the rule-based language-ID heuristic; scored by
#: marker hits, ties broken by this declaration order.
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "das", "ist"),
    "es": ("el", "los", "de", "es"),
    "fr": ("le", "les", "et", "est"),
    "zh": ("shi", "de_zh", "le_zh", "he_zh"),
}


def normalize(col: Column) -> Column:
    """lower → strip non-alphanumerics → squeeze spaces → trim."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def tokens(col: Column) -> Column:
    return F.split(normalize(col), " ")


def shingles_of_tokens(w: Column, k: int = 3) -> Column:
    """Word k-grams of a token array. Pass a *materialized column*
    (attribute), not a nested expression: interpreted HOF lambdas
    re-evaluate outer expressions once per element, so a `tokens(...)`
    expression here costs O(words²) regexes per row, while an
    attribute read is O(1)."""
    n = F.size(w)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(w, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-grams of the normalized text (the MinHash substrate).
    Convenience form over a raw text column — fine for one-shot use;
    staged pipelines should tokenize into a column first and call
    :func:`shingles_of_tokens` (see docstring there)."""
    return shingles_of_tokens(tokens(col), k)


def token_count(col: Column) -> Column:
    t = tokens(col)
    return F.when(F.length(normalize(col)) == 0, F.lit(0)).otherwise(F.size(t)).cast("long")


def approx_bpe_token_count(col: Column) -> Column:
    """BPE-ish estimate: word-piece splits on 4-char chunks — a
    deterministic stand-in for a real tokenizer's token count."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
    )


def stopword_ratio(col: Column) -> Column:
    t = tokens(col)
    stop = F.size(F.filter(t, lambda w: w.isin(*STOPWORDS)))
    return F.when(F.size(t) > 0, stop / F.size(t)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(F.lower(col), "[a-z0-9 ]", "")
    return F.when(F.length(col) > 0, F.length(stripped) / F.length(col)).otherwise(F.lit(0.0))


def avg_word_len(col: Column) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Length/punctuation/stopword-based quality heuristic in [0,1]:
    rewards mid-length docs with natural stopword density and low
    symbol noise (the usual pretraining-data filter shape)."""
    len_score = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 10)
    return len_score * 0.4 + stop_score * 0.3 + punct_penalty * 0.3


def detect_language(col: Column, markers: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Marker-token n-gram heuristic over a raw text column. The
    expression references the token array ~3× per language; staged
    pipelines should tokenize into a column first and call
    :func:`detect_language_from_tokens` (interpreted expressions
    re-evaluate per reference — see shingles_of_tokens)."""
    return detect_language_from_tokens(tokens(col), markers)


def detect_language_from_tokens(
    t: Column, markers: dict[str, tuple[str, ...]] | None = None
) -> Column:
    """Deterministic argmax over marker-token hits with
    declaration-order tie-break. (A real engine would plug a model
    here; the operator shape — pure column expression — is the point.)"""

    def marker_hits(ms: tuple[str, ...]):
        # closure factory: PySpark derives the lambda arity from its
        # parameter count, so defaults like `lambda w, m=ms:` misbind
        return lambda w: w.isin(*ms)

    scores = {
        lang: F.size(F.filter(t, marker_hits(ms)))
        for lang, ms in (markers or LANG_MARKERS).items()
    }
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang, score in scores.items():  # declaration order breaks ties
        expr = expr.when(score == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: h60 of the normalized text (rolling-hash
    stand-in; same value cross-engine)."""
    return h60(normalize(col))


def min_shingle_fingerprint(col: Column, k: int = 3, seed: int = 0) -> Column:
    """MinHash-1 fingerprint — robust to local edits."""
    sh = shingles(col, k)
    return F.when(
        F.size(sh) > 0, F.array_min(F.transform(sh, lambda s: h60_seeded(seed, s)))
    ).otherwise(F.lit(None).cast("long"))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        F.length(c).cast("long").alias("n_chars_actual"),
        F.round(avg_word_len(c), 4).alias("avg_word_len"),
        F.round(stopword_ratio(c), 4).alias("stopword_ratio"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(quality_score(c), 4).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals per document:
    duplicate-word fraction (1 - distinct/total tokens) plus the mass
    fraction of the single most frequent word bigram and trigram.

    The duplicate-word fraction is a pure column expression. The
    top-n-gram fractions need per-gram counts, so the n-grams explode
    into (doc, k, gram) rows — bigrams and trigrams TOGETHER in one
    generator pass — then two keyed aggregations (count per gram, then
    max/total per doc) roll them back up. One explode and two shuffles
    on the doc key total, pivoted by k in the second aggregate; at
    100 TB this is the shape that works — per-doc HOF counting of
    distinct grams would be O(grams²) per row in interpreted lambdas,
    and a driver-side counter would not be distributed at all."""
    c = F.col(text_col)
    staged = df.select(F.col(id_col), tokens(c).alias("w"))
    base = staged.select(
        id_col,
        F.size("w").alias("n_tok"),
        F.when(
            F.size("w") > 0,
            1.0 - F.size(F.array_distinct("w")) / F.size("w"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
    )
    grams = staged.select(
        id_col,
        F.explode(
            F.concat(
                F.transform(
                    shingles_of_tokens(F.col("w"), 2),
                    lambda g: F.struct(F.lit(2).alias("k"), g.alias("g")),
                ),
                F.transform(
                    shingles_of_tokens(F.col("w"), 3),
                    lambda g: F.struct(F.lit(3).alias("k"), g.alias("g")),
                ),
            )
        ).alias("kg"),
    ).select(id_col, F.col("kg.k").alias("k"), F.col("kg.g").alias("g"))
    per_gram = grams.groupBy(id_col, "k", "g").agg(F.count("*").alias("c"))
    per_doc = (
        per_gram.groupBy(id_col)
        .pivot("k", [2, 3])
        .agg((F.max("c") / F.sum("c")).alias("frac"))
        .withColumnsRenamed({"2": "top_bigram_frac", "3": "top_trigram_frac"})
    )
    return (
        base.join(per_doc, id_col, "left")
        .withColumn("top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0)))
        .withColumn("top_trigram_frac", F.coalesce("top_trigram_frac", F.lit(0.0)))
    )


def winnowing_fingerprints(
    col: Column, k: int = 8, window: int = 6, seed: int = 7
) -> Column:
    """Winnowing sketch as a single column expression — ONLY for tiny
    inputs: interpreted HOF lambdas re-evaluate the outer expression
    per element, so the window-minimum pass re-derives the whole
    k-gram hash array per window position (O(n²) hashing per row).
    Pipelines must use :func:`winnowing_fingerprints_staged`, which
    stages the hash array as a materialized column first."""
    norm_c = normalize(col)
    hs = _kgram_hashes(norm_c, k, seed)
    return _window_minima(hs, window)


def _kgram_hashes(norm_c: Column, k: int, seed: int) -> Column:
    n = F.length(norm_c)
    # guard n < k explicitly: Spark's sequence(1, 0) is DESCENDING
    # [1, 0], not empty
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: h60_seeded(seed, norm_c.substr(i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _window_minima(hs: Column, window: int) -> Column:
    n_windows = F.size(hs) - (window - 1)
    mins = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(hs, j, window)),
        ),
    ).otherwise(
        # short doc: one window over whatever k-grams exist (possibly none)
        F.when(F.size(hs) > 0, F.array(F.array_min(hs))).otherwise(
            F.array().cast("array<bigint>")
        )
    )
    return F.array_sort(F.array_distinct(mins))


def winnowing_fingerprints_staged(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    window: int = 6,
    seed: int = 7,
    out_col: str = "fingerprints",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    algorithm): hash every character k-gram of the normalized text,
    slide a window of ``window`` consecutive k-gram hashes, and keep
    the minimum of each window; the distinct minima (sorted) are the
    document's sketch. Guarantees every exact match of length
    >= k + window - 1 shares a fingerprint — the rolling-hash dedup
    sketch (Rabin-Karp's rolling update is an O(1)-per-shift
    optimization of the same k-gram hash sequence; the portable h60
    keeps the sketch oracle-checkable).

    The k-gram hash array is STAGED as a materialized column between
    the two HOF passes — an interpreted lambda re-evaluates its outer
    expression per element, so an unstaged window-minimum pass would
    re-derive the whole hash array per window position (O(n²) hashing
    per row; same trap as shingles_of_tokens)."""
    staged = df.withColumn("_norm", normalize(F.col(text_col))).withColumn(
        "_hs", _kgram_hashes(F.col("_norm"), k, seed)
    )
    return staged.withColumn(out_col, _window_minima(F.col("_hs"), window)).drop(
        "_norm", "_hs"
    )
