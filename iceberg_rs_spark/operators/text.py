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


def token_count_from_tokens(w: Column) -> Column:
    """:func:`token_count` over a staged token-array column. The raw
    column is not needed: ``normalize`` is empty iff the token array
    is exactly ``[""]`` (split of "" yields one empty pseudo-token,
    and a trimmed non-empty normalization never produces an empty
    token), so the empty-document guard reads the array itself."""
    empty = (F.size(w) == 1) & (F.element_at(w, 1) == F.lit(""))
    return F.when(empty, F.lit(0)).otherwise(F.size(w)).cast("long")


def stopword_ratio_from_tokens(w: Column) -> Column:
    """:func:`stopword_ratio` over a staged token-array column
    (guide §4: interpreted HOF lambdas re-evaluate outer expressions,
    so passing ``tokens(col)`` inline re-tokenizes per reference —
    stage the array once and share it)."""
    stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return F.when(F.size(w) > 0, stop / F.size(w)).otherwise(F.lit(0.0))


def avg_word_len_from_tokens(w: Column) -> Column:
    """:func:`avg_word_len` over a staged token-array column."""
    total = F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return F.when(F.size(w) > 0, total / F.size(w)).otherwise(F.lit(0.0))


def quality_score_from_tokens(col: Column, w: Column) -> Column:
    """:func:`quality_score` with the stopword term read from a staged
    token array (the length/punctuation terms still read the raw
    column — they are single regex/length expressions, not
    token-array re-derivations)."""
    len_score = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio_from_tokens(w) * 5, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 10)
    return len_score * 0.4 + stop_score * 0.3 + punct_penalty * 0.3


def approx_bpe_token_count(col: Column) -> Column:
    """BPE-ish estimate: word-piece splits on 4-char chunks — a
    deterministic stand-in for a real tokenizer's token count."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
    )


def approx_bpe_token_count_from_tokens(w: Column) -> Column:
    """:func:`approx_bpe_token_count` over a staged token-array column."""
    return F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.ceil(F.length(x) / F.lit(4.0)).cast("long"),
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
    """Per-document stats with the normalization STAGED once (r14,
    guide §4.1/§1.2 per-task work): the naive form evaluates
    ``tokens(c)`` — lower + two regex passes + split — once per metric
    (~6× per row; interpreted HOF references defeat codegen
    subexpression elimination). Staging ``_norm``/``_w`` as columns
    makes every metric an attribute read; measured 1.45-1.74 s →
    0.96-1.09 s steady-state on the sf0.1 documents fixture, identical
    output."""
    c = F.col(text_col)
    staged = df.select(
        F.col(id_col), c.alias(text_col), normalize(c).alias("_norm")
    ).withColumn("_w", F.split(F.col("_norm"), " "))
    w = F.col("_w")
    return staged.select(
        F.col(id_col),
        F.when(F.length("_norm") == 0, F.lit(0))
        .otherwise(F.size(w))
        .cast("long")
        .alias("n_tokens"),
        F.length(c).cast("long").alias("n_chars_actual"),
        F.round(avg_word_len_from_tokens(w), 4).alias("avg_word_len"),
        F.round(stopword_ratio_from_tokens(w), 4).alias("stopword_ratio"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(quality_score_from_tokens(c, w), 4).alias("quality"),
        h60(F.col("_norm")).alias("fingerprint"),
    )


def _top_gram_frac(w: Column, k: int) -> Column:
    """Mass fraction of the most frequent word k-gram, computed
    PER ROW: sort the k-gram array, then one O(grams) pass finds the
    longest run of equal adjacent grams (= the max multiplicity —
    exactly ``MAX(c)`` of the grouped count). ``max_run / n_grams`` is
    the same value the explode → count → max/sum rollup produced."""
    g = F.array_sort(shingles_of_tokens(w, k))
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc, x):
        # first element: x == NULL prev is NULL -> otherwise(1)
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    best = F.aggregate(g, acc0, merge, lambda acc: acc["best"])
    return F.when(F.size(g) > 0, best / F.size(g)).otherwise(F.lit(0.0))


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_trigrams: bool = True,
) -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals per document:
    duplicate-word fraction (1 - distinct/total tokens) plus the mass
    fraction of the single most frequent word bigram (and trigram).

    All three signals are PER-ROW column expressions (r14, guide
    §2.4 "remove shuffles outright"): the top-n-gram fraction is the
    max multiplicity over the row's own grams, found by sorting the
    gram array and taking the longest equal-adjacent run — O(g log g)
    native sort + O(g) interpreted pass per row, NOT the O(g²)
    distinct-count HOF this operator's earlier explode shape was
    guarding against. The previous explode → two keyed aggregations →
    join shape shuffled every gram of the corpus twice; this one
    shuffles nothing — per-doc signals stay embarrassingly parallel at
    any scale (callers spread single-file scans first, see
    ``skew.spread_by_range``). Measured on sf0.1: 3.9-5.4 s → 1.5 s
    steady-state for the full text_repetition_signals query, identical
    output including the gram-free (< k tokens) and NULL-text edges.

    ``include_trigrams=False`` skips the trigram signal for callers
    that only gate on the bigram fraction (prepare_training_corpus) —
    the trigram column was ~half the gram work and its value was
    dropped unread."""
    c = F.col(text_col)
    staged = df.select(F.col(id_col), tokens(c).alias("w"))
    w = F.col("w")
    cols = [
        F.col(id_col),
        F.size(w).alias("n_tok"),
        F.when(
            F.size(w) > 0,
            1.0 - F.size(F.array_distinct(w)) / F.size(w),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
        _top_gram_frac(w, 2).alias("top_bigram_frac"),
    ]
    if include_trigrams:
        cols.append(_top_gram_frac(w, 3).alias("top_trigram_frac"))
    return staged.select(*cols)


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
