"""Text-analysis operators for LLM training-data pipelines
(SURVEY.md section 2.2: language-ID, quality scoring, token counting,
document fingerprinting).

Everything is built-in expression work (regexp, higher-order array
functions, md5) — zero Python in the hot path, so each operator is a
narrow projection Catalyst fuses into the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_export_spark.operators.dedup import normalized_text, word_shingles

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately small and fixed: language ID at pipeline scale is a
# first-pass router, not a classifier benchmark.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "es": ("el", "la", "los", "y", "es", "un", "una"),
}


def frequent_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Corpus-wide most-frequent word n-grams — the counting core of BPE /
    tokenizer training (count adjacent pairs, merge the winner, repeat)
    and of corpus contamination scans.

    Occurrences are counted (NOT distinct-per-doc shingles): explode →
    partial-aggregated count (map-side combine keeps the shuffle at
    |vocab|, not |tokens|) → global top-k with a lexicographic tiebreak
    for determinism. At 100 TB the shuffle carries one row per distinct
    n-gram per task — the vocabulary, not the corpus.
    """
    from hive_export_spark.operators.dedup import normalized_text

    toks = F.split(normalized_text(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        .limit(top_k)
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting three ways: whitespace words, BPE-ish regex tokens
    (word pieces + standalone punctuation), and the chars/4 estimate used
    for quick budget math."""
    words = F.split(normalized_text(text_col), " ")
    return df.withColumns(
        {
            "n_words": F.size(words),
            "n_regex_tokens": F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)
            ),
            "n_chars": F.length(text_col),
            "est_tokens": F.ceil(F.length(text_col) / 4).cast("long"),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals + a composite score in [0, 1].

    Signals (all cheap, all standard for pretraining filters):
    - mean word length (very low/high => boilerplate or garbage)
    - alpha ratio: fraction of chars that are letters
    - punctuation density
    - stopword ratio: hit rate of common English function words
    """
    words = F.split(normalized_text(text_col), " ")
    n_words = F.size(words)
    n_chars = F.length(text_col)
    alpha_chars = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    punct_chars = F.length(F.regexp_replace(text_col, r"[^.,;:!?]", ""))
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*LANG_MARKERS["en"]))
    )
    # try_divide on the char-denominated ratios: an EMPTY document has
    # n_chars = 0 and ANSI Spark raises where DuckDB yields NULL (a NULL
    # ratio then scores 0 through the when/CASE on both engines —
    # round-6 hostile sweep). n_words is never 0 (split('') is ['']).
    mean_word_len = (n_chars - (n_words - 1)) / n_words
    alpha_ratio = F.try_divide(alpha_chars, n_chars)
    punct_ratio = F.try_divide(punct_chars, n_chars)
    stop_ratio = stop_hits / n_words
    score = (
        F.when((mean_word_len >= 3) & (mean_word_len <= 10), 0.4).otherwise(0.0)
        + F.when(alpha_ratio >= 0.6, 0.3).otherwise(0.0)
        + F.when(punct_ratio <= 0.1, 0.1).otherwise(0.0)
        + F.when(stop_ratio >= 0.02, 0.2).otherwise(0.0)
    )
    return df.withColumns(
        {
            "mean_word_len": mean_word_len,
            "alpha_ratio": alpha_ratio,
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio,
            "quality_score": score,
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax over per-language hit counts.

    Deterministic tie-break by fixed language priority (dict order). At
    scale this is one pass over the token array per language — a handful
    of fused JVM expressions, no shuffle.
    """
    def marker_filter(markers: tuple[str, ...]):
        return lambda w: w.isin(*markers)

    words = F.split(normalized_text(text_col), " ")
    hit_cols = {
        lang: F.size(F.filter(words, marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_hits = hit_cols[langs[0]]
    for lang in langs[1:]:
        better = hit_cols[lang] > best_hits
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_hits = F.when(better, hit_cols[lang]).otherwise(best_hits)
    out = df.withColumns({f"hits_{lang}": c for lang, c in hit_cols.items()})
    return out.withColumn(
        "lang_pred", F.when(best_hits > 0, best).otherwise(F.lit("und"))
    )


def document_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: full-text md5 plus a shingle-anchor fingerprint
    (lexicographic min of shingle md5s — a 1-permutation MinHash usable as
    a cheap near-dup blocking key; identical across engines)."""
    return df.withColumns(
        {
            "content_md5": F.md5(normalized_text(text_col)),
            "anchor_fp": F.array_min(
                F.transform(word_shingles(text_col), lambda s: F.md5(s))
            ),
        }
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition signals (the Gopher/RefinedWeb-style
    repetition quality gate): highly repetitive documents are boilerplate
    or generation loops and get filtered before training.

    - distinct_word_ratio: |distinct words| / |words|
    - top_word_ratio: occurrences of the most frequent word / |words|
    - dup_bigram_ratio: 1 - |distinct bigrams| / |bigrams|

    All from higher-order array functions over one row — zero shuffle,
    fully codegen'd; ratios are int/int divisions so both engines produce
    bit-identical doubles.
    """
    words = F.split(normalized_text(text_col), " ")
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    # most-frequent-word count: for each distinct word, count its
    # occurrences via filter; take the max
    top_count = F.array_max(
        F.transform(
            F.array_distinct(words),
            lambda w: F.size(F.filter(words, lambda x: x == w)),
        )
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_words - 1, F.lit(1))),
        lambda i: F.array_join(F.slice(words, i, 2), " "),
    )
    n_bigrams = F.size(bigrams)
    n_distinct_bigrams = F.size(F.array_distinct(bigrams))
    return df.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        (n_distinct.cast("double") / n_words.cast("double")).alias(
            "distinct_word_ratio"
        ),
        (top_count.cast("double") / n_words.cast("double")).alias(
            "top_word_ratio"
        ),
        # NULL text must yield a NULL ratio, not an engine-improvised
        # value: Spark's greatest(NULL-1, 1) = 1 builds a [NULL] bigram
        # list (ratio 0.0) while DuckDB's range(1, NULL) builds []
        # (ratio 1.0) — pinned NULL on both sides (NULL-wave sweep)
        F.when(
            F.col(text_col).isNotNull(),
            F.lit(1.0)
            - n_distinct_bigrams.cast("double") / n_bigrams.cast("double"),
        ).alias("dup_bigram_ratio"),
    )
