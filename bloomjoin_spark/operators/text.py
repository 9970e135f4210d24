"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, content fingerprinting.

All hot-path logic is JVM-side ``pyspark.sql.functions`` expressions
(whole-stage codegen; no Python at all), deliberately built from
SQL-portable primitives so the DuckDB oracle can pin every value.

These operate on the ``documents`` table shape
(doc_id, text, lang, source, n_chars) and the F0 token table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets (deterministic heuristic —
# not a trained model; the lang-ID contract is "argmax of marker hits").
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "es", "una"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"]


def token_count_col(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def word_marker_hits(text: Column, words: list[str]) -> Column:
    """How many tokens of ``text`` are in ``words`` (JVM-side:
    split → filter → size; no UDF)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_chars_measured, avg_token_len, stopword_ratio,
    quality_score ∈ [0,1]."""
    t = F.col(text_col)
    n_tok = token_count_col(t)
    n_chars = F.length(t)
    stop_hits = word_marker_hits(t, STOPWORDS)
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    avg_tok = F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    # quality: length signal × sane-avg-token-length signal × has-stopwords
    len_sig = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    tok_sig = F.when((avg_tok >= 2.5) & (avg_tok <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_sig = F.least(stop_ratio * 5.0, F.lit(1.0))
    quality = F.round(len_sig * tok_sig * (0.5 + 0.5 * stop_sig), 6)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_chars_measured", n_chars)
        .withColumn("avg_token_len", F.round(avg_tok, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", quality)
    )


def add_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """lang_pred = argmax over marker-word hits ('und' = no hits).
    Deterministic tie-break: language order as in LANG_MARKERS."""
    t = F.col(text_col)
    hit_cols = {lang: word_marker_hits(t, words) for lang, words in LANG_MARKERS.items()}
    best = F.lit("und")
    best_hits = F.lit(0)
    # iterate in fixed order; strict > keeps the earlier language on ties
    for lang, hits in hit_cols.items():
        take = hits > best_hits
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_hits = F.when(take, hits).otherwise(best_hits)
    out = df.withColumn("lang_pred", best)
    return out


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """content_fp = md5 of lower(trim(text)) — exact-dup key, portable
    to any SQL engine; fp64 = xxhash64 for cheap joins."""
    canon = F.lower(F.trim(F.col(text_col)))
    return df.withColumn("content_fp", F.md5(canon)).withColumn(
        "fp64", F.xxhash64(canon)
    )


def bpe_ish_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token count: words + digit runs + punctuation marks
    counted separately (a cheap proxy for BPE token counts)."""
    t = F.col(text_col)
    words = token_count_col(t)
    # punctuation / digit-run counts via regexp_replace trick (portable)
    puncts = F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    digit_runs = F.size(
        F.filter(F.split(t, r"[^0-9]+"), lambda x: F.length(x) > 0)
    )
    return df.withColumn(
        "n_tokens_bpe_ish", (words + puncts + digit_runs).cast("int")
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    window: int = 4,
    out_col: str = "winnow_fps",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    MOSS-style): rolling n-gram hashes of the word stream, then the
    minimum hash of every length-``window`` window, deduplicated — any
    sufficiently long shared substring between two documents guarantees
    a shared fingerprint.  Pure JVM higher-order functions: per-token
    xxhash64 once, n−1 chained zip_with passes for the rolling n-gram
    hash (O(n·L)), then window minima via array_min over slices
    (O(window·L), window is a small constant).  Short docs (< n+window−1
    words) fall back to one whole-text fingerprint."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    th = F.transform(toks, lambda t: F.xxhash64(t))
    m = F.size(th) - (n - 1)
    acc = F.slice(th, 1, m)
    for i in range(1, n):
        acc = F.zip_with(acc, F.slice(th, F.lit(i + 1), m),
                         lambda a, b: F.xxhash64(a, b))
    nwin = F.size(acc) - (window - 1)
    mins = F.transform(
        F.sequence(F.lit(1), nwin),
        lambda i: F.array_min(F.slice(acc, i, window)),
    )
    fps = F.when(nwin >= 1, F.array_distinct(mins)).otherwise(
        F.array(F.xxhash64(F.lower(F.trim(F.col(text_col)))))
    )
    return df.withColumn(out_col, fps)
