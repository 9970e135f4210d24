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


def words_col(text: Column) -> Column:
    """Whitespace word array of a text column (empty for blank text) —
    THE canonical tokenization every text operator shares, and what the
    DuckDB oracles mirror with ``string_split_regex(trim(text),
    '\\s+')``.  Change it here and every operator (and oracle) moves
    together."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


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
    from .dedup import content_fingerprint

    canon = F.lower(F.trim(F.col(text_col)))
    return df.withColumn(
        "content_fp", content_fingerprint(text_col)
    ).withColumn("fp64", F.xxhash64(canon))


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
    # stage the rolling-hash array as an ATTRIBUTE before the window
    # minima reference it once per window position — slicing the raw
    # expression inside the transform lambda re-evaluates the whole
    # n-pass ladder (split included) per element, O(L²) per document
    staged = df.withColumn("__wf_acc", acc)
    acc = F.col("__wf_acc")
    nwin = F.size(acc) - (window - 1)
    mins = F.transform(
        F.sequence(F.lit(1), nwin),
        lambda i: F.array_min(F.slice(acc, i, window)),
    )
    fps = F.when(nwin >= 1, F.array_distinct(mins)).otherwise(
        F.array(F.xxhash64(F.lower(F.trim(F.col(text_col)))))
    )
    return staged.withColumn(out_col, fps).drop("__wf_acc")


# ---------------------------------------------------------------------------
# Gopher-style repetition stats and quality rules (Rae et al. 2021 §A1;
# public heuristics).  All pure JVM higher-order functions — every value
# is SQL-portable so the DuckDB oracle pins it exactly.
# ---------------------------------------------------------------------------

def _sum_len(arr: Column) -> Column:
    """Total characters across an array of strings (JVM aggregate)."""
    return F.aggregate(arr, F.lit(0), lambda acc, x: acc + F.length(x))


def _frac(num: Column, den: Column) -> Column:
    return F.round(
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
    )


def add_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (Gopher-style), zero Python:

    - ``dup_line_frac`` / ``dup_line_char_frac`` — fraction of lines
      (split on newline) / of line characters occurring more than once;
    - ``dup_word_frac`` / ``dup_word_char_frac`` — the same at the
      whitespace-word level.

    "Duplicate" mass is counted as total minus one-copy-each
    (``size(x) − size(array_distinct(x))``), the standard formulation;
    blank docs score 0 everywhere."""
    t = F.trim(F.col(text_col))
    lines = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.col(text_col), r"\n")
    )
    words = words_col(F.col(text_col))
    out = df
    for name, arr in (("line", lines), ("word", words)):
        dis = F.array_distinct(arr)
        out = out.withColumn(
            f"dup_{name}_frac", _frac(F.size(arr) - F.size(dis), F.size(arr))
        ).withColumn(
            f"dup_{name}_char_frac", _frac(_sum_len(arr) - _sum_len(dis), _sum_len(arr))
        )
    return out


def top_ngram_frac(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per document: the most frequent word ``n``-gram's occurrence
    count and the fraction of word characters it covers (Gopher's
    "fraction of characters in the most common n-gram").

    Plan shape: explode n-grams inside the scan stage → ONE partial-agg
    groupBy (doc, gram) → ONE groupBy (doc) taking ``max(struct(count,
    chars))`` — no window, no second shuffle beyond the key change, and
    ties resolve on (count, chars-per-occurrence) so the resulting
    fraction is deterministic even when the argmax gram is not unique.

    Returns ``(id_col, top_ngram_count, top_ngram_char_frac)``.
    """
    from .decontam import ngrams_col

    words = words_col(F.col(text_col))
    base = df.select(
        F.col(id_col), words.alias("__w"), _sum_len(words).alias("__chars")
    )
    grams = base.select(
        id_col, "__chars", F.explode(ngrams_col(F.col("__w"), n)).alias("__ng")
    )
    counts = grams.groupBy(id_col, "__ng").agg(
        F.count(F.lit(1)).alias("__c"), F.first("__chars").alias("__chars")
    )
    top = counts.groupBy(id_col).agg(
        F.max(F.struct(F.col("__c"), _sum_len(F.col("__ng")).alias("__g"))).alias("__t"),
        F.first("__chars").alias("__chars"),
    )
    return top.select(
        F.col(id_col),
        F.col("__t.__c").alias("top_ngram_count"),
        _frac(F.col("__t.__c") * F.col("__t.__g"), F.col("__chars")).alias(
            "top_ngram_char_frac"
        ),
    )


def add_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_dup_word_frac: float = 0.6,
    min_alpha_word_frac: float = 0.8,
    min_distinct_stopwords: int = 1,
) -> DataFrame:
    """Gopher-style rule columns (each a boolean) + ``passes_quality``:

    - ``rule_word_count``: word count within [min_words, max_words];
    - ``rule_mean_word_len``: mean word length within bounds;
    - ``rule_dup_words``: duplicate-word fraction ≤ cap;
    - ``rule_alpha_words``: ≥ ``min_alpha_word_frac`` of words contain
      a letter;
    - ``rule_stopwords``: ≥ ``min_distinct_stopwords`` distinct
      stopwords present (Gopher's "has common English words" proxy).

    Thresholds are data-dependent knobs, not constants to trust — the
    defaults suit the synthetic corpus; tune per corpus.  Existing
    columns with these names are OVERWRITTEN (recompute semantics);
    use ``quality_filter`` when you only want the predicate."""
    for name, col in _quality_rule_cols(
        text_col, min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_dup_word_frac, min_alpha_word_frac, min_distinct_stopwords,
    ).items():
        df = df.withColumn(name, col)
    return df


def _quality_rule_cols(
    text_col, min_words, max_words, min_mean_word_len, max_mean_word_len,
    max_dup_word_frac, min_alpha_word_frac, min_distinct_stopwords,
) -> "dict[str, Column]":
    """The rule expressions themselves, name → boolean Column — shared
    by ``add_quality_rules`` (materializes columns, OVERWRITING any
    same-named caller columns) and ``quality_filter`` (filters on the
    conjunction directly, so caller columns are never touched)."""
    words = words_col(F.lower(F.col(text_col)))
    nw = F.size(words)
    mean_len = F.when(nw > 0, _sum_len(words).cast("double") / nw).otherwise(F.lit(0.0))
    dup_frac = F.when(
        nw > 0, (nw - F.size(F.array_distinct(words))).cast("double") / nw
    ).otherwise(F.lit(0.0))
    alpha = F.size(F.filter(words, lambda x: x.rlike("[a-z]")))
    alpha_frac = F.when(nw > 0, alpha.cast("double") / nw).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), stop_arr))
    rules = {
        "rule_word_count": (nw >= min_words) & (nw <= max_words),
        "rule_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "rule_dup_words": dup_frac <= max_dup_word_frac,
        "rule_alpha_words": alpha_frac >= min_alpha_word_frac,
        "rule_stopwords": n_stop >= min_distinct_stopwords,
    }
    passes = None
    for col in rules.values():
        passes = col if passes is None else passes & col
    rules["passes_quality"] = passes
    return rules


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_dup_word_frac: float = 0.6,
    min_alpha_word_frac: float = 0.8,
    min_distinct_stopwords: int = 1,
) -> DataFrame:
    """``df`` restricted to rows passing every quality rule — the
    predicate is applied directly (no intermediate columns), so
    pre-existing caller columns named ``rule_*``/``passes_quality``
    are neither read nor clobbered and the schema is preserved."""
    rules = _quality_rule_cols(
        text_col, min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_dup_word_frac, min_alpha_word_frac, min_distinct_stopwords,
    )
    return df.where(rules["passes_quality"])


# ---------------------------------------------------------------------------
# PII / pattern scrubbing (Dolma/C4-style masking).  Patterns are kept
# RE2-compatible (no lookaround, no backrefs) so the same regex runs
# identically on Spark (Java regex) and the DuckDB oracle (RE2).
# ---------------------------------------------------------------------------

#: name -> (pattern, replacement). Order matters: URL before EMAIL would
#: not change results here, but the dict order is the applied order.
DEFAULT_SCRUB_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def scrub_patterns(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
    out_col: str | None = None,
    with_counts: bool = True,
) -> DataFrame:
    """Mask PII-ish spans in ``text_col`` (default: emails, URLs, IPv4)
    and, with ``with_counts``, add an ``n_<name>`` match count per
    pattern — all whole-stage-codegen ``regexp_replace`` /
    ``regexp_count`` expressions, no Python.

    Counts are computed on the ORIGINAL text (before any replacement),
    so pattern order cannot hide matches from the counts; replacements
    are applied in dict order.  Existing ``n_<name>``/``out_col``
    columns are overwritten.  Masking is heuristic, not a guarantee —
    the default patterns trade recall for precision (no phone numbers:
    locale formats false-positive too much on numeric corpora)."""
    out_col = out_col or text_col
    patterns = DEFAULT_SCRUB_PATTERNS if patterns is None else patterns
    t = F.col(text_col)
    out = df
    if with_counts:
        for name, (pat, _) in patterns.items():
            out = out.withColumn(f"n_{name}", F.regexp_count(t, F.lit(pat)))
    scrubbed = t
    for _, (pat, repl) in patterns.items():
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn(out_col, scrubbed)


def chunk_words(
    df: DataFrame,
    max_words: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into training-context chunks of ≤ ``max_words``
    whitespace words with ``overlap`` words of context carry-over —
    ``(id_col, chunk_id, chunk_text, n_words)``, chunk_id 1-based in
    document order.  Chunking is row-local whole-stage codegen
    (``sequence`` → ``transform`` → ``slice`` → ``array_join`` →
    ``posexplode``): no shuffle, no Python, and a 100 TB corpus chunks
    in a single map stage.  Blank docs produce no chunks; the word
    count of every chunk except possibly the last equals ``max_words``
    and the last is the remainder (conservation: sum(n_words) =
    doc words + overlap·(chunks−1))."""
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    if not (0 <= overlap < max_words):
        raise ValueError(f"overlap must be in [0, max_words), got {overlap}")
    stride = max_words - overlap
    base = df.select(F.col(id_col), words_col(F.col(text_col)).alias("__cw_w"))
    nw = F.size("__cw_w")
    n_chunks = F.when(
        nw <= max_words, F.least(nw, F.lit(1))
    ).otherwise(F.ceil((nw - F.lit(max_words)) / F.lit(stride)) + 1)
    chunks = F.transform(
        F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1))),
        lambda i: F.slice(F.col("__cw_w"), (i - 1) * stride + 1, max_words),
    )
    out = base.select(
        F.col(id_col),
        F.posexplode(F.when(nw >= 1, chunks).otherwise(
            F.array().cast("array<array<string>>")
        )).alias("__cw_pos", "__cw_chunk"),
    )
    return out.select(
        F.col(id_col),
        (F.col("__cw_pos") + 1).alias("chunk_id"),
        F.array_join("__cw_chunk", " ").alias("chunk_text"),
        F.size("__cw_chunk").alias("n_words"),
    )


def dedup_lines_within(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    sep: str = "\n",
    count_col: str = "n_removed_lines",
) -> DataFrame:
    """Remove REPEATED lines within each document, keeping the first
    occurrence in order — the within-document half of line dedup
    (``remove_boilerplate_lines`` is the cross-document half): nav
    menus pasted per section, chat headers, scraped pagination repeat
    INSIDE a page and never reach ``min_docs`` across pages.  Standard
    public-pipeline cleaning (duplicate-line removal à la
    MassiveText/RefinedWeb repetition rules, here exact instead of
    threshold-gated).

    One row-local whole-stage-codegen expression — split, index-aware
    ``filter`` keeping line *i* iff ``array_position`` says *i* is its
    first occurrence, rejoin — no shuffle, no Python.
    ``array_position`` inside ``filter`` is O(L²) in the document's
    LINE count, all JVM-side; lines per document are bounded in
    practice (a 10k-line document is 10⁸ comparisons — gate upstream
    if your corpus has those).

    Adds ``count_col`` (lines removed, computed pre-rewrite) and
    rewrites ``text_col`` (or ``out_col``).  NULL text stays NULL with
    a NULL count.  Empty lines dedup like any other line — blank-line
    runs collapse to the first blank; pass a custom ``sep`` (a LITERAL
    string — it is regex-escaped for the split) to change the line
    rule."""
    import re as _re

    out_col = out_col or text_col
    # stage the line array as an ATTRIBUTE: the filter lambda probes it
    # with array_position once per element, and referencing the raw
    # split() expression there re-splits the text per element — O(L²)
    # splits per document on top of the documented O(L²) comparisons
    staged = df.withColumn("__dl_lines", F.split(F.col(text_col), _re.escape(sep)))
    lines = F.col("__dl_lines")
    kept = F.filter(
        lines, lambda x, i: F.array_position(lines, x) == i + F.lit(1)
    )
    return staged.withColumn(
        count_col, (F.size(lines) - F.size(kept)).cast("int")
    ).withColumn(out_col, F.array_join(kept, sep)).drop("__dl_lines")
