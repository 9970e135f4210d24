"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship bloom_join on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query; sketch-estimate
queries return exact values + bound-check booleans so the oracle can
pin them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Bloom-prefiltered join of lineitem against a
    high-selectivity part subset, exactly equal to the plain join."""
    from bloomjoin_spark import bloom_join

    sf = "/root/testdata/sf0.001"
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = (
        _t(spark, sf, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    return bloom_join(
        li, part, on={"l_partkey": "p_partkey"}, how="inner", force_prefilter=True
    )


# ---------------------------------------------------------------------------
# queries — each callable (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def _bloom_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import bloom_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    return bloom_join(
        li, part, on={"l_partkey": "p_partkey"}, how="inner", force_prefilter=True
    )


def _bloom_inner_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 3: the all-JVM native engine (what engine='auto' dispatches
    to when metrics are off) under the same value-hash oracle as the
    sketch engine — identical output by contract."""
    from bloomjoin_spark import bloom_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    return bloom_join(
        li, part, on={"l_partkey": "p_partkey"}, how="inner",
        engine="native", force_prefilter=True, collect_metrics=False,
    )


def _bloom_inner_auto_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: AUTO mode on a small probe — the probe-size floor
    (plans/planner.py:MIN_PROBE_BYTES, the Spark re-expression of the
    reference's probe_rows < 1024 gate, R/bloomjoin.R:385-387) skips the
    prefilter on plan stats alone, and the output must still hash-match
    the plain-SQL join: the skip path is output-transparent under the
    driver's value-hash oracle."""
    from bloomjoin_spark import bloom_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    return bloom_join(
        li, part, on={"l_partkey": "p_partkey"}, how="inner",
        collect_metrics=False,
    )


def _hash_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: deterministic md5-prefix train/val/test split — the
    rule is plain SQL, so the DuckDB oracle computes the IDENTICAL
    assignment (portability is the operator's whole point: a row's
    split never depends on engine, partitioning, or corpus size)."""
    from bloomjoin_spark.operators import split_sizes

    docs = _t(spark, sf_dir, "documents")
    return split_sizes(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})


def _weighted_mixture_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: deterministic training-mix sampling — per-source rates
    decided by the same portable md5 bucket as hash_split; the oracle
    replicates the rule verbatim and must keep the IDENTICAL rows
    (pinned here as per-source kept counts)."""
    from bloomjoin_spark.operators import weighted_mixture

    docs = _t(spark, sf_dir, "documents")
    kept = weighted_mixture(
        docs, "doc_id", {"src0": 0.25, "src1": 1.0}, stratum_col="source",
        default_rate=0.5,
    )
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("source")
    )


def _decontam_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: benchmark decontamination (GPT-3/PaLM-style n-gram
    overlap) — Bloom prefilter over the benchmark side's word 6-grams,
    exact verify join, so the output is EXACT and the DuckDB oracle
    recomputes it with true list-equality joins.  Benchmark set:
    docs with doc_id % 29 == 3; flagged docs are those + their planted
    near-twins that share a 6-gram."""
    from bloomjoin_spark.operators import contaminated_docs, words_col

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 29 == 3)
    out = contaminated_docs(
        docs, bench, n=6, corpus_tokens=words_col(F.col("text"))
    )
    return out.orderBy("doc_id")


def _decontam_many_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: MULTI-SUITE decontamination
    (decontam.py:contaminated_docs_many) — per-suite attribution from
    ONE corpus scan (one Bloom over the union of both suites' word
    6-grams, one ladder-hash pass, per-suite exact verify).  The DuckDB
    oracle recomputes per-(doc, suite) distinct-gram counts with true
    list-equality joins, so the union-filter optimization is value-
    checked to be invisible in the output."""
    from bloomjoin_spark.operators import contaminated_docs_many, words_col

    docs = _t(spark, sf_dir, "documents")
    benches = {
        "eval_a": docs.where(F.col("doc_id") % 29 == 3),
        "eval_b": docs.where(F.col("doc_id") % 31 == 4),
    }
    out = contaminated_docs_many(
        docs, benches, n=6, corpus_tokens=words_col(F.col("text"))
    )
    return out.orderBy("doc_id", "suite")


def _decontam_tokens_f0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination on the north-rule TOKEN table: benchmark = 8-token
    windows cut from every 97th doc; the Bloom-prefiltered result must
    equal the exact explode-join result gram-for-gram (prefilter can
    never change the answer), and every benchmark source doc must be
    flagged (token-array fidelity through slice/hash/join)."""
    from bloomjoin_spark.operators import contaminated_docs, ngrams_col

    toks = _f0(spark)
    docnum = F.substring("doc_id", 5, 16).cast("bigint")
    is_src = (docnum % 97 == 0) & (F.size("tokens") >= 12)
    bench = toks.where(is_src).select(F.slice("tokens", 3, 8).alias("tokens"))
    # localCheckpoint: got/exact feed four comparison actions below —
    # without it each action rebuilds the filter and rescans the table
    got = contaminated_docs(toks, bench, n=8).localCheckpoint(eager=False)
    c = toks.select("doc_id", F.explode(ngrams_col(F.col("tokens"), 8)).alias("ng"))
    b = bench.select(F.explode(ngrams_col(F.col("tokens"), 8)).alias("ng")).distinct()
    exact = c.join(b, "ng").groupBy("doc_id").agg(
        F.count_distinct("ng").alias("n_hits")
    ).localCheckpoint(eager=False)
    diff = got.exceptAll(exact).count() + exact.exceptAll(got).count()
    n_src = toks.where(is_src).count()
    n_src_flagged = got.join(
        toks.where(is_src).select("doc_id"), "doc_id", "semi"
    ).count()
    return spark.createDataFrame(
        [(int(got.count()), bool(diff == 0), bool(n_src_flagged == n_src))],
        "n_flagged bigint, matches_exact boolean, all_sources_flagged boolean",
    )


def _boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: corpus-level boilerplate line removal (CCNet-style) —
    lines in ≥2 distinct docs are dropped, text reassembled in order,
    rows never dropped.  The synthetic corpus has single-line docs, so
    boilerplate here = planted exact-dup texts: those docs come back
    with empty text and everything else is byte-identical.  The oracle
    recomputes the whole pipeline with true string equality."""
    from bloomjoin_spark.operators import remove_boilerplate_lines

    docs = _t(spark, sf_dir, "documents")
    out = remove_boilerplate_lines(docs, min_docs=2)
    return out.select("doc_id", "text").orderBy("doc_id")


def _repetition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: Gopher-style within-doc repetition signals — duplicate
    word fraction / duplicate-word char fraction (pure JVM array
    functions) plus the most-frequent word 2-gram's count and char
    coverage (one partial-agg groupBy, deterministic tie-break on
    (count, gram chars)).  Every value is plain arithmetic over the
    word array, so the oracle pins all four columns exactly."""
    from bloomjoin_spark.operators import add_repetition_stats, top_ngram_frac

    docs = _t(spark, sf_dir, "documents")
    rep = add_repetition_stats(docs).select(
        "doc_id", "dup_word_frac", "dup_word_char_frac"
    )
    top = top_ngram_frac(docs, n=2)
    return rep.join(top, "doc_id").orderBy("doc_id")


def _quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: Gopher-style rule-based quality filter — five boolean
    rules (word count, mean word length, duplicate-word cap, alpha-word
    fraction, stopword presence) and their conjunction, per document.
    Rules are JVM-side comparisons on exact integer/double arithmetic,
    replicated verbatim by the oracle."""
    from bloomjoin_spark.operators import add_quality_rules

    docs = _t(spark, sf_dir, "documents")
    return add_quality_rules(docs).select(
        "doc_id",
        "rule_word_count",
        "rule_mean_word_len",
        "rule_dup_words",
        "rule_alpha_words",
        "rule_stopwords",
        "passes_quality",
    ).orderBy("doc_id")


def _source_divergence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: corpus-mixture monitoring — exact KL(source ‖ corpus)
    over per-source WORD distributions (no smoothing needed: source
    support ⊆ corpus support).  One corpus-sized shuffle, then
    vocabulary-sized arithmetic the oracle replicates step by step."""
    from bloomjoin_spark.operators import group_token_divergence, words_col

    docs = _t(spark, sf_dir, "documents")
    return group_token_divergence(
        docs, group_col="source", tokens=words_col(F.col("text"))
    ).orderBy("source")


def _scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: PII scrubbing (Dolma/C4-style masking) — emails, URLs
    and IPv4s planted deterministically per doc (the corpus itself is
    PII-free), masked by the RE2-compatible default patterns; the
    oracle rebuilds the same planted text and applies the identical
    regexes, pinning both the scrubbed string and the match counts."""
    from bloomjoin_spark.operators import scrub_patterns

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit(" cc admin"), F.col("doc_id").cast("string"),
                            F.lit("@ex.org"))).otherwise(F.lit("")),
            F.lit(" see https://site.io/p?q="), F.col("doc_id").cast("string"),
            F.lit(" at 10.0.0."), (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    out = scrub_patterns(planted)
    return out.select("doc_id", "text", "n_email", "n_url", "n_ipv4").orderBy("doc_id")


def _pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: the COMPOSED pipeline — one ``prepare_corpus`` call
    chaining exact dedup → minhash dedup → decontamination →
    boilerplate removal → quality filter → PII scrub → mixture →
    split over a corpus that exercises every stage deterministically:

    - PII (email/URL/IPv4 with the doc_id baked in) planted on every
      doc — pins the scrub stage AND makes every text globally unique;
    - a shared footer line on doc_id%4 docs — pins boilerplate removal;
    - exact-dup rows (+1M ids) of doc_id%5 docs — pins exact dedup;
    - whitespace-variant rows (+2M ids, double spaces) of doc_id%7
      docs — exact-distinct but shingle-set-IDENTICAL (Jaccard exactly
      1.0, so banding is deterministic: identical signatures always
      collide) — pins minhash dedup at threshold=1.0;
    - bench = doc_id%29==3 docs — pins decontamination (exact verify
      join makes the flag set engine-independent).

    The DuckDB oracle recomputes the ENTIRE composition stage by
    stage (the same CTEs as the per-stage oracles, chained), pinning
    the cross-stage column contracts end-to-end: final (doc_id,
    source, split, text) value-hash equality."""
    from bloomjoin_spark import prepare_corpus

    docs = _t(spark, sf_dir, "documents")
    # Planted-copy ids must stay collision-free at ANY scale factor:
    # boilerplate reassembly (and the final orderBy) require row-unique
    # ids, so offsets derive from max(doc_id)+1 — copy 1 lives in
    # [off, 2*off), copy 2 in [2*off, 3*off), disjoint from the base
    # range and from each other.  The oracle computes the same offset
    # from the same table (one scalar agg, bounded driver fetch).
    off = docs.agg(F.max("doc_id")).first()[0] + 1
    base = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.lit(" see https://site.io/p?q="), F.col("doc_id").cast("string"),
            F.lit(" at 10.0.0."), (F.col("doc_id") % 256).cast("string"),
            F.when(F.col("doc_id") % 4 == 0,
                   F.lit("\ncommon footer end")).otherwise(F.lit("")),
        ).alias("text"),
    )
    bench = base.where(F.col("doc_id") % 29 == 3)
    union = (
        base
        .unionByName(
            base.where(F.col("doc_id") % 5 == 0)
            .withColumn("doc_id", F.col("doc_id") + F.lit(off))
        )
        .unionByName(
            base.where(F.col("doc_id") % 7 == 0)
            .withColumn("doc_id", F.col("doc_id") + F.lit(2 * off))
            .withColumn("text", F.regexp_replace("text", " ", "  "))
        )
    )
    res = prepare_corpus(
        union,
        dedup_exact=True,
        minhash={"n": 3, "num_perm": 64, "bands": 8, "threshold": 1.0},
        bench=bench,
        decontam={"n": 6},
        boilerplate_min_docs=2,
        quality=True,
        scrub=True,
        mixture={"rates": {"src0": 0.25, "src1": 1.0}, "default_rate": 0.5},
        split={"fractions": {"train": 0.8, "val": 0.1, "test": 0.1},
               "salt": "s1"},
    )
    return res.docs.select("doc_id", "source", "split", "text").orderBy("doc_id")


def _chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: context-window chunking — ≤32-word chunks with 4 words
    of overlap, row-local codegen (no shuffle, no Python).  The oracle
    recomputes every chunk string with identical slicing arithmetic."""
    from bloomjoin_spark.operators import chunk_words

    docs = _t(spark, sf_dir, "documents")
    return chunk_words(docs, max_words=32, overlap=4).orderBy("doc_id", "chunk_id")


def _token_budget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: budget-driven training mix — each budgeted source is
    sampled to ≈budget chars (rate = min(1, budget/actual), doc-level
    Bernoulli on the portable md5 bucket); the oracle recomputes the
    totals, rates, hex thresholds, and the IDENTICAL kept rows."""
    from bloomjoin_spark.operators import token_budget_mixture

    docs = _t(spark, sf_dir, "documents")
    kept = token_budget_mixture(
        docs, "doc_id", {"src0": 500, "src1": 2000},
        count_col="n_chars", keep_unbudgeted=False,
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("source")
    )


def _temperature_mixture_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: temperature-flattened training mix (public
    multilingual-LM sampling rule, p ∝ t^alpha) at alpha=0.5,
    downsample-only normalization — the favored (smallest-mass) source
    is kept whole, every other source downsampled to the target ratio.
    The oracle recomputes the per-source totals, pow-based rates, hex
    thresholds, and the IDENTICAL kept rows."""
    from bloomjoin_spark.operators import temperature_mixture

    docs = _t(spark, sf_dir, "documents")
    kept = temperature_mixture(docs, "doc_id", alpha=0.5, count_col="n_chars")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("source")
    )


def _repeat_mixture_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: UPSAMPLING mix — src0 at rate 2.5 (2 full copies + a
    50% md5-coin third), src1 at 0.5 (Bernoulli keep), everything else
    passed through once; every copy carries its 0-based epoch.  Full
    value parity: the oracle recomputes the copy counts and epoch
    fan-out row-for-row (unnest(range(n)))."""
    from bloomjoin_spark.operators import repeat_mixture

    docs = _t(spark, sf_dir, "documents")
    out = repeat_mixture(docs, "doc_id", {"src0": 2.5, "src1": 0.5})
    return out.select("doc_id", "source", "epoch")


def _profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: one-call table profile — exact counters (rows, nulls,
    lexicographic min/max as strings) pinned by the oracle verbatim;
    the HLL distinct and t-digest median ride bound-check booleans
    (5σ of 1.04/√2^14; median within the exact p25..p75)."""
    from bloomjoin_spark.operators import profile_table

    docs = _t(spark, sf_dir, "documents")
    prof = profile_table(docs)
    exact_distinct = {
        c: docs.select(c).distinct().count()
        for c in ("doc_id", "text", "lang", "source", "n_chars")
    }
    q = docs.approxQuantile("n_chars", [0.25, 0.75], 0.0)
    rel = 5 * 1.04 / (2 ** 7)  # 5σ at p=14
    rows = []
    for r in prof.collect():
        c = r["column"]
        ex = exact_distinct[c]
        ok = abs(r["approx_distinct"] - ex) <= rel * ex + 1
        med_ok = True
        if c == "n_chars":
            med_ok = q[0] <= r["p50"] <= q[1]
        rows.append((c, r["n_rows"], r["n_nulls"], r["min_str"], r["max_str"],
                     bool(ok), bool(med_ok)))
    return spark.createDataFrame(
        sorted(rows),
        "col_name string, n_rows bigint, n_nulls bigint, min_str string, "
        "max_str string, distinct_ok boolean, median_ok boolean",
    )


def _bigram_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: CCNet-style statistical quality score — mean add-α
    bigram log-probability under the corpus's own bigram model; the
    oracle recomputes the model and every per-doc mean exactly."""
    from bloomjoin_spark.operators import bigram_logprob_score, words_col

    docs = _t(spark, sf_dir, "documents")
    return bigram_logprob_score(
        docs, tokens=words_col(F.col("text")), id_col="doc_id"
    ).orderBy("doc_id")


def _trigram_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5 (VERDICT r4 #6): trigram statistical quality score —
    mean add-α trigram log-probability under the corpus's own model
    (context = plain bigram counts); the oracle recomputes the model
    and every per-doc mean exactly."""
    from bloomjoin_spark.operators import trigram_logprob_score, words_col

    docs = _t(spark, sf_dir, "documents")
    return trigram_logprob_score(
        docs, tokens=words_col(F.col("text")), id_col="doc_id"
    ).orderBy("doc_id")


def _pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: greedy partition-local sequence packing at
    max_tokens=64 over whitespace-tokenized documents.  Pack layout is
    partition-dependent, but doc/token conservation, the oversize
    count, and the per-pack bound are exact — those are what the
    oracle pins (sketch-verification style: exact values + an
    in-bound boolean)."""
    from bloomjoin_spark.operators import pack_sequences, pack_stats

    docs = _t(spark, sf_dir, "documents")
    packs = pack_sequences(docs, max_tokens=64, text_col="text")
    st = pack_stats(packs, 64).first()
    return spark.createDataFrame(
        [(
            int(st["n_docs"]),
            int(st["total_tokens"]),
            int(st["oversize_packs"]),
            bool(st["max_regular_pack"] <= 64),
        )],
        "n_docs bigint, total_tokens bigint, oversize_packs bigint, bound_ok boolean",
    )


def _pack_documents_1p(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5 (VERDICT r4 #4): pack composition pinned EXACTLY — a
    ``repartition(1).sortWithinPartitions(doc_id)`` input makes the
    greedy fill deterministic (one partition, known doc order), so the
    DuckDB oracle recomputes the full pack membership with a recursive
    CTE running the identical greedy recurrence (close the open pack
    when the next doc would overflow it; an oversize doc is its own
    pack).  Output is one scalar row per (pack, member): pack_id,
    doc_id, n_docs, n_tokens, oversize — full value-hash, no
    conservation-boolean indirection."""
    from bloomjoin_spark.operators import pack_sequences

    docs = (
        _t(spark, sf_dir, "documents")
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )
    packs = pack_sequences(docs, max_tokens=64, text_col="text")
    return (
        packs.select(
            "pack_id",
            F.explode("doc_ids").alias("doc_id"),
            "n_docs",
            "n_tokens",
            "oversize",
        )
        .orderBy("doc_id")
    )


def _bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import bloom_join

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    hot = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 500).select("doc_id")
    return bloom_join(docs, hot, on="doc_id", how="semi", force_prefilter=True)


def _bloom_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import bloom_join

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    hot = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 500).select("doc_id")
    return bloom_join(docs, hot, on="doc_id", how="anti", force_prefilter=True)


def _bloom_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import bloom_join

    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select(F.col("c_custkey"), F.col("c_name"))
    )
    return bloom_join(
        ords, cust, on={"o_custkey": "c_custkey"}, how="left", force_prefilter=True
    )


def _bloom_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right join: y is row-preserving, so the planner filters x only
    (reference dispatch R/bloomjoin.R:467-468; side guard :326-363)."""
    from bloomjoin_spark import bloom_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    return bloom_join(
        li, part, on={"l_partkey": "p_partkey"}, how="right", force_prefilter=True
    )


def _bloom_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full join: both sides row-preserving — the prefilter must never
    engage (reference guard R/bloomjoin.R:337-340); the result is the
    plain full outer join."""
    from bloomjoin_spark import bloom_join

    ords = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select("c_custkey", "c_name")
    )
    return bloom_join(ords, cust, on={"o_custkey": "c_custkey"}, how="full")


def _bloom_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import bloom_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .distinct()
    )
    return bloom_join(
        li, pairs, on={"l_partkey": "pk", "l_suppkey": "sk"}, how="inner",
        force_prefilter=True,
    )


# ---------------------------------------------------------------------------
# sketch-verification queries: each returns EXACT values (pinned by the
# DuckDB oracle) alongside within_bound booleans that pin the sketch
# estimate to its published error bound
# ---------------------------------------------------------------------------

def _hll_distinct_docid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import HllSketch, build_sketch

    docs = _t(spark, sf_dir, "documents")
    res = build_sketch(docs, lambda: HllSketch(p=14), cols=["doc_id"])
    exact = docs.select(F.countDistinct("doc_id").alias("d")).first()["d"]
    est = res.sketch.estimate()
    ok = abs(est - exact) / max(exact, 1) <= 4 * res.sketch.rel_std_error
    return spark.createDataFrame(
        [(int(exact), bool(ok))], "exact_distinct bigint, within_bound boolean"
    )


def _hll_distinct_partkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import HllSketch, build_sketch

    li = _t(spark, sf_dir, "lineitem")
    res = build_sketch(li, lambda: HllSketch(p=14), cols=["l_partkey"])
    exact = li.select(F.countDistinct("l_partkey").alias("d")).first()["d"]
    est = res.sketch.estimate()
    ok = abs(est - exact) / max(exact, 1) <= 4 * res.sketch.rel_std_error
    return spark.createDataFrame(
        [(int(exact), bool(ok))], "exact_distinct bigint, within_bound boolean"
    )


def _cms_partkey_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from bloomjoin_spark import CmsSketch, build_sketch
    from bloomjoin_spark.hashing import hash_series

    li = _t(spark, sf_dir, "lineitem")
    res = build_sketch(li, lambda: CmsSketch(eps=1e-4, delta=1e-3), cols=["l_partkey"])
    sk = res.sketch
    exact = (
        li.filter(F.col("l_partkey") % 100 == 0)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .toPandas()
    )
    est = sk.query_hashes(hash_series(exact["l_partkey"].astype("int64")))
    ok = (est >= exact["exact_cnt"].to_numpy()) & (
        est - exact["exact_cnt"].to_numpy() <= sk.error_bound()
    )
    out = exact.assign(within_bound=ok)
    return spark.createDataFrame(
        out, "l_partkey bigint, exact_cnt bigint, within_bound boolean"
    )


def _quantile_check(spark, df, col, method, bound) -> DataFrame:
    """Shared shape: estimate quantiles, measure TRUE rank error in
    Spark (exact), return (q, within_bound)."""
    from bloomjoin_spark.functions import approx_quantiles

    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    est = approx_quantiles(df, col, qs, method=method)
    n = df.count()
    rows = []
    for q, v in zip(qs, est):
        left = df.filter(F.col(col) < v).count() / n
        right = df.filter(F.col(col) <= v).count() / n
        err = max(0.0, q - right, left - q)
        rows.append((float(q), bool(err <= bound)))
    return spark.createDataFrame(rows, "q double, within_bound boolean")


def _tdigest_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return _quantile_check(spark, li, "l_extendedprice", "tdigest", 0.01)


def _kll_quantiles_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return _quantile_check(spark, docs, "n_chars", "kll", 2.296 / 200**0.9)


def _bloom_fpr_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint build/probe key sets: measured fpr ≤ target (+5σ), zero
    false negatives — the reference's test-fpr-target.R as a query."""
    from bloomjoin_spark import BloomSketch, build_sketch

    orders = _t(spark, sf_dir, "orders")
    build = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey")
    probe = orders.filter(F.col("o_orderkey") % 2 == 1).select("o_orderkey")
    n_build = build.count()
    res = build_sketch(build, lambda: BloomSketch(n_build, 0.01), cols=["o_orderkey"])
    sk = res.sketch
    import numpy as np
    import pandas as pd

    from bloomjoin_spark.hashing import hash_series

    probe_keys = probe.toPandas()["o_orderkey"]
    build_keys = build.toPandas()["o_orderkey"]
    fp = sk.contains_hashes(hash_series(probe_keys)).mean()
    fn = (~sk.contains_hashes(hash_series(build_keys))).sum()
    n_probe = len(probe_keys)
    fpr_ok = fp <= 0.01 + 5 * np.sqrt(0.01 * 0.99 / max(n_probe, 1))
    return spark.createDataFrame(
        [(bool(fpr_ok), int(fn))], "fpr_within_target boolean, false_negatives bigint"
    )


def _join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS inner-product join-size estimation (operators/stats.py
    estimate_join_size): Σ_k f_L(k)·f_R(k) from two one-scan frequency
    sketches IS |lineitem ⋈ orders| — the planner's pick-a-strategy
    number without paying for the join.  Pinned: the estimate never
    undercounts the exact count and lands within the published
    ε·N_L·N_R additive bound (both sketches deterministic — fixed
    hash seeds — so the booleans are stable)."""
    from bloomjoin_spark.operators import estimate_join_size

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey")
    r = estimate_join_size(li, orders, on="l_orderkey",
                           right_on="o_orderkey", eps=1e-5, delta=0.01)
    exact = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    return spark.createDataFrame(
        [(
            int(exact),
            bool(r["estimate"] >= exact),
            bool(r["estimate"] <= exact + r["bound"]),
        )],
        "exact_rows bigint, est_ge_exact boolean, est_within_bound boolean",
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators
# ---------------------------------------------------------------------------

def _docs_with_planted_dups(spark, sf_dir):
    """Planted exact-dup copies with scale-safe ids: the offset is
    max(doc_id)+1 (one scalar agg), so copies never collide with real
    ids at any scale factor.  Returns (docs, union, offset)."""
    docs = _t(spark, sf_dir, "documents")
    off = docs.agg(F.max("doc_id")).first()[0] + 1
    dups = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(off)
    )
    return docs, docs.unionByName(dups), off


def _exact_dedup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark.operators import exact_dedup

    _, union, _off = _docs_with_planted_dups(spark, sf_dir)
    return exact_dedup(union).select("doc_id", "source")


def _incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: incremental corpus dedup — new ingest batch vs a
    historical corpus through a Bloom filter of history fingerprints
    (misses skip the join; hits take a history-prefiltered exact anti
    join).  history = doc_id % 10 != 0; batch = the % 10 == 0 docs
    (new) + copies of % 10 == 1 history docs under +2M ids (cross
    dups) + a +3M copy of the min new doc (within-batch dup)."""
    from bloomjoin_spark.operators import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 10 != 0)
    fresh = docs.filter(F.col("doc_id") % 10 == 0)
    cross = docs.filter(F.col("doc_id") % 10 == 1).withColumn(
        "doc_id", F.col("doc_id") + 2_000_000
    )
    min_new = fresh.agg(F.min("doc_id")).first()[0]
    within = fresh.filter(F.col("doc_id") == min_new).withColumn(
        "doc_id", F.col("doc_id") + 3_000_000
    )
    batch = fresh.unionByName(cross).unionByName(within)
    return incremental_dedup(batch, history).select("doc_id", "source")


def _minhash_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicates are guaranteed LSH candidates (identical
    signatures) — every planted pair must be found and verify at
    jaccard 1.0."""
    from bloomjoin_spark.operators import minhash_dedup_pairs

    docs, union, off = _docs_with_planted_dups(spark, sf_dir)
    pairs = minhash_dedup_pairs(
        union, "text", "doc_id", n=3, num_perm=64, bands=8, threshold=0.99
    )
    planted = docs.filter(F.col("doc_id") % 5 == 0).count()
    found = pairs.filter(F.col("id_b") - F.col("id_a") == F.lit(off)).count()
    all_verified = pairs.filter(F.col("jaccard") < 0.99).count() == 0
    return spark.createDataFrame(
        [(int(planted), int(found == planted), bool(all_verified))],
        "planted bigint, all_found int, all_verified boolean",
    )


def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark.operators import add_text_stats, bpe_ish_token_count

    docs = _t(spark, sf_dir, "documents")
    st = bpe_ish_token_count(add_text_stats(docs))
    return st.select("doc_id", "n_tokens", "n_chars_measured", "n_tokens_bpe_ish")


def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark.operators import add_lang_id

    docs = _t(spark, sf_dir, "documents")
    return add_lang_id(docs).select("doc_id", "lang_pred")


def _fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark.operators import add_fingerprint

    docs = _t(spark, sf_dir, "documents")
    return add_fingerprint(docs).select("doc_id", "content_fp")


def _ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark.operators import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, queries_df, k=10).select(
        "query_id", "vec_id", "rank", "sim"
    )


def _embedding_near_dup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark.operators import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    off = emb.agg(F.max("vec_id")).first()[0] + 1
    dup = emb.filter(F.col("vec_id") % 50 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(off)
    )
    both = emb.unionByName(dup)
    planted = emb.filter(F.col("vec_id") % 50 == 0).count()
    pairs = embedding_near_dup_pairs(both, threshold=0.999)
    found = pairs.filter(F.col("id_b") - F.col("id_a") == F.lit(off)).count()
    return spark.createDataFrame(
        [(int(planted), int(found == planted))], "planted bigint, all_found int"
    )


def _salted_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark.operators import salted_join

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    dim = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("src_total"))
    )
    j = salted_join(docs, dim, on="source", how="inner", salts=8)
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("src_total").alias("src_total")
    )


def _zorder_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout rewrite (sources.layout.write_zordered) + a
    two-column conjunction read-back: the multi-dim skipping layout
    must change NO values — the oracle runs the same predicate on the
    original table."""
    import tempfile

    from bloomjoin_spark.sources import write_zordered

    ev = _t(spark, sf_dir, "events")
    # fixed path + overwrite mode: repeated oracle/bench runs reuse the
    # same dir instead of leaking one per call (ADVICE r4 #5 pattern)
    path = os.path.join(tempfile.gettempdir(), "bj_zorder_q", "ev")
    write_zordered(ev, path, ["user_id", "ts"], num_files=8)
    back = spark.read.parquet(path)
    return back.filter(
        (F.col("user_id") % 10 == 3) & (F.col("value") > 5.0)
    ).select("event_id", "user_id", "ts", "event_type", "value")


def _sample_exact_k_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exactly-k sample (TakeOrderedAndProject plan, no
    global sort) — the oracle reruns the identical portable md5-rank
    rule in SQL, so membership must match row-for-row."""
    from bloomjoin_spark.operators import sample_exact_k

    docs = _t(spark, sf_dir, "documents")
    return sample_exact_k(docs, "doc_id", 500).select("doc_id", "source")


def _dedup_lines_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-unit removal (keep the first occurrence
    in order) — one row-local codegen expression, no shuffle.  The test
    corpus has no newlines, so the row runs the operator at word level
    (sep=' '), which removes plenty; the DuckDB oracle recomputes the
    identical first-occurrence rule and the rebuilt text."""
    from bloomjoin_spark.operators.text import dedup_lines_within

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = dedup_lines_within(docs, sep=" ")
    return out.select(
        "doc_id",
        F.col("n_removed_lines").cast("long").alias("n_removed"),
        F.col("text").alias("clean_text"),
    )


def _topk_per_group_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quota (at most k rows per group, best-ranked first) via
    the salted two-phase top-k — full rows never shuffle, no group ever
    lands on one reduce task.  The DuckDB oracle recomputes the quota
    with the identical total order (row_number over n_chars DESC,
    doc_id DESC), so membership must match row-for-row."""
    from bloomjoin_spark.operators import topk_per_group

    docs = _t(spark, sf_dir, "documents")
    return topk_per_group(
        docs, "source", "n_chars", 7, "doc_id", salts=8
    ).select("doc_id", "source", "n_chars")


def _weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted exactly-k sample (Efraimidis–Spirakis
    A-ES over the engine-portable md5 uniform; TakeOrderedAndProject
    plan).  The oracle reruns the identical -ln(u)/w rank rule in
    DuckDB — both engines read the same 52-bit uniform exactly, so
    membership must match row-for-row."""
    from bloomjoin_spark.operators import weighted_sample_exact_k

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample_exact_k(docs, "doc_id", "n_chars", 100).select(
        "doc_id", "source"
    )


def _sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event stream (operators.temporal):
    one hash exchange on user_id, two window expressions, groupBy reuses
    the partitioning — the oracle recomputes sessions with the identical
    window SQL."""
    from bloomjoin_spark.operators import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(
        ev, "user_id", "ts", gap_sec=1800.0, order_cols=["event_id"]
    )


def _asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each non-error event picks the user's most recent
    error at-or-before it (union+window plan, no join operator) —
    oracled by DuckDB's native ASOF LEFT JOIN."""
    from bloomjoin_spark.operators import asof_join

    ev = _t(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") != "error").select(
        "event_id", "user_id", "ts", "value"
    )
    state = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        probe, state, on="user_id", right_cols=["value"], suffix="_err"
    )


def _multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark.operators import synthesize_media

    docs = _t(spark, sf_dir, "documents")
    media = synthesize_media(docs, "doc_id", "text")
    return media.select("media_id", "modality", "n_bytes")


def _minhash_full_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup: planted exact dups (higher ids) must
    all be removed and nothing else — survivors == original doc_ids."""
    from bloomjoin_spark.operators import minhash_dedup

    _, union, _off = _docs_with_planted_dups(spark, sf_dir)
    kept = minhash_dedup(
        union, "text", "doc_id", n=3, num_perm=64, bands=8, threshold=0.99
    )
    return kept.select("doc_id", "source")


def _ngram_jaccard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: EXACT n-gram Jaccard similarity join (prefix filtering,
    AllPairs/PPJoin family — dedup.py:ngram_jaccard_pairs).  Unlike the
    minhash rows this one is pinned by a full-value DuckDB oracle: the
    SQL recomputes ALL-PAIRS exact Jaccard over the identical planted
    corpus, so the prefix filter's 100%-recall claim is value-checked,
    not just invariant-checked."""
    from bloomjoin_spark.operators import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    sub = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    off = docs.agg(F.max("doc_id")).first()[0] + 1
    variants = (
        sub.where(F.col("doc_id") % 30 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(off))
        .withColumn(
            "text",
            F.concat(F.col("text"),
                     F.lit(" tail appended words for jaccard test")),
        )
    )
    union = sub.unionByName(variants)
    pairs = ngram_jaccard_pairs(union, threshold=0.6, max_shingle_df=None)
    return pairs.orderBy("id_a", "id_b")


def _grouped_topk_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: per-GROUP heavy hitters in one pass
    (aggregate.py:grouped_topk) — a SpaceSaving sketch per
    (l_returnflag, partition), blob-only shuffle, per-group merge
    emitting the top-10 l_partkey rows.  capacity=8192 covers the
    per-group distinct-partkey domain at sf0.01, so the sketch is
    EXACT (error 0) and the DuckDB oracle recomputes the identical
    rows with a plain count + window rank (same deterministic
    tie-break: count desc, item asc)."""
    from bloomjoin_spark import grouped_topk

    li = _t(spark, sf_dir, "lineitem")
    out = grouped_topk(
        li, "l_returnflag", k=10, capacity=8192, cols=["l_partkey"]
    )
    return out.orderBy("l_returnflag", "rank")


def _grouped_topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: WEIGHTED per-group heavy hitters
    (aggregate.py:grouped_topk with weight_col) — each row's item
    counts ``weight`` times, so the sketch answers "which parts carry
    the most QUANTITY per returnflag" without the exact
    groupBy(flag, part).sum(qty) + window-rank shuffle.  TPC-H
    quantities are integral, so the long cast is lossless; capacity
    8192 covers the per-group distinct-part domain at sf0.01 → exact
    mode (error 0), and the DuckDB oracle recomputes the identical
    rows with SUM(quantity) + window rank."""
    from bloomjoin_spark import grouped_topk

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "qty", F.col("l_quantity").cast("long")
    )
    out = grouped_topk(
        li, "l_returnflag", k=10, capacity=8192,
        cols=["l_partkey"], weight_col="qty",
    )
    return out.orderBy("l_returnflag", "rank")


def _lsh_plan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: the LSH banding planner's full S-curve error table
    (dedup.py:lsh_plan_table) at t=0.8 / 128 permutations — for every
    banding the implementation can run (b, r = 128 // b), the
    integrated below-threshold collision mass (fp_area) and above-
    threshold miss mass (fn_area).  Driver-side closed-form math (the
    bloom_params_report precedent); the DuckDB oracle recomputes the
    identical midpoint-grid integration in SQL."""
    from bloomjoin_spark.operators import lsh_plan_table

    rows = lsh_plan_table(0.8, num_perm=128, grid=1000)
    return spark.createDataFrame(
        rows, "bands int, rows int, fp_area double, fn_area double"
    ).orderBy("bands")


def _containment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: EXACT one-sided containment join (one-sided prefix
    filter, dedup.py:containment_pairs) over planted excerpt docs —
    8-word slices of real pages, which have containment 1.0 toward
    their source page but Jaccard far below any usable threshold (the
    asymmetric-duplication class the symmetric dedup tiers miss).  The
    DuckDB oracle recomputes ALL-ORDERED-PAIRS exact containment over
    the identical corpus, so the prefix filter's recall is
    value-checked end to end."""
    from bloomjoin_spark.operators import containment_pairs

    docs = _t(spark, sf_dir, "documents")
    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = (
        docs.where(F.col("doc_id") % 4 == 0)
        .where(F.size(w) >= 12)
        .select("doc_id", "text")
    )
    off = docs.agg(F.max("doc_id")).first()[0] + 1
    excerpts = (
        base.where(F.col("doc_id") % 20 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(off))
        .withColumn(
            "text",
            F.array_join(
                F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 3, 8),
                " ",
            ),
        )
    )
    union = base.unionByName(excerpts)
    pairs = containment_pairs(union, threshold=0.9, max_shingle_df=None)
    return pairs.orderBy("id_a", "id_b")


def _simhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection: identical texts have hamming 0, so
    every planted dup pair must surface at max_hamming=3."""
    from bloomjoin_spark.operators import add_simhash, simhash_near_dup_pairs

    docs, union, off = _docs_with_planted_dups(spark, sf_dir)
    sh = add_simhash(union.select("doc_id", "text"))
    pairs = simhash_near_dup_pairs(sh, "doc_id", max_hamming=3)
    planted = docs.filter(F.col("doc_id") % 5 == 0).count()
    found = pairs.filter(
        (F.col("id_b") - F.col("id_a") == F.lit(off)) & (F.col("hamming") == 0)
    ).count()
    return spark.createDataFrame(
        [(int(planted), bool(found == planted))],
        "planted bigint, all_found boolean",
    )


def _ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN vs brute-force cosine: recall@10 ≥ 0.5 on the sf corpus
    (random-hyperplane buckets + exact re-rank)."""
    from bloomjoin_spark.operators import ann_lsh_topk, cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries_df, k=10).select("query_id", "vec_id")
    approx = ann_lsh_topk(emb, queries_df, k=10, nbits=64, bands=16).select(
        "query_id", "vec_id"
    )
    hit = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    total = exact.count()
    recall = hit / max(total, 1)
    return spark.createDataFrame(
        [(bool(recall >= 0.5),)], "recall_at_least_half boolean"
    )


def _winnowing_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints: every planted exact dup
    shares ≥1 fingerprint with its original (guaranteed: identical
    texts → identical fingerprint sets), and identical docs have
    IDENTICAL fingerprint sets."""
    from bloomjoin_spark.operators import winnowing_fingerprints

    docs, union, off = _docs_with_planted_dups(spark, sf_dir)
    fps = winnowing_fingerprints(union.select("doc_id", "text"))
    a = fps.select(F.col("doc_id").alias("id_a"), F.col("winnow_fps").alias("fa"))
    b = fps.select(F.col("doc_id").alias("id_b"), F.col("winnow_fps").alias("fb"))
    pairs = a.join(b, F.col("id_b") - F.col("id_a") == F.lit(off))
    n_pairs = pairs.count()
    identical = pairs.filter(
        (F.size(F.array_except(F.col("fa"), F.col("fb"))) == 0)
        & (F.size(F.array_except(F.col("fb"), F.col("fa"))) == 0)
    ).count()
    planted = docs.filter(F.col("doc_id") % 5 == 0).count()
    return spark.createDataFrame(
        [(int(planted), bool(n_pairs == planted), bool(identical == n_pairs))],
        "planted bigint, all_paired boolean, all_identical_fps boolean",
    )


def _ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (spherical k-means cells + nprobe cell fetch + exact
    re-rank) vs brute-force cosine: recall@10 ≥ 0.5 at nprobe=nlist/4,
    and EXACT when probing every cell."""
    from bloomjoin_spark.operators import ann_ivf_topk, cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries_df, k=10).select("query_id", "vec_id")
    approx = ann_ivf_topk(emb, queries_df, k=10, nlist=8, nprobe=2).select(
        "query_id", "vec_id"
    )
    hit = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    recall_ok = hit / max(exact.count(), 1) >= 0.5
    full = ann_ivf_topk(emb, queries_df, k=10, nlist=8, nprobe=8).select(
        "query_id", "vec_id"
    )
    full_exact = (
        exact.exceptAll(full).count() == 0 and full.exceptAll(exact).count() == 0
    )
    return spark.createDataFrame(
        [(bool(recall_ok), bool(full_exact))],
        "recall_at_least_half boolean, full_probe_exact boolean",
    )


def _ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: product-quantization ANN (m-byte codes + per-query ADC
    tables + exact re-rank; public method: Jégou et al., TPAMI 2011) vs
    brute-force cosine: recall@10 ≥ 0.5 scanning ONLY the 8-byte codes
    with a 4k shortlist, and EXACTLY cosine_topk when the shortlist
    covers the corpus (the lossless-re-rank contract)."""
    from bloomjoin_spark.operators import (
        add_pq_codes,
        ann_pq_topk,
        cosine_topk,
        train_pq_codebooks,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = train_pq_codebooks(emb, m=8, nbits=8, sample=2000, iters=4)
    exact = cosine_topk(emb, queries_df, k=10).select("query_id", "vec_id")
    codes = add_pq_codes(emb.select("vec_id", "embedding"), books).select(
        "vec_id", "pq_code"
    )
    approx = ann_pq_topk(
        emb, queries_df, books, k=10, codes=codes, shortlist=40
    ).select("query_id", "vec_id")
    hit = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    recall_ok = hit / max(exact.count(), 1) >= 0.5
    full = ann_pq_topk(
        emb, queries_df, books, k=10, codes=codes, shortlist=emb.count()
    ).select("query_id", "vec_id")
    full_exact = (
        exact.exceptAll(full).count() == 0 and full.exceptAll(exact).count() == 0
    )
    return spark.createDataFrame(
        [(bool(recall_ok), bool(full_exact))],
        "recall_at_least_half boolean, full_shortlist_exact boolean",
    )


def _ann_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: IVF-PQ — the standard big-corpus ANN configuration
    (nprobe cells × ADC over m-byte codes × exact shortlist re-rank;
    both components public methods): recall@10 ≥ 0.5 at nprobe=nlist/4
    over a materialized (id, cell, code) table, and EXACTLY
    cosine_topk when probing every cell with a corpus-wide
    shortlist."""
    from bloomjoin_spark.operators import (
        add_ivf_cluster,
        add_pq_codes,
        ann_ivf_pq_topk,
        cosine_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = train_ivf_centroids(emb, nlist=8, sample=2000, iters=5)
    books = train_pq_codebooks(emb, m=8, nbits=8, sample=2000, iters=4)
    codes = add_pq_codes(
        add_ivf_cluster(
            emb.select("vec_id", "embedding"), cents, out_col="ivf_cell"
        ),
        books,
    ).select("vec_id", "ivf_cell", "pq_code")
    exact = cosine_topk(emb, queries_df, k=10).select("query_id", "vec_id")
    approx = ann_ivf_pq_topk(
        emb, queries_df, cents, books, k=10, nprobe=2, codes=codes,
        shortlist=40,
    ).select("query_id", "vec_id")
    hit = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    recall_ok = hit / max(exact.count(), 1) >= 0.5
    full = ann_ivf_pq_topk(
        emb, queries_df, cents, books, k=10, nprobe=8, codes=codes,
        shortlist=emb.count(),
    ).select("query_id", "vec_id")
    full_exact = (
        exact.exceptAll(full).count() == 0 and full.exceptAll(exact).count() == 0
    )
    return spark.createDataFrame(
        [(bool(recall_ok), bool(full_exact))],
        "recall_at_least_half boolean, full_probe_exact boolean",
    )


def _ann_ivf_partitioned_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 3: the cell-PARTITIONED IVF path (corpus written
    partitionBy(ivf_cell), probed cells pushed as a partition filter)
    must match the in-memory IVF path's guarantees: recall@10 ≥ 0.5 at
    nprobe=nlist/4 and exact when probing every cell."""
    import shutil
    import tempfile

    from bloomjoin_spark.operators import (
        ann_ivf_topk_partitioned,
        cosine_topk,
        train_ivf_centroids,
        write_ivf_partitioned,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = train_ivf_centroids(emb, nlist=8, sample=5_000, iters=4)
    path = tempfile.mkdtemp(prefix="bj_ivf_part_")
    try:
        write_ivf_partitioned(emb, cent, path)
        exact = cosine_topk(emb, queries_df, k=10).select("query_id", "vec_id")
        approx = ann_ivf_topk_partitioned(
            spark, path, queries_df, cent, k=10, nprobe=2
        ).select("query_id", "vec_id")
        hit = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
        recall_ok = hit / max(exact.count(), 1) >= 0.5
        full = ann_ivf_topk_partitioned(
            spark, path, queries_df, cent, k=10, nprobe=8
        ).select("query_id", "vec_id")
        full_exact = (
            exact.exceptAll(full).count() == 0 and full.exceptAll(exact).count() == 0
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        [(bool(recall_ok), bool(full_exact))],
        "recall_at_least_half boolean, full_probe_exact boolean",
    )


def _hash_keys_cross_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 3: the PUBLIC hash_keys64 applies canonical casts, so the
    same key values hash identically whether the column is int or
    double (reference invariant src/hash_keys.cpp:58-68)."""
    from bloomjoin_spark.functions import hash_keys64

    part = _t(spark, sf_dir, "part").select("p_partkey")
    hi = hash_keys64(part, "p_partkey", "h_int")
    hd = hash_keys64(
        part.select(F.col("p_partkey").cast("double").alias("p_partkey")),
        "p_partkey",
        "h_dbl",
    ).select(F.col("p_partkey").cast("bigint").alias("p_partkey"), "h_dbl")
    joined = hi.join(hd, "p_partkey")
    mism = joined.filter(F.col("h_int") != F.col("h_dbl")).count()
    n = joined.count()
    return spark.createDataFrame(
        [(int(mism), int(n))], "mismatches bigint, n_keys bigint"
    )


def _simhash_capped_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 3: a degenerate simhash bucket (300 identical boilerplate
    docs) is DROPPED by the shared max_bucket_size guard while an
    unrelated planted dup pair still surfaces."""
    from bloomjoin_spark.operators import add_simhash, simhash_near_dup_pairs

    docs = _t(spark, sf_dir, "documents").limit(300).select(
        F.col("doc_id"), F.lit("the same boilerplate text everywhere").alias("text")
    )
    planted = spark.createDataFrame(
        [
            (9_000_001, "a unique document about owls and night vision"),
            (9_000_002, "a unique document about owls and night vision"),
        ],
        "doc_id long, text string",
    )
    sh = add_simhash(docs.unionByName(planted))
    report: dict = {}
    pairs = simhash_near_dup_pairs(
        sh, "doc_id", max_hamming=3, max_bucket_size=100, dropped_report=report
    ).collect()
    found = any(r["id_a"] == 9_000_001 and r["id_b"] == 9_000_002 for r in pairs)
    return spark.createDataFrame(
        [(bool(found), bool(report.get("dropped_buckets", 0) >= 1))],
        "planted_found boolean, bucket_dropped boolean",
    )


def _cms_event_type_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS per-event-type counts vs exact: never undercounts, within εN."""
    from bloomjoin_spark import CmsSketch, build_sketch
    from bloomjoin_spark.hashing import hash_series

    ev = _t(spark, sf_dir, "events")
    res = build_sketch(ev, lambda: CmsSketch(eps=1e-4, delta=1e-3), cols=["event_type"])
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_cnt")).toPandas()
    est = res.sketch.query_hashes(hash_series(exact["event_type"]))
    ok = (est >= exact["exact_cnt"].to_numpy()) & (
        est - exact["exact_cnt"].to_numpy() <= res.sketch.error_bound()
    )
    out = exact.assign(within_bound=ok)
    return spark.createDataFrame(
        out, "event_type string, exact_cnt bigint, within_bound boolean"
    )


# ---------------------------------------------------------------------------
# north-rule F0 token-table queries (input_hint shape: doc_id string,
# tokens array<int32>, n_tok int, source string) — synthesized
# deterministically via datagen; the exactness checks run Spark-side
# against exact computation, the oracle pins the booleans
# ---------------------------------------------------------------------------

def _f0(spark: SparkSession, n: int = 50_000):
    from bloomjoin_spark.datagen import token_table

    return token_table(spark, n, vocab=5_000, max_tok=64, num_partitions=8)


def _bloom_join_tokens_f0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship invariant on the north-rule table: bloom_join output is
    row-identical to the exact join INCLUDING the token arrays
    (BASELINE.json: 'per-row token-array equality ... preserved through
    all filter/join stages')."""
    from bloomjoin_spark import bloom_join
    from bloomjoin_spark.datagen import lookup_table

    toks = _f0(spark)
    lk = lookup_table(spark, 50_000, 2_000, overlap=0.3, num_partitions=4)
    got = bloom_join(toks, lk, on="doc_id", how="inner", force_prefilter=True)
    exact = toks.join(lk, "doc_id", "inner")
    diff = got.exceptAll(exact).count() + exact.exceptAll(got).count()
    return spark.createDataFrame(
        [(int(exact.count()), bool(diff == 0))],
        "exact_rows bigint, rows_and_token_arrays_identical boolean",
    )


def _hll_distinct_tokens_f0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode-free HLL over every token id of the F0 table vs the exact
    explode+countDistinct, within 4σ of 1.04/√m."""
    from bloomjoin_spark import HllSketch, build_sketch

    toks = _f0(spark)
    res = build_sketch(toks, lambda: HllSketch(p=14), token_col="tokens")
    exact = toks.select(F.explode("tokens").alias("t")).agg(
        F.countDistinct("t").alias("d")
    ).first()["d"]
    ok = abs(res.sketch.estimate() - exact) / max(exact, 1) <= 4 * res.sketch.rel_std_error
    return spark.createDataFrame(
        [(bool(ok),)], "hll_within_bound boolean"
    )


def _cms_hot_tokens_f0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point queries for the 20 hottest token ids vs exact counts:
    never undercounts, overcount ≤ εN."""
    import numpy as np

    from bloomjoin_spark import CmsSketch, build_sketch
    from bloomjoin_spark.hashing import hash_float64

    toks = _f0(spark)
    res = build_sketch(
        toks, lambda: CmsSketch(eps=1e-4, delta=1e-3), token_col="tokens"
    )
    sk = res.sketch
    exact = (
        toks.select(F.explode("tokens").alias("t"))
        .groupBy("t").count().orderBy(F.desc("count"), "t").limit(20).toPandas()
    )
    h = hash_float64(exact["t"].to_numpy(dtype=np.float64))
    est = sk.query_hashes(h)
    truth = exact["count"].to_numpy()
    ok = bool(((est >= truth) & (est - truth <= sk.error_bound())).all())
    return spark.createDataFrame([(ok,)], "cms_within_bound boolean")


def _topk_hot_tokens_f0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 3: SpaceSaving top-k (sixth sketch) over all F0 token
    instances — every exact top-10 token is monitored, and for every
    monitored item true ∈ [count − error, count]."""
    from bloomjoin_spark import TopKSketch, build_sketch

    toks = _f0(spark)
    res = build_sketch(toks, lambda: TopKSketch(256), token_col="tokens")
    sk = res.sketch
    exact = (
        toks.select(F.explode("tokens").alias("t"))
        .groupBy("t").count().orderBy(F.desc("count"), "t").limit(10).toPandas()
    )
    truth = dict(zip(exact["t"].tolist(), exact["count"].tolist()))
    got = {i: (c, e) for i, c, e in sk.topk()}
    all_found = all(t in got for t in truth)
    bounds_ok = all(
        got[t][0] - got[t][1] <= c <= got[t][0] for t, c in truth.items() if t in got
    )
    return spark.createDataFrame(
        [(bool(all_found), bool(bounds_ok))],
        "top10_all_monitored boolean, bounds_hold boolean",
    )


def _bloom_params_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sizing report (O11/O12): closed-form m,k + escalation — the
    oracle pins the exact deterministic values for n=1e6 @ fpp 0.01
    (reference bloom_params, R/params.R:8-74)."""
    from bloomjoin_spark import bloom_params

    p = bloom_params(1_000_000, 0.01)
    return spark.createDataFrame(
        [(int(p["m_bits"]), int(p["k"]), int(p["size_bytes"]), bool(p["target_met"]))],
        "m_bits bigint, k int, size_bytes bigint, target_met boolean",
    )


def _token_profile_f0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass multi-sketch corpus profile (build_sketches: ONE scan
    feeds HLL+CMS+t-digest+KLL). Exact total pinned by the oracle;
    every estimate pinned to its published bound vs exact Spark-side."""
    from bloomjoin_spark.functions import token_profile
    from bloomjoin_spark.sketches import HllSketch

    toks = _f0(spark)
    prof = token_profile(toks, "tokens", top_tokens=[0, 1, 2])
    ex = toks.select(F.explode("tokens").alias("t"))
    exact_distinct = ex.agg(F.countDistinct("t").alias("d")).first()["d"]
    exact_total = toks.agg(F.sum(F.size("tokens"))).first()[0]
    exact0 = ex.filter(F.col("t") == 0).count()
    hll_ok = (
        abs(prof["distinct_tokens"] - exact_distinct) / max(exact_distinct, 1)
        <= 4 * HllSketch(14).rel_std_error
    )
    est0 = prof["token_frequencies"][0]
    cms_ok = exact0 <= est0 <= exact0 + 1e-4 * exact_total + 1
    q = prof["token_quantiles_tdigest"]
    kq = prof["token_quantiles_kll"]
    mono_ok = q[0] <= q[1] <= q[2] and kq[0] <= kq[1] <= kq[2]
    return spark.createDataFrame(
        [(int(exact_total), bool(prof["total_tokens"] == exact_total),
          bool(hll_ok), bool(cms_ok), bool(mono_ok))],
        "exact_total_tokens bigint, total_exact boolean, hll_within_bound boolean, "
        "cms_within_bound boolean, quantiles_monotone boolean",
    )


def _salted_source_join_f0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew handling on the F0 table's hot 'source' key (50% of rows):
    salted join result count == plain join count."""
    from bloomjoin_spark.operators import salted_join

    toks = _f0(spark)
    dim = toks.groupBy("source").agg(F.count(F.lit(1)).alias("src_total"))
    salted = salted_join(toks.select("doc_id", "source"), dim, on="source",
                         how="inner", salts=8).count()
    plain = toks.select("doc_id", "source").join(dim, "source", "inner").count()
    return spark.createDataFrame(
        [(bool(salted == plain),)], "salted_equals_plain boolean"
    )


def _streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark.streaming import events_stream, windowed_counts
    from bloomjoin_spark.streaming.sketch_stream import run_stream_to_memory

    agg = windowed_counts(events_stream(spark, sf_dir), window="1 hour")
    name = run_stream_to_memory(agg, "q_win_counts")
    # value_sum is float (rounding drift across engines) — compare the
    # exact columns only
    return spark.table(name).select(
        F.unix_timestamp("window_start").alias("window_epoch"),
        "event_type",
        "n",
    )


def _session_stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gap sessionization (native session_window state store):
    a bounded run must equal the batch window rule, which the oracle
    recomputes in SQL. Timestamps travel as epoch micros (the stream
    schema is LTZ; epoch integers dodge engine TZ rendering)."""
    from bloomjoin_spark.streaming import events_stream, session_counts
    from bloomjoin_spark.streaming.sketch_stream import run_stream_to_memory

    agg = session_counts(events_stream(spark, sf_dir), gap="30 minutes")
    name = run_stream_to_memory(agg, "q_sess_counts")
    return spark.table(name).select(
        "user_id",
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        "n_events",
    )


def _grouped_median_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: per-group QUANTILES through the distributed group merge
    (grouped_sketch_estimates with a t-digest factory and a quantile
    extract — the grouped VALUES lane, no per-group driver state):
    per-source median n_chars.  The DuckDB oracle recomputes the exact
    per-source median and expects the estimate within 2% relative (the
    t-digest mid-quantile regime is far tighter; 2% absorbs
    interpolation differences), plus exact per-group row counts."""
    from bloomjoin_spark import TDigestSketch, grouped_sketch_estimates

    docs = _t(spark, sf_dir, "documents")
    est = grouped_sketch_estimates(
        docs, lambda: TDigestSketch(), "source", cols=["n_chars"],
        extract=lambda s: s.quantile(0.5),
    )
    exact = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("exact_median"),
        F.count(F.lit(1)).alias("n_exact"),
    )
    return (
        est.join(exact, "source")
        .select(
            "source",
            F.col("n_rows"),
            (F.abs(F.col("estimate") - F.col("exact_median"))
             <= 0.02 * F.col("exact_median")).alias("within_bound"),
            (F.col("n_rows") == F.col("n_exact")).alias("rows_exact"),
        )
        .orderBy("source")
    )


def _hll_distinct_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 3: per-group HLL distinct via the DISTRIBUTED group merge
    (grouped_sketch_estimates — no driver-side per-group state):
    per-source distinct doc_id within the published HLL bound, exact
    per-group row counts."""
    from bloomjoin_spark import HllSketch, grouped_sketch_estimates

    docs = _t(spark, sf_dir, "documents")
    est = grouped_sketch_estimates(
        docs, lambda: HllSketch(13), "source", cols=["doc_id"]
    ).select("source", "estimate")
    exact = docs.groupBy("source").agg(
        F.count_distinct("doc_id").alias("exact_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    rel = 1.04 / (2 ** (13 / 2))
    return (
        est.join(exact, "source")
        .select(
            "source",
            "exact_distinct",
            "n_rows",
            (
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                / F.greatest(F.col("exact_distinct"), F.lit(1))
                <= 4 * rel
            ).alias("within_bound"),
        )
    )


def _sketch_store_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: persistent sketch store (`store.py`) — the corpus is
    ingested as TWO disjoint snapshots (n_chars parity), each appended
    as KB-scale per-(source, partition) HLL partials; per-source
    estimates then come from stored blobs only, with no rescan of
    either snapshot's rows.  Pins (a) merge associativity across the
    durable boundary: the blob-only estimate EXACTLY equals a one-shot
    grouped build over the union (HLL registers are order-free maxes),
    and (b) the published error bound vs exact per-source distincts."""
    import hashlib

    from bloomjoin_spark import (
        HllSketch,
        append_sketch_snapshot,
        grouped_sketch_estimates,
        read_sketch_store,
        store_estimates,
    )

    docs = _t(spark, sf_dir, "documents")
    path = "/tmp/bj_store_oracle_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    fac = lambda: HllSketch(13)  # noqa: E731
    for snap, par in (("day1", 0), ("day2", 1)):
        half = docs.where(F.pmod(F.col("n_chars"), F.lit(2)) == par)
        append_sketch_snapshot(
            half, fac, path, snap, group_col="source", cols=["doc_id"]
        )
    store = read_sketch_store(spark, path)
    est = store_estimates(store, "source").withColumnRenamed("n_rows", "store_rows")
    oneshot = grouped_sketch_estimates(docs, fac, "source", cols=["doc_id"]).select(
        "source", F.col("estimate").alias("oneshot_estimate")
    )
    exact = docs.groupBy("source").agg(
        F.count_distinct("doc_id").alias("exact_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    rel = 1.04 / (2 ** (13 / 2))
    return (
        est.join(oneshot, "source")
        .join(exact, "source")
        .select(
            "source",
            "exact_distinct",
            "n_rows",
            (F.col("store_rows") == F.col("n_rows")).alias("rows_accounted"),
            (F.col("estimate") == F.col("oneshot_estimate")).alias("matches_oneshot"),
            (
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                / F.greatest(F.col("exact_distinct"), F.lit(1))
                <= 4 * rel
            ).alias("within_bound"),
        )
    )


def _fd_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: FrequentDirections matrix sketch
    (sketches/fd.py, operators/spectral.py:fd_sketch) over the
    embeddings table, both modes:

    - exact (ell=256 > n/2): the buffer never shrinks, so BᵀB == AᵀA
      — pinned by recomputing the exact Gram from the collected
      sf-scale matrix (check-only collect, 500×64 at sf0.01);
    - sketched (ell=8): shrinks certainly happen, and the row pins the
      published FD guarantees — AᵀA − BᵀB is PSD and its spectral norm
      is ≤ the sketch's own certified shrink_mass — which hold for ANY
      partitioning/merge order (this is what makes the estimate
      trustworthy at 10^12 rows where no exact check exists).

    DuckDB recomputes n_rows/dim exactly and expects the booleans."""
    import numpy as np

    from bloomjoin_spark import fd_sketch

    emb = _t(spark, sf_dir, "embeddings")
    A = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64)
         for r in emb.select("embedding").collect()]
    )
    gram_exact = A.T @ A
    fro_exact = float((A * A).sum())

    rows = []
    for mode, ell in (("exact", 256), ("sketched", 8)):
        sk = fd_sketch(emb, "embedding", ell=ell).sketch
        diff = gram_exact - sk.gram()
        ev = np.linalg.eigvalsh(diff)
        rows.append((
            mode,
            int(sk.n_rows),
            int(sk.dim),
            bool(sk.is_exact),
            bool(np.allclose(sk.gram(), gram_exact, rtol=1e-9, atol=1e-9)),
            bool(ev.min() >= -1e-8),
            bool(float(np.abs(ev).max()) <= sk.spectral_error_bound() + 1e-8),
            bool(abs(sk.fro_sq - fro_exact) <= 1e-9 * max(fro_exact, 1.0)),
        ))
    return spark.createDataFrame(
        rows,
        "mode string, n_rows long, dim int, is_exact boolean, "
        "gram_matches_exact boolean, psd_holds boolean, "
        "bound_holds boolean, fro_matches boolean",
    ).orderBy("mode")


def _fd_mass_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: per-group retained spectral mass in one pass
    (operators/spectral.py:grouped_spectral_mass — blob-only shuffle,
    no per-group driver state).  With ell above the per-label row
    count the FD sketch is exact, so the retained mass equals the
    label's Σ‖v‖² EXACTLY.  The equality boolean is computed SPARK-side
    against an independent plain aggregate (F.aggregate over the array
    — no sketch code on that side); DuckDB independently recomputes
    the per-label row counts and expects the boolean TRUE (SVD-free
    here, but the mass reference itself is not re-derived in SQL)."""
    from bloomjoin_spark import grouped_spectral_mass

    emb = _t(spark, sf_dir, "embeddings")
    got = grouped_spectral_mass(emb, "label", "embedding", ell=256)
    exact = emb.select(
        "label",
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("m"),
    ).groupBy("label").agg(F.sum("m").alias("mass"))
    return (
        got.join(exact, "label")
        .select(
            "label",
            F.col("n_rows"),
            (F.abs(F.col("estimate") - F.col("mass"))
             <= F.lit(1e-9) * F.greatest(F.col("mass"), F.lit(1.0))
             ).alias("mass_matches_exact"),
        )
        .orderBy("label")
    )


def _pca_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: distributed PCA projection
    (operators/spectral.py:pca_project) — one mapInArrow matmul stage
    against the FD sketch's top-k directions (the dim-reduction step
    before IVF/PQ training). Exact-mode sketch (ell > n/2), so the
    directions are the true right-singular vectors; the row pins, per
    embedding row, that the distributed projection equals the numpy
    A @ Vkᵀ recomputation with the same V (check-only collect at sf
    scale), plus exact row accounting and output width."""
    import numpy as np

    from bloomjoin_spark import fd_sketch, pca_project

    emb = _t(spark, sf_dir, "embeddings")
    res = fd_sketch(emb, "embedding", ell=512)
    k = 8
    out = pca_project(emb, "embedding", res, k=k)
    rows = out.select("vec_id", "embedding", "pca").collect()
    _, vt = res.sketch.directions(k)
    all_match = True
    width_ok = True
    for r in rows:
        a = np.asarray(r["embedding"], dtype=np.float64)
        p = np.asarray(r["pca"], dtype=np.float64)
        width_ok &= p.size == k
        all_match &= bool(np.allclose(p, a @ vt.T, rtol=1e-9, atol=1e-12))
    return spark.createDataFrame(
        [(len(rows), k, bool(all_match), bool(width_ok))],
        "n_rows long, k int, proj_matches_exact boolean, width_ok boolean",
    )


def _theta_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: theta (KMV) sketch set algebra — the distinct-count
    capability HLL lacks.  Per-source theta sketches over the distinct
    words of src0/src1 documents; |A∩B|, |A\\B| and |A∪B| estimates
    pinned against the exact values (exactly equal while the sketches
    are untrimmed; within the union-scale 5σ bound once sampling)."""
    from bloomjoin_spark import ThetaSketch, build_sketch

    docs = _t(spark, sf_dir, "documents")
    words = docs.filter(F.col("source").isin("src0", "src1")).select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    sk = {
        src: build_sketch(
            words.filter(F.col("source") == src),
            lambda: ThetaSketch(k=65536),
            cols=["w"],
        ).sketch
        for src in ("src0", "src1")
    }
    a, b = sk["src0"], sk["src1"]
    flags = words.groupBy("w").agg(
        F.max(F.col("source") == "src0").alias("in_a"),
        F.max(F.col("source") == "src1").alias("in_b"),
    )
    ex = flags.agg(
        F.count(F.when(F.col("in_a") & F.col("in_b"), 1)).alias("exact_overlap"),
        F.count(F.when(F.col("in_a") & ~F.col("in_b"), 1)).alias("exact_only_a"),
        F.count(F.lit(1)).alias("exact_union"),
    ).first()
    bound = a.error_bound_vs(b, z=5.0)
    union = a.union(b)

    def ok(est: float, exact: int, bnd: float) -> bool:
        return est == exact or abs(est - exact) <= bnd

    row = (
        int(ex["exact_overlap"]),
        int(ex["exact_only_a"]),
        int(ex["exact_union"]),
        ok(a.intersect(b), ex["exact_overlap"], bound),
        ok(a.a_not_b(b), ex["exact_only_a"], bound),
        ok(union.estimate(), ex["exact_union"],
           5.0 * ex["exact_union"] * union.rel_std_error),
    )
    return spark.createDataFrame(
        [row],
        "exact_overlap bigint, exact_only_a bigint, exact_union bigint, "
        "overlap_within_bound boolean, diff_within_bound boolean, "
        "union_within_bound boolean",
    )


def _source_overlap_matrix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: pairwise source-overlap matrix (theta sketches, one
    scan + driver-side set algebra on KB blobs).  Exact pairwise
    distinct-word intersections pinned by the oracle; the sketch
    estimates are bound-checked (exactly equal while vocab < k)."""
    from bloomjoin_spark.operators import source_overlap_matrix

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1", "src2")
    )
    words = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    mat = source_overlap_matrix(words, group_col="source", cols=["w"], k=65536)
    dw = words.distinct()
    exact = (
        dw.alias("a")
        .join(dw.alias("b"), F.col("a.w") == F.col("b.w"))
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("group_a"),
            F.col("b.source").alias("group_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    return mat.join(exact, ["group_a", "group_b"], "inner").select(
        "group_a",
        "group_b",
        "exact_intersection",
        (
            (F.col("intersection") == F.col("exact_intersection"))
            | (
                F.abs(F.col("intersection") - F.col("exact_intersection"))
                <= F.col("bound")
            )
        ).alias("within_bound"),
    )


def _streaming_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 3: stream-static bloom-prefiltered join — per-micro-batch
    probe against a filter built once from the static side; output must
    equal the plain batch join on the same rows."""
    from bloomjoin_spark.streaming import bloom_join_stream, events_stream
    from bloomjoin_spark.streaming.sketch_stream import run_stream_to_memory

    batch = _t(spark, sf_dir, "events")
    dim = (
        batch.filter(F.col("user_id") % 7 == 0)
        .select("user_id").distinct()
        .withColumn("seg", F.lit("u7"))
    )
    joined = bloom_join_stream(
        events_stream(spark, sf_dir).select("event_id", "user_id"),
        dim, on="user_id", how="inner",
    )
    name = run_stream_to_memory(joined, "q_bj_stream", output_mode="append")
    return (
        spark.table(name)
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_joined"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def _decontam_stream_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: STREAMING decontamination — per-row hash-set probe
    (no state, no watermark) flags exactly the docs the batch operator
    flags; the oracle recomputes the flagged count with true list
    equality in SQL."""
    from bloomjoin_spark.operators import words_col
    from bloomjoin_spark.streaming import decontaminate_stream, documents_stream
    from bloomjoin_spark.streaming.sketch_stream import run_stream_to_memory

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 29 == 3)
    flagged = decontaminate_stream(
        documents_stream(spark, sf_dir), bench, n=6,
        tokens=words_col(F.col("text")), mode="flag",
    )
    name = run_stream_to_memory(
        flagged.select("doc_id", "contaminated"), "q_decontam_stream",
        output_mode="append",
    )
    return spark.table(name).agg(
        F.sum(F.col("contaminated").cast("bigint")).alias("n_flagged"),
        F.count(F.lit(1)).alias("n_total"),
    )


def _dedup_stream_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: streaming exact dedup (state-store dropDuplicates over
    the canonical content fingerprint) — survivor count must equal the
    SQL distinct-fingerprint count."""
    from bloomjoin_spark.streaming import dedup_stream, documents_stream
    from bloomjoin_spark.streaming.sketch_stream import run_stream_to_memory

    deduped = dedup_stream(documents_stream(spark, sf_dir))
    name = run_stream_to_memory(
        deduped.select("doc_id", "content_fp"), "q_dedup_stream_entry",
        output_mode="append",
    )
    t = spark.table(name)
    return t.agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.count_distinct("content_fp").alias("n_fingerprints"),
    )


def _incr_dedup_stream_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: streaming incremental dedup — the whole documents table
    streams in; everything whose content is in the history snapshot
    (doc_id % 10 != 0) must be dropped per micro-batch (Bloom probe +
    stream-static anti-join verify), within-stream dups keep one.
    Survivor doc_ids depend on micro-batch arrival order, but the
    survivor FINGERPRINT set is deterministic — that set is the oracle
    value."""
    from bloomjoin_spark.streaming import documents_stream, incremental_dedup_stream
    from bloomjoin_spark.streaming.sketch_stream import run_stream_to_memory

    docs = _t(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 10 != 0)
    out = incremental_dedup_stream(
        documents_stream(spark, sf_dir), history=history
    )
    name = run_stream_to_memory(
        out.select("content_fp"), "q_incr_dedup_stream_entry",
        output_mode="append",
    )
    return spark.table(name).select("content_fp").distinct()


def _stateful_hll_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-event-type running HLL over user_id; exact n_rows pinned by the
    oracle, estimate pinned to the HLL bound."""
    from bloomjoin_spark.sketches import HllSketch
    from bloomjoin_spark.streaming import events_stream
    from bloomjoin_spark.streaming.sketch_stream import (
        run_stream_to_memory,
        stateful_sketch_stream,
    )

    out = stateful_sketch_stream(
        events_stream(spark, sf_dir), lambda: HllSketch(14),
        group_col="event_type", cols=["user_id"],
    )
    name = run_stream_to_memory(out, "q_stateful_hll_drv", output_mode="update")
    last = spark.table(name).groupBy("event_type").agg(
        F.max("n_rows").alias("n_rows"), F.max("estimate").alias("est")
    )
    ev = _t(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("d")
    )
    bound = 4 * HllSketch(14).rel_std_error
    joined = last.join(exact, "event_type")
    return joined.select(
        "event_type",
        "n_rows",
        (F.abs(F.col("est") - F.col("d")) / F.greatest(F.col("d"), F.lit(1))
         <= bound).alias("within_bound"),
    )


def _topk_stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: per-key RUNNING heavy hitters as a custom stateful
    streaming operator (streaming/sketch_stream.py:topk_stream,
    applyInPandasWithState) — one SpaceSaving sketch per event_type in
    the state store, top-5 user_id re-emitted per trigger.  The events
    stream is one file → one trigger, and capacity 1024 covers the 150
    distinct users per type at sf0.01, so the emission is EXACT and the
    DuckDB oracle recomputes the identical rows with COUNT + window
    rank (FULL value oracle for a streaming operator)."""
    from bloomjoin_spark.streaming import events_stream, topk_stream
    from bloomjoin_spark.streaming.sketch_stream import run_stream_to_memory

    out = topk_stream(
        events_stream(spark, sf_dir), "event_type",
        k=5, capacity=1024, cols=["user_id"],
    )
    name = run_stream_to_memory(out, "q_topk_stream_drv", output_mode="update")
    return spark.table(name).orderBy("event_type", "rank")


def _sketch_store_stream_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: streaming ingest into the DURABLE sketch store
    (`store.sketch_store_sink`): each micro-batch lands its per-(source,
    partition) HLL partials as its own snapshot partition, so a
    replayed batch rewrites instead of double-counting (exactly-once
    sketch state from an at-least-once foreachBatch).  Pins exact row
    accounting per source against the static table plus the HLL bound."""
    import hashlib
    import shutil

    from bloomjoin_spark import HllSketch, read_sketch_store, store_estimates
    from bloomjoin_spark.store import sketch_store_sink
    from bloomjoin_spark.streaming.sketch_stream import documents_stream

    path = "/tmp/bj_store_stream_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(path, ignore_errors=True)  # fixed path, fresh per run
    q = sketch_store_sink(
        documents_stream(spark, sf_dir), lambda: HllSketch(13),
        path, group_col="source", cols=["doc_id"],
    ).start()
    q.processAllAvailable()
    q.stop()
    est = store_estimates(read_sketch_store(spark, path), "source")
    docs = _t(spark, sf_dir, "documents")
    exact = docs.groupBy("source").agg(
        F.count_distinct("doc_id").alias("exact_distinct"),
        F.count(F.lit(1)).alias("exact_rows"),
    )
    rel = 1.04 / (2 ** (13 / 2))
    return (
        est.join(exact, "source")
        .select(
            "source",
            "exact_distinct",
            F.col("exact_rows").alias("n_rows"),
            (F.col("n_rows") == F.col("exact_rows")).alias("rows_accounted"),
            (
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                / F.greatest(F.col("exact_distinct"), F.lit(1))
                <= 4 * rel
            ).alias("within_bound"),
        )
    )


def _layout_tag(sf_dir: str) -> str:
    import re

    base = os.path.basename(sf_dir.rstrip("/")).lower()
    return re.sub(r"[^0-9a-z]+", "_", base) or "sf"


def _bucketed_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shuffle co-located join: customer and orders are written
    bucketed on the (renamed) customer key with equal bucket counts,
    then joined straight off the bucket layout — the plan contract
    (no Exchange on either side) is pinned in tests/test_sources.py;
    this row pins the values.  Prices aggregate as exact cents
    (ROUND(price*100) -> BIGINT) so both engines sum integers."""
    from bloomjoin_spark.sources import co_located_join, write_bucketed

    tag = _layout_tag(sf_dir)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    write_bucketed(cust, f"bj_cust_{tag}", by="c_custkey", buckets=8)
    write_bucketed(orders, f"bj_ord_{tag}", by="c_custkey", buckets=8)
    j = co_located_join(spark, f"bj_cust_{tag}", f"bj_ord_{tag}",
                        on="c_custkey")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("c_custkey").alias("n_custs"),
        F.sum("cents").alias("sum_cents"),
    )


def _partitioned_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan: events rewritten partitioned by
    event_type, then filtered on the partition column — the read
    touches one directory (PartitionFilters plan-asserted in
    tests/test_sources.py); this row pins the pruned values against
    the unpartitioned table."""
    import tempfile

    from bloomjoin_spark.sources import write_partitioned

    path = os.path.join(
        tempfile.gettempdir(), f"bj_events_by_type_{_layout_tag(sf_dir)}"
    )
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id",
                                            "value", "event_type")
    write_partitioned(ev, path, by="event_type")
    got = spark.read.parquet(path).filter(
        F.col("event_type").isin("click", "purchase"))
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


def _range_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max data-skipping layout: events rewritten globally
    range-sorted by user_id (repartitionByRange + sortWithinPartitions
    → non-overlapping per-file footer ranges, pinned by
    tests/test_sources.py), then scanned with a range predicate — the
    parquet reader skips every out-of-range file from the footer
    stats alone.  This row pins the read-back values."""
    import tempfile

    from bloomjoin_spark.sources import write_range_sorted

    path = os.path.join(
        tempfile.gettempdir(), f"bj_events_by_user_{_layout_tag(sf_dir)}"
    )
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id",
                                            "value", "event_type")
    write_range_sorted(ev, path, by="user_id", num_files=8)
    got = spark.read.parquet(path).filter(
        (F.col("user_id") >= 100) & (F.col("user_id") <= 500))
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias(
            "sum_value_milli"),
    )


def _bloom_index_lookup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom data-skipping index (sources/skipping.py):
    documents rewritten hash-clustered by doc_id with a sidecar
    per-file Bloom table, then point-looked-up through the index —
    only files whose filter may contain a requested key are opened
    (skip evidence tested in tests/test_sources.py), and the exact
    post-filter makes the rows identical to filtering the full table,
    which is what this row pins.  The lookup set is deterministic:
    every doc_id whose n_chars is divisible by 97."""
    import tempfile

    from bloomjoin_spark.sources import read_bloom_indexed, write_bloom_indexed

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = os.path.join(
        tempfile.gettempdir(), f"bj_docs_bloom_idx_{_layout_tag(sf_dir)}"
    )
    write_bloom_indexed(docs, path, key="doc_id", num_files=8)
    wanted = [
        r["doc_id"]
        for r in docs.filter(F.col("n_chars") % 97 == 0).select("doc_id").collect()
    ]
    return read_bloom_indexed(spark, path, "doc_id", wanted)


def _contiguous_ids_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global gap-free id assignment in doc_id order — ROW_NUMBER
    semantics via range-sort + per-partition offsets (two KB-scale
    passes, no single-partition window; operators/sampling.py
    assign_contiguous_ids).  Shard ids derive deterministically."""
    from bloomjoin_spark.operators import assign_contiguous_ids

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    out = assign_contiguous_ids(docs, "doc_id", num_partitions=8)
    return out.select(
        "doc_id", "source", "seq_id",
        F.floor(F.col("seq_id") / 100).alias("shard_id"),
    )


def _shuffled_ids_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: rank = ROW_NUMBER over
    md5(salt || doc_id) — reproducible across engines and reruns,
    re-randomized per salt (epoch).  operators/sampling.py
    deterministic_shuffle, built on assign_contiguous_ids."""
    from bloomjoin_spark.operators import deterministic_shuffle

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    out = deterministic_shuffle(docs, "doc_id", salt="epoch0",
                                num_partitions=8)
    return out.select("doc_id", "shuffle_rank")


def _length_buckets_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: equi-depth quartile binning of documents by length —
    exact-percentile cutoffs (Hive rule pos = p*(n-1), linear
    interpolation) then ONE stateless codegen assignment; ties land in
    the lower bucket, k=4 keeps every p exactly binary-representable so
    the DuckDB oracle's manual interpolation is bit-identical
    (operators/sampling.py quantile_buckets; KLL is the declared
    100 TB path for continuous domains)."""
    from bloomjoin_spark.operators import quantile_buckets

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return quantile_buckets(docs, "n_chars", k=4).orderBy("doc_id")


def _vocab_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: frequency-ranked vocabulary over the documents table —
    word histogram → ROW_NUMBER() OVER (ORDER BY n DESC, word) ids,
    contiguous from 1 (0 reserved for OOV), ranked WITHOUT a
    single-partition window (operators/vocab.py build_vocab on
    assign_contiguous_ids).  The DuckDB oracle recomputes the identical
    rank rule value-for-value."""
    from bloomjoin_spark.operators import build_vocab

    docs = _t(spark, sf_dir, "documents")
    return build_vocab(docs, min_count=2, num_partitions=8).orderBy(
        "token_id"
    )


def _encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: encode every document as an ordered array of vocabulary
    ids — the bridge from raw text to the north-rule pre-tokenized
    shape (doc_id, tokens:array<int>, n_tok, source).  Words below
    min_count become OOV id 0; empty docs keep empty arrays.  The
    reassembly exchange carries only integer triples; the oracle
    recomputes the vocabulary AND every per-document id sequence."""
    from bloomjoin_spark.operators import build_vocab, encode_documents

    docs = _t(spark, sf_dir, "documents")
    vocab = build_vocab(docs, min_count=2, num_partitions=8)
    enc = encode_documents(docs, vocab)
    return enc.select(
        "doc_id",
        "source",
        F.array_join(
            F.transform("tokens", lambda t: t.cast("string")), " "
        ).alias("tokens_str"),
        "n_tok",
    ).orderBy("doc_id")


def _span_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: cross-document duplicate token-SPAN removal (the
    exact-substring dedup tier, Lee et al. 2022) — word 6-grams shared
    by >= 2 documents are removed as merged maximal spans, order
    preserved, rows never dropped.  The DuckDB oracle recomputes the
    whole thing with TRUE list-equality gram grouping, pinning both the
    removed-token counts and the exact rebuilt text of every document."""
    from bloomjoin_spark.operators import remove_duplicate_spans, words_col

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", words_col(F.col("text")).alias("w")
    )
    out = remove_duplicate_spans(docs, n=6, tokens_col="w", id_col="doc_id")
    return out.select(
        "doc_id",
        "n_dup_tokens",
        F.array_join("w", " ").alias("clean_text"),
    ).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bloom_inner_join": _bloom_inner,
        "span_dedup_docs": _span_dedup_docs,
        "vocab_docs": _vocab_docs,
        "encode_docs": _encode_docs,
        "length_buckets_docs": _length_buckets_docs,
        "bloom_inner_join_auto_floor": _bloom_inner_auto_floor,
        "decontam_docs": _decontam_docs,
        "decontam_many_docs": _decontam_many_docs,
        "repetition_docs": _repetition_docs,
        "quality_docs": _quality_docs,
        "boilerplate_docs": _boilerplate_docs,
        "source_divergence_docs": _source_divergence_docs,
        "scrub_docs": _scrub_docs,
        "pipeline_docs": _pipeline_docs,
        "chunk_docs": _chunk_docs,
        "token_budget_docs": _token_budget_docs,
        "temperature_mixture_docs": _temperature_mixture_docs,
        "repeat_mixture_docs": _repeat_mixture_docs,
        "profile_docs": _profile_docs,
        "bigram_score_docs": _bigram_score_docs,
        "trigram_score_docs": _trigram_score_docs,
        "decontam_tokens_f0": _decontam_tokens_f0,
        "hash_split_docs": _hash_split_docs,
        "weighted_mixture_docs": _weighted_mixture_docs,
        "pack_documents": _pack_documents,
        "pack_documents_1p": _pack_documents_1p,
        "bloom_inner_join_native": _bloom_inner_native,
        "bloom_semi_join": _bloom_semi,
        "bloom_anti_join": _bloom_anti,
        "bloom_left_join": _bloom_left,
        "bloom_right_join": _bloom_right,
        "bloom_full_join": _bloom_full,
        "bloom_composite_key_join": _bloom_composite,
        "hll_distinct_docid": _hll_distinct_docid,
        "hll_distinct_partkey": _hll_distinct_partkey,
        "cms_partkey_freq": _cms_partkey_freq,
        "tdigest_quantiles_price": _tdigest_quantiles_price,
        "kll_quantiles_nchars": _kll_quantiles_nchars,
        "bloom_fpr_check": _bloom_fpr_check,
        "join_size_estimate": _join_size_estimate,
        "exact_dedup_union": _exact_dedup_union,
        "incremental_dedup_docs": _incremental_dedup_docs,
        "minhash_dedup_planted": _minhash_dedup_planted,
        "text_stats": _text_stats,
        "lang_id": _lang_id,
        "fingerprints": _fingerprints,
        "ann_cosine_topk": _ann_cosine_topk,
        "embedding_near_dup_planted": _embedding_near_dup_planted,
        "salted_join_counts": _salted_join_counts,
        "sessionize_events": _sessionize_events,
        "asof_join_events": _asof_join_events,
        "session_stream_events": _session_stream_events,
        "sample_exact_k_docs": _sample_exact_k_docs,
        "topk_per_group_docs": _topk_per_group_docs,
        "dedup_lines_docs": _dedup_lines_docs,
        "weighted_sample_docs": _weighted_sample_docs,
        "zorder_scan_events": _zorder_scan_events,
        "multimodal_meta": _multimodal_meta,
        "streaming_windowed_counts": _streaming_windowed_counts,
        "streaming_bloom_join": _streaming_bloom_join,
        "hll_distinct_by_source": _hll_distinct_by_source,
        "grouped_median_nchars": _grouped_median_nchars,
        "sketch_store_incremental": _sketch_store_incremental,
        "sketch_store_stream_docs": _sketch_store_stream_docs,
        "theta_source_overlap": _theta_source_overlap,
        "fd_embeddings": _fd_embeddings,
        "fd_mass_by_label": _fd_mass_by_label,
        "pca_project_embeddings": _pca_project_embeddings,
        "source_overlap_matrix_docs": _source_overlap_matrix_docs,
        "stateful_hll_stream": _stateful_hll_stream,
        "topk_stream_events": _topk_stream_events,
        "decontam_stream_docs": _decontam_stream_docs,
        "dedup_stream_docs": _dedup_stream_docs,
        "incr_dedup_stream_docs": _incr_dedup_stream_docs,
        "minhash_full_dedup": _minhash_full_dedup,
        "ngram_jaccard_docs": _ngram_jaccard_docs,
        "containment_docs": _containment_docs,
        "lsh_plan_report": _lsh_plan_report,
        "grouped_topk_lineitem": _grouped_topk_lineitem,
        "grouped_topk_weighted": _grouped_topk_weighted,
        "simhash_planted": _simhash_planted,
        "ann_lsh_recall": _ann_lsh_recall,
        "ann_ivf_recall": _ann_ivf_recall,
        "ann_pq_recall": _ann_pq_recall,
        "ann_ivf_pq_recall": _ann_ivf_pq_recall,
        "ann_ivf_partitioned_recall": _ann_ivf_partitioned_recall,
        "hash_keys_cross_type": _hash_keys_cross_type,
        "simhash_capped_bucket": _simhash_capped_bucket,
        "winnowing_planted": _winnowing_planted,
        "cms_event_type_freq": _cms_event_type_freq,
        "bloom_join_tokens_f0": _bloom_join_tokens_f0,
        "hll_distinct_tokens_f0": _hll_distinct_tokens_f0,
        "cms_hot_tokens_f0": _cms_hot_tokens_f0,
        "topk_hot_tokens_f0": _topk_hot_tokens_f0,
        "salted_source_join_f0": _salted_source_join_f0,
        "bloom_params_report": _bloom_params_report,
        "token_profile_f0": _token_profile_f0,
        "bucketed_join_orders": _bucketed_join_orders,
        "partitioned_scan_events": _partitioned_scan_events,
        "range_scan_events": _range_scan_events,
        "bloom_index_lookup_docs": _bloom_index_lookup_docs,
        "contiguous_ids_docs": _contiguous_ids_docs,
        "shuffled_ids_docs": _shuffled_ids_docs,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bloom_inner_join": """
            SELECT l.l_orderkey, l.l_partkey, l.l_quantity, p.p_partkey, p.p_name
            FROM lineitem l
            JOIN (SELECT p_partkey, p_name FROM part WHERE p_partkey % 10 = 0) p
              ON l.l_partkey = p.p_partkey
        """,
        "bloom_inner_join_native": """
            SELECT l.l_orderkey, l.l_partkey, l.l_quantity, p.p_partkey, p.p_name
            FROM lineitem l
            JOIN (SELECT p_partkey, p_name FROM part WHERE p_partkey % 10 = 0) p
              ON l.l_partkey = p.p_partkey
        """,
        "bloom_inner_join_auto_floor": """
            SELECT l.l_orderkey, l.l_partkey, l.l_quantity, p.p_partkey, p.p_name
            FROM lineitem l
            JOIN (SELECT p_partkey, p_name FROM part WHERE p_partkey % 10 = 0) p
              ON l.l_partkey = p.p_partkey
        """,
        "length_buckets_docs": r"""
            WITH n AS (SELECT COUNT(*)::BIGINT AS c FROM documents),
            o AS (
              SELECT n_chars,
                     ROW_NUMBER() OVER (ORDER BY n_chars) - 1 AS r
              FROM documents
            ),
            cut AS (
              SELECT i, (i / 4.0) * (c - 1) AS idx
              FROM UNNEST([1, 2, 3]) t(i), n
            ),
            cv AS (
              SELECT lo.n_chars
                     + (hi.n_chars - lo.n_chars) * (cut.idx - FLOOR(cut.idx))
                       AS cutoff
              FROM cut
              JOIN o lo ON lo.r = CAST(FLOOR(cut.idx) AS BIGINT)
              JOIN o hi ON hi.r = CAST(CEIL(cut.idx) AS BIGINT)
            )
            SELECT d.doc_id, d.n_chars,
                   (SELECT COUNT(*) FROM cv WHERE d.n_chars > cv.cutoff)::INT
                     AS bucket
            FROM documents d
            ORDER BY d.doc_id
        """,
        "vocab_docs": r"""
            WITH w AS (
              SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
              FROM documents WHERE length(trim(text)) > 0
            ),
            h AS (
              SELECT word, COUNT(*)::BIGINT AS n FROM w GROUP BY word
              HAVING COUNT(*) >= 2
            )
            SELECT ROW_NUMBER() OVER (ORDER BY n DESC, word) AS token_id,
                   word, n
            FROM h
            ORDER BY token_id
        """,
        "encode_docs": r"""
            WITH wl AS (
              SELECT doc_id, source,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE string_split_regex(trim(text), '\s+') END AS ws
              FROM documents
            ),
            h AS (
              SELECT word, COUNT(*)::BIGINT AS n
              FROM (SELECT unnest(ws) AS word FROM wl) GROUP BY word
              HAVING COUNT(*) >= 2
            ),
            v AS (
              SELECT ROW_NUMBER() OVER (ORDER BY n DESC, word) AS token_id,
                     word
              FROM h
            ),
            e AS (
              SELECT wl.doc_id, i AS pos, ws[i] AS word
              FROM wl, UNNEST(generate_series(1, len(ws))) t(i)
            ),
            j AS (
              SELECT e.doc_id, e.pos,
                     COALESCE(v.token_id, 0) AS tid
              FROM e LEFT JOIN v USING (word)
            ),
            agg AS (
              SELECT doc_id,
                     string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos)
                       AS tokens_str,
                     COUNT(*)::BIGINT AS n_tok
              FROM j GROUP BY doc_id
            )
            SELECT d.doc_id, d.source,
                   COALESCE(agg.tokens_str, '') AS tokens_str,
                   COALESCE(agg.n_tok, 0)::INT AS n_tok
            FROM documents d LEFT JOIN agg USING (doc_id)
            ORDER BY d.doc_id
        """,
        "span_dedup_docs": r"""
            WITH words AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM documents
            ),
            pos AS (
              SELECT doc_id, i, w[i:i+5] AS g
              FROM words, UNNEST(generate_series(1, len(w) - 5)) t(i)
            ),
            dup AS (
              SELECT g FROM pos GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
            ),
            hits AS (
              SELECT DISTINCT p.doc_id, p.i FROM pos p JOIN dup USING (g)
            ),
            covered AS (
              SELECT DISTINCT h.doc_id, h.i + o AS j
              FROM hits h, UNNEST(generate_series(0, 5)) t(o)
            ),
            toks AS (
              SELECT doc_id, j, w[j] AS tok
              FROM words, UNNEST(generate_series(1, len(w))) t(j)
            ),
            kept AS (
              SELECT t.doc_id, t.j, t.tok FROM toks t
              ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.j = c.j
            ),
            agg AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS clean_text
              FROM kept GROUP BY doc_id
            ),
            nrm AS (
              SELECT doc_id, COUNT(*)::BIGINT AS n_dup_tokens
              FROM covered GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(nrm.n_dup_tokens, 0)::BIGINT AS n_dup_tokens,
                   coalesce(agg.clean_text, '') AS clean_text
            FROM documents d
            LEFT JOIN agg USING (doc_id) LEFT JOIN nrm USING (doc_id)
            ORDER BY d.doc_id
        """,
        "decontam_docs": r"""
            WITH words AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM documents
            ),
            bench AS (
              SELECT DISTINCT w[i:i+5] AS ng
              FROM words, UNNEST(generate_series(1, len(w) - 5)) t(i)
              WHERE doc_id % 29 = 3
            ),
            grams AS (
              SELECT d.doc_id, d.w[i:i+5] AS ng
              FROM words d, UNNEST(generate_series(1, len(d.w) - 5)) t(i)
            )
            SELECT g.doc_id, COUNT(DISTINCT g.ng)::BIGINT AS n_hits
            FROM grams g JOIN bench b ON g.ng = b.ng
            GROUP BY g.doc_id
            ORDER BY g.doc_id
        """,
        "decontam_tokens_f0": """
            SELECT 218 AS n_flagged, TRUE AS matches_exact,
                   TRUE AS all_sources_flagged
        """,
        "boilerplate_docs": """
            WITH split AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
            ),
            lines AS (
              SELECT doc_id, i AS ord, ls[i] AS line
              FROM split, UNNEST(generate_series(1, len(ls))) t(i)
            ),
            common AS (
              SELECT line FROM lines WHERE length(line) > 0
              GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
            ),
            kept AS (
              SELECT l.doc_id, l.ord, l.line FROM lines l
              ANTI JOIN common c ON l.line = c.line
            ),
            rebuilt AS (
              SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS clean
              FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(r.clean, '') AS text
            FROM documents d LEFT JOIN rebuilt r USING (doc_id)
            ORDER BY d.doc_id
        """,
        "decontam_many_docs": r"""
            WITH words AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM documents
            ),
            grams AS (
              SELECT d.doc_id, d.w[i:i+5] AS ng
              FROM words d, UNNEST(generate_series(1, len(d.w) - 5)) t(i)
            ),
            bench AS (
              SELECT 'eval_a' AS suite, ng
              FROM (SELECT DISTINCT g.ng FROM grams g
                    WHERE g.doc_id % 29 = 3) s
              UNION ALL
              SELECT 'eval_b' AS suite, ng
              FROM (SELECT DISTINCT g.ng FROM grams g
                    WHERE g.doc_id % 31 = 4) s
            )
            SELECT g.doc_id, b.suite, COUNT(DISTINCT g.ng)::BIGINT AS n_hits
            FROM grams g JOIN bench b ON g.ng = b.ng
            GROUP BY g.doc_id, b.suite
            ORDER BY g.doc_id, b.suite
        """,
        "decontam_stream_docs": r"""
            WITH words AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM documents
            ),
            bench AS (
              SELECT DISTINCT w[i:i+5] AS ng
              FROM words, UNNEST(generate_series(1, len(w) - 5)) t(i)
              WHERE doc_id % 29 = 3
            ),
            flagged AS (
              SELECT DISTINCT d.doc_id
              FROM words d, UNNEST(generate_series(1, len(d.w) - 5)) t(i)
              JOIN bench b ON d.w[i:i+5] = b.ng
            )
            SELECT (SELECT COUNT(*) FROM flagged)::BIGINT AS n_flagged,
                   (SELECT COUNT(*) FROM documents)::BIGINT AS n_total
        """,
        "source_divergence_docs": r"""
            WITH words AS (
              SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
              FROM documents WHERE length(trim(text)) > 0
            ),
            per AS (
              SELECT source, token, COUNT(*)::DOUBLE AS n
              FROM words GROUP BY source, token
            ),
            totals AS (SELECT source, SUM(n) AS gn FROM per GROUP BY source),
            corpus AS (SELECT token, SUM(n) AS cn FROM per GROUP BY token),
            ct AS (SELECT SUM(cn) AS ct FROM corpus)
            SELECT p.source,
                   t.gn::BIGINT AS n_tokens,
                   COUNT(*)::BIGINT AS n_distinct_tokens,
                   round(SUM((p.n / t.gn) * ln((p.n / t.gn) / (c.cn / ct.ct))), 6)
                     AS kl_vs_corpus
            FROM per p
            JOIN corpus c USING (token)
            JOIN totals t USING (source), ct
            GROUP BY p.source, t.gn
            ORDER BY p.source
        """,
        "scrub_docs": r"""
            WITH planted AS (
              SELECT doc_id,
                     text || ' contact user' || doc_id::VARCHAR || '@example.com'
                     || CASE WHEN doc_id % 3 = 0
                             THEN ' cc admin' || doc_id::VARCHAR || '@ex.org'
                             ELSE '' END
                     || ' see https://site.io/p?q=' || doc_id::VARCHAR
                     || ' at 10.0.0.' || (doc_id % 256)::VARCHAR AS text
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       'https?://[^\s]+', '<URL>', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
                     AS text,
                   len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT
                     AS n_email,
                   len(regexp_extract_all(text, 'https?://[^\s]+'))::INT AS n_url,
                   len(regexp_extract_all(text,
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::INT AS n_ipv4
            FROM planted
            ORDER BY doc_id
        """,
        # The full composed pipeline, recomputed stage by stage with the
        # same CTE building blocks as the per-stage oracles.  Minhash at
        # threshold=1.0 reduces to shingle-set equality, which on this
        # corpus (every text globally unique via the planted doc_id PII
        # suffix; every doc >= 3 words) equals whitespace-collapsed
        # lower/trim equality — the d2 CTE replicates exactly that.
        "pipeline_docs": r"""
            WITH base AS (
              SELECT doc_id, source,
                     text || ' contact user' || doc_id::VARCHAR || '@example.com'
                     || ' see https://site.io/p?q=' || doc_id::VARCHAR
                     || ' at 10.0.0.' || (doc_id % 256)::VARCHAR
                     || CASE WHEN doc_id % 4 = 0
                             THEN chr(10) || 'common footer end' ELSE '' END
                     AS text
              FROM documents
            ),
            mx AS (SELECT max(doc_id) + 1 AS o FROM documents),
            u AS (
              SELECT doc_id, source, text FROM base
              UNION ALL
              SELECT doc_id + (SELECT o FROM mx), source, text
              FROM base WHERE doc_id % 5 = 0
              UNION ALL
              SELECT doc_id + 2 * (SELECT o FROM mx), source,
                     regexp_replace(text, ' ', '  ', 'g')
              FROM base WHERE doc_id % 7 = 0
            ),
            d1 AS (
              SELECT u.doc_id, u.source, u.text FROM u
              JOIN (SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS doc_id
                    FROM u GROUP BY 1) k USING (doc_id)
            ),
            d2 AS (
              SELECT d1.doc_id, d1.source, d1.text FROM d1
              JOIN (SELECT min(doc_id) AS doc_id FROM d1
                    GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) k2
              USING (doc_id)
            ),
            w AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM d2
            ),
            bw AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM base WHERE doc_id % 29 = 3
            ),
            bench AS (
              SELECT DISTINCT w[i:i+5] AS ng
              FROM bw, UNNEST(generate_series(1, len(w) - 5)) t(i)
            ),
            flagged AS (
              SELECT DISTINCT g.doc_id
              FROM (SELECT d.doc_id, d.w[i:i+5] AS ng
                    FROM w d, UNNEST(generate_series(1, len(d.w) - 5)) t(i)) g
              JOIN bench b ON g.ng = b.ng
            ),
            d3 AS (
              SELECT d2.doc_id, d2.source, d2.text FROM d2
              ANTI JOIN flagged f ON d2.doc_id = f.doc_id
            ),
            split_l AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM d3
            ),
            lines AS (
              SELECT doc_id, i AS ord, ls[i] AS line
              FROM split_l, UNNEST(generate_series(1, len(ls))) t(i)
            ),
            common AS (
              SELECT line FROM lines WHERE length(line) > 0
              GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
            ),
            keptl AS (
              SELECT l.doc_id, l.ord, l.line FROM lines l
              ANTI JOIN common c ON l.line = c.line
            ),
            rebuilt AS (
              SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS clean
              FROM keptl GROUP BY doc_id
            ),
            d4 AS (
              SELECT d3.doc_id, d3.source, coalesce(r.clean, '') AS text
              FROM d3 LEFT JOIN rebuilt r USING (doc_id)
            ),
            qw AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE string_split_regex(trim(lower(text)), '\s+') END AS w
              FROM d4
            ),
            qm AS (
              SELECT doc_id, len(w) AS nw,
                     coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS cs,
                     len(list_distinct(w)) AS nd,
                     len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS na,
                     len(list_intersect(list_distinct(w),
                         ['the','a','and','of','to','in','is','it','that','for'])) AS ns
              FROM qw
            ),
            qpass AS (
              SELECT doc_id FROM qm
              WHERE nw >= 30 AND nw <= 100000
                AND (CASE WHEN nw > 0 THEN cs::DOUBLE / nw ELSE 0 END) >= 2.0
                AND (CASE WHEN nw > 0 THEN cs::DOUBLE / nw ELSE 0 END) <= 12.0
                AND (CASE WHEN nw > 0 THEN (nw - nd)::DOUBLE / nw ELSE 0 END) <= 0.6
                AND (CASE WHEN nw > 0 THEN na::DOUBLE / nw ELSE 0 END) >= 0.8
                AND ns >= 1
            ),
            d5 AS (SELECT d4.* FROM d4 JOIN qpass USING (doc_id)),
            d6 AS (
              SELECT doc_id, source,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                         'https?://[^\s]+', '<URL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
                       AS text
              FROM d5
            ),
            d7 AS (
              SELECT doc_id, source, text FROM d6
              WHERE substr(md5(doc_id::VARCHAR || '|'), 1, 4) <
                    CASE WHEN source = 'src0' THEN '4000'
                         WHEN source = 'src1' THEN 'g'
                         ELSE '8000' END
            )
            SELECT doc_id, source,
                   CASE WHEN substr(md5(doc_id::VARCHAR || '|s1'), 1, 4) < 'cccd'
                          THEN 'train'
                        WHEN substr(md5(doc_id::VARCHAR || '|s1'), 1, 4) < 'e666'
                          THEN 'val'
                        ELSE 'test' END AS split,
                   text
            FROM d7
            ORDER BY doc_id
        """,
        "chunk_docs": r"""
            WITH words AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE string_split_regex(trim(text), '\s+') END AS w
              FROM documents
            ),
            ch AS (
              SELECT doc_id, i::INT AS chunk_id,
                     array_to_string(w[(i-1)*28+1 : (i-1)*28+32], ' ') AS chunk_text,
                     len(w[(i-1)*28+1 : (i-1)*28+32])::INT AS n_words
              FROM words, UNNEST(generate_series(1,
                    CASE WHEN len(w) = 0 THEN 0
                         WHEN len(w) <= 32 THEN 1
                         ELSE cast(ceil((len(w) - 32) / 28.0) AS INT) + 1 END)) t(i)
            )
            SELECT doc_id, chunk_id, chunk_text, n_words
            FROM ch ORDER BY doc_id, chunk_id
        """,
        "token_budget_docs": """
            WITH totals AS (
              SELECT source, SUM(n_chars)::DOUBLE AS t
              FROM documents GROUP BY source
            ),
            th AS (
              SELECT source,
                     CASE WHEN CAST(round(rate * 65536) AS INT) >= 65536 THEN 'g'
                          ELSE printf('%04x', CAST(round(rate * 65536) AS INT))
                     END AS lim
              FROM (
                SELECT source,
                       LEAST(1.0, CASE source WHEN 'src0' THEN 500.0
                                              WHEN 'src1' THEN 2000.0 END / t)
                         AS rate
                FROM totals WHERE source IN ('src0', 'src1')
              )
            )
            SELECT d.source, COUNT(*)::BIGINT AS n_rows,
                   SUM(d.n_chars)::BIGINT AS kept_chars
            FROM documents d JOIN th USING (source)
            WHERE substr(md5(d.doc_id::VARCHAR || '|'), 1, 4) < th.lim
            GROUP BY d.source ORDER BY d.source
        """,
        "temperature_mixture_docs": """
            WITH totals AS (
              SELECT source, COALESCE(SUM(n_chars), 0)::DOUBLE AS t
              FROM documents WHERE source IS NOT NULL
              GROUP BY source
            ),
            top AS (SELECT max(pow(t, -0.5)) AS mx FROM totals WHERE t > 0),
            th AS (
              SELECT source,
                     CASE WHEN CAST(round(rate * 65536) AS INT) >= 65536 THEN 'g'
                          ELSE printf('%04x', CAST(round(rate * 65536) AS INT))
                     END AS lim
              FROM (
                -- zero-mass strata are free (rate 1), matching the
                -- operator's token_budget-style rule
                SELECT source,
                       CASE WHEN t > 0
                            THEN LEAST(1.0, pow(t, -0.5) / (SELECT mx FROM top))
                            ELSE 1.0 END AS rate
                FROM totals
              )
            )
            SELECT d.source, COUNT(*)::BIGINT AS n_rows,
                   SUM(d.n_chars)::BIGINT AS kept_chars
            FROM documents d JOIN th USING (source)
            WHERE substr(md5(d.doc_id::VARCHAR || '|'), 1, 4) < th.lim
            GROUP BY d.source ORDER BY d.source
        """,
        "repeat_mixture_docs": """
            WITH base AS (
              SELECT doc_id, source,
                     CASE WHEN source = 'src0' THEN 2
                          WHEN source = 'src1' THEN 0
                          ELSE 1 END
                   + CASE WHEN substr(md5(doc_id::VARCHAR || '|'), 1, 4) <
                               CASE WHEN source = 'src0' THEN '8000'
                                    WHEN source = 'src1' THEN '8000'
                                    ELSE '0000' END
                          THEN 1 ELSE 0 END AS n
              FROM documents
            )
            SELECT doc_id, source, unnest(range(0, n))::INT AS epoch
            FROM base
        """,
        "incr_dedup_stream_docs": """
            -- survivor fingerprints = distinct batch fingerprints not in
            -- history.  LEFT JOIN (not NOT IN) so a NULL fingerprint
            -- behaves like Spark's left_anti: NULL never equals, so a
            -- NULL-text doc always survives into the distinct set
            WITH allfp AS (
              SELECT DISTINCT md5(lower(trim(text))) AS content_fp
              FROM documents
            ),
            hfp AS (
              SELECT DISTINCT md5(lower(trim(text))) AS content_fp
              FROM documents WHERE doc_id % 10 <> 0
            )
            SELECT a.content_fp FROM allfp a
            LEFT JOIN hfp h ON a.content_fp = h.content_fp
            WHERE h.content_fp IS NULL
        """,
        "dedup_stream_docs": """
            -- dropDuplicates keeps ONE survivor for a NULL fingerprint
            -- group, which COUNT(DISTINCT) excludes — add it back so a
            -- fixture with NULL text cannot break parity
            SELECT (COUNT(DISTINCT md5(lower(trim(text))))
                    + CASE WHEN COUNT(*) FILTER (WHERE text IS NULL) > 0
                           THEN 1 ELSE 0 END)::BIGINT AS n_survivors,
                   (COUNT(DISTINCT md5(lower(trim(text))))
                    + CASE WHEN COUNT(*) FILTER (WHERE text IS NULL) > 0
                           THEN 1 ELSE 0 END)::BIGINT AS n_fingerprints
            FROM documents
        """,
        "profile_docs": """
              SELECT 'doc_id' AS col_name, COUNT(*)::BIGINT AS n_rows,
                     SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
                     MIN(doc_id)::VARCHAR AS min_str, MAX(doc_id)::VARCHAR AS max_str,
                     TRUE AS distinct_ok, TRUE AS median_ok
              FROM documents
              UNION ALL
              SELECT 'lang' AS col_name, COUNT(*)::BIGINT AS n_rows,
                     SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
                     MIN(lang)::VARCHAR AS min_str, MAX(lang)::VARCHAR AS max_str,
                     TRUE AS distinct_ok, TRUE AS median_ok
              FROM documents
              UNION ALL
              SELECT 'n_chars' AS col_name, COUNT(*)::BIGINT AS n_rows,
                     SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
                     MIN(n_chars)::VARCHAR AS min_str, MAX(n_chars)::VARCHAR AS max_str,
                     TRUE AS distinct_ok, TRUE AS median_ok
              FROM documents
              UNION ALL
              SELECT 'source' AS col_name, COUNT(*)::BIGINT AS n_rows,
                     SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
                     MIN(source)::VARCHAR AS min_str, MAX(source)::VARCHAR AS max_str,
                     TRUE AS distinct_ok, TRUE AS median_ok
              FROM documents
              UNION ALL
              SELECT 'text' AS col_name, COUNT(*)::BIGINT AS n_rows,
                     SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
                     MIN(text)::VARCHAR AS min_str, MAX(text)::VARCHAR AS max_str,
                     TRUE AS distinct_ok, TRUE AS median_ok
              FROM documents
            ORDER BY col_name
        """,
        "trigram_score_docs": r"""
            WITH words AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE string_split_regex(trim(text), '\s+') END AS w
              FROM documents
            ),
            tris AS (
              SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
              FROM words, UNNEST(generate_series(1, len(w) - 2)) t(i)
            ),
            ctx AS (
              SELECT w[i] AS w1, w[i+1] AS w2, COUNT(*)::DOUBLE AS c12
              FROM words, UNNEST(generate_series(1, len(w) - 1)) t(i)
              GROUP BY 1, 2
            ),
            v AS (
              SELECT COUNT(DISTINCT u)::DOUBLE AS vocab
              FROM (SELECT unnest(w) AS u FROM words)
            ),
            tc AS (
              SELECT w1, w2, w3, COUNT(*)::DOUBLE AS c123
              FROM tris GROUP BY w1, w2, w3
            )
            SELECT g.doc_id,
                   COUNT(*)::BIGINT AS n_trigrams,
                   round(AVG(ln((t.c123 + 0.5) / (c.c12 + 0.5 * v.vocab))), 6)
                     AS avg_logprob
            FROM tris g
            JOIN tc t USING (w1, w2, w3)
            JOIN ctx c USING (w1, w2), v
            GROUP BY g.doc_id
            ORDER BY g.doc_id
        """,
        "bigram_score_docs": r"""
            WITH words AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE string_split_regex(trim(text), '\s+') END AS w
              FROM documents
            ),
            grams AS (
              SELECT doc_id, w[i] AS w1, w[i+1] AS w2
              FROM words, UNNEST(generate_series(1, len(w) - 1)) t(i)
            ),
            uni AS (
              SELECT unnest(w) AS w1, 1 AS one FROM words
            ),
            uc AS (SELECT w1, COUNT(*)::DOUBLE AS c1 FROM uni GROUP BY w1),
            v AS (SELECT COUNT(*)::DOUBLE AS vocab FROM uc),
            bc AS (
              SELECT w1, w2, COUNT(*)::DOUBLE AS c12 FROM grams GROUP BY w1, w2
            )
            SELECT g.doc_id,
                   COUNT(*)::BIGINT AS n_bigrams,
                   round(AVG(ln((b.c12 + 0.5) / (u.c1 + 0.5 * v.vocab))), 6)
                     AS avg_logprob
            FROM grams g
            JOIN bc b USING (w1, w2)
            JOIN uc u USING (w1), v
            GROUP BY g.doc_id
            ORDER BY g.doc_id
        """,
        "repetition_docs": r"""
            WITH words AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE string_split_regex(trim(text), '\s+') END AS w
              FROM documents
            ),
            rep AS (
              SELECT doc_id,
                     round(CASE WHEN len(w) > 0 THEN
                       (len(w) - len(list_distinct(w)))::DOUBLE / len(w)
                       ELSE 0 END, 6) AS dup_word_frac,
                     round(CASE WHEN coalesce(list_sum(list_transform(w, x -> length(x))), 0) > 0 THEN
                       (list_sum(list_transform(w, x -> length(x)))
                        - list_sum(list_transform(list_distinct(w), x -> length(x))))::DOUBLE
                       / list_sum(list_transform(w, x -> length(x)))
                       ELSE 0 END, 6) AS dup_word_char_frac,
                     coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS cs
              FROM words
            ),
            grams AS (
              SELECT doc_id, w[i:i+1] AS ng
              FROM words, UNNEST(generate_series(1, len(w) - 1)) t(i)
            ),
            counts AS (
              SELECT doc_id, ng, COUNT(*) AS c,
                     list_sum(list_transform(ng, x -> length(x))) AS g
              FROM grams GROUP BY doc_id, ng
            ),
            top AS (
              SELECT doc_id, c, g FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, g DESC) AS rn
                FROM counts
              ) WHERE rn = 1
            )
            SELECT r.doc_id, r.dup_word_frac, r.dup_word_char_frac,
                   t.c::BIGINT AS top_ngram_count,
                   round(CASE WHEN r.cs > 0 THEN (t.c * t.g)::DOUBLE / r.cs
                         ELSE 0 END, 6) AS top_ngram_char_frac
            FROM rep r JOIN top t USING (doc_id)
            ORDER BY r.doc_id
        """,
        "quality_docs": r"""
            WITH words AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE string_split_regex(trim(lower(text)), '\s+') END AS w
              FROM documents
            ),
            m AS (
              SELECT doc_id, len(w) AS nw,
                     coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS cs,
                     len(list_distinct(w)) AS nd,
                     len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS na,
                     len(list_intersect(list_distinct(w),
                         ['the','a','and','of','to','in','is','it','that','for'])) AS ns
              FROM words
            )
            SELECT doc_id,
                   nw >= 30 AND nw <= 100000 AS rule_word_count,
                   (CASE WHEN nw > 0 THEN cs::DOUBLE / nw ELSE 0 END) >= 2.0
                   AND (CASE WHEN nw > 0 THEN cs::DOUBLE / nw ELSE 0 END) <= 12.0
                     AS rule_mean_word_len,
                   (CASE WHEN nw > 0 THEN (nw - nd)::DOUBLE / nw ELSE 0 END) <= 0.6
                     AS rule_dup_words,
                   (CASE WHEN nw > 0 THEN na::DOUBLE / nw ELSE 0 END) >= 0.8
                     AS rule_alpha_words,
                   ns >= 1 AS rule_stopwords,
                   (nw >= 30 AND nw <= 100000)
                   AND ((CASE WHEN nw > 0 THEN cs::DOUBLE / nw ELSE 0 END) >= 2.0
                        AND (CASE WHEN nw > 0 THEN cs::DOUBLE / nw ELSE 0 END) <= 12.0)
                   AND ((CASE WHEN nw > 0 THEN (nw - nd)::DOUBLE / nw ELSE 0 END) <= 0.6)
                   AND ((CASE WHEN nw > 0 THEN na::DOUBLE / nw ELSE 0 END) >= 0.8)
                   AND (ns >= 1) AS passes_quality
            FROM m
            ORDER BY doc_id
        """,
        "hash_split_docs": """
            SELECT CASE WHEN substr(md5(doc_id::VARCHAR || '|'), 1, 4) < 'cccd' THEN 'train'
                        WHEN substr(md5(doc_id::VARCHAR || '|'), 1, 4) < 'e666' THEN 'val'
                        ELSE 'test' END AS split,
                   COUNT(*)::BIGINT AS n_rows
            FROM documents
            GROUP BY 1
            ORDER BY 1
        """,
        "weighted_mixture_docs": """
            SELECT source, COUNT(*)::BIGINT AS n_rows
            FROM documents
            WHERE substr(md5(doc_id::VARCHAR || '|'), 1, 4) <
                  CASE WHEN source = 'src0' THEN '4000'
                       WHEN source = 'src1' THEN 'g'
                       ELSE '8000' END
            GROUP BY source
            ORDER BY source
        """,
        "pack_documents": """
            WITH tok AS (
              SELECT CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
              FROM documents
            )
            SELECT COUNT(*)::BIGINT AS n_docs,
                   SUM(n)::BIGINT AS total_tokens,
                   SUM(CASE WHEN n > 64 THEN 1 ELSE 0 END)::BIGINT AS oversize_packs,
                   TRUE AS bound_ok
            FROM tok
        """,
        # Exact pack membership on the layout-deterministic single
        # partition: the recursive CTE runs the same greedy recurrence
        # as the engine (overflow closes the pack; > max on one doc ==
        # oversize own pack).  pack_id = local index (partition 0).
        "pack_documents_1p": r"""
            WITH RECURSIVE docs_ord AS (
              SELECT row_number() OVER (ORDER BY doc_id) AS rn, doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS n
              FROM documents
            ),
            g AS (
              SELECT rn, doc_id, n, 0 AS pack_no, n AS acc
              FROM docs_ord WHERE rn = 1
              UNION ALL
              SELECT d.rn, d.doc_id, d.n,
                     CASE WHEN g.acc + d.n > 64 THEN g.pack_no + 1
                          ELSE g.pack_no END,
                     CASE WHEN g.acc + d.n > 64 THEN d.n
                          ELSE g.acc + d.n END
              FROM g JOIN docs_ord d ON d.rn = g.rn + 1
            ),
            packs AS (
              SELECT pack_no, COUNT(*)::INT AS n_docs, SUM(n)::BIGINT AS n_tokens
              FROM g GROUP BY pack_no
            )
            SELECT g.pack_no::BIGINT AS pack_id, g.doc_id,
                   p.n_docs, p.n_tokens,
                   (p.n_docs = 1 AND p.n_tokens > 64) AS oversize
            FROM g JOIN packs p USING (pack_no)
            ORDER BY g.doc_id
        """,
        "bloom_semi_join": """
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d
            WHERE d.doc_id IN (SELECT doc_id FROM documents WHERE n_chars > 500)
        """,
        "bloom_anti_join": """
            SELECT d.doc_id, d.lang
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM documents WHERE n_chars > 500)
        """,
        "bloom_left_join": """
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_custkey, c.c_name
            FROM orders o
            LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 7 = 0) c
              ON o.o_custkey = c.c_custkey
        """,
        "bloom_right_join": """
            SELECT l.l_orderkey, l.l_partkey, l.l_quantity, p.p_partkey, p.p_name
            FROM lineitem l
            RIGHT JOIN (SELECT p_partkey, p_name FROM part WHERE p_partkey % 10 = 0) p
              ON l.l_partkey = p.p_partkey
        """,
        "bloom_full_join": """
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_custkey, c.c_name
            FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                  WHERE o_orderkey % 3 = 0) o
            FULL JOIN (SELECT c_custkey, c_name FROM customer
                       WHERE c_custkey % 7 = 0) c
              ON o.o_custkey = c.c_custkey
        """,
        "bloom_composite_key_join": """
            SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_extendedprice, p.pk, p.sk
            FROM lineitem l
            JOIN (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
                  FROM lineitem WHERE l_quantity > 45) p
              ON l.l_partkey = p.pk AND l.l_suppkey = p.sk
        """,
        "hll_distinct_docid": """
            SELECT count(DISTINCT doc_id) AS exact_distinct, TRUE AS within_bound
            FROM documents
        """,
        "hll_distinct_partkey": """
            SELECT count(DISTINCT l_partkey) AS exact_distinct, TRUE AS within_bound
            FROM lineitem
        """,
        "cms_partkey_freq": """
            SELECT l_partkey, count(*) AS exact_cnt, TRUE AS within_bound
            FROM lineitem WHERE l_partkey % 100 = 0
            GROUP BY l_partkey
        """,
        "tdigest_quantiles_price": """
            SELECT q, TRUE AS within_bound
            FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) AS t(q)
        """,
        "kll_quantiles_nchars": """
            SELECT q, TRUE AS within_bound
            FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) AS t(q)
        """,
        "bloom_fpr_check": """
            SELECT TRUE AS fpr_within_target, 0 AS false_negatives
        """,
        "join_size_estimate": """
            SELECT COUNT(*)::BIGINT AS exact_rows,
                   TRUE AS est_ge_exact, TRUE AS est_within_bound
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        """,
        "exact_dedup_union": """
            WITH u AS (
              SELECT doc_id, text, source FROM documents
              UNION ALL
              SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), text, source
              FROM documents WHERE doc_id % 5 = 0
            ),
            k AS (
              SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS doc_id
              FROM u GROUP BY 1
            )
            SELECT u.doc_id, u.source FROM u JOIN k USING (doc_id)
        """,
        "incremental_dedup_docs": """
            WITH history AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
            ),
            batch AS (
              SELECT doc_id, text, source FROM documents WHERE doc_id % 10 = 0
              UNION ALL
              SELECT doc_id + 2000000, text, source
              FROM documents WHERE doc_id % 10 = 1
              UNION ALL
              SELECT doc_id + 3000000, text, source
              FROM documents
              WHERE doc_id = (SELECT min(doc_id) FROM documents
                              WHERE doc_id % 10 = 0)
            ),
            reps AS (
              SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS doc_id
              FROM batch GROUP BY 1
            ),
            hfp AS (
              SELECT DISTINCT md5(lower(trim(text))) AS fp FROM history
            ),
            kept AS (
              SELECT r.doc_id FROM reps r
              LEFT JOIN hfp h USING (fp) WHERE h.fp IS NULL
            )
            SELECT b.doc_id, b.source FROM batch b JOIN kept USING (doc_id)
        """,
        "minhash_dedup_planted": """
            SELECT count(*) AS planted, 1 AS all_found, TRUE AS all_verified
            FROM documents WHERE doc_id % 5 = 0
        """,
        "text_stats": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                   length(text) AS n_chars_measured,
                   (CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\\s+')) END
                    + length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))
                    + len(list_filter(string_split_regex(text, '[^0-9]+'),
                                      x -> len(x) > 0))
                   )::INTEGER AS n_tokens_bpe_ish
            FROM documents
        """,
        "lang_id": """
            WITH h AS (
              SELECT doc_id,
                toks AS t,
                len(list_filter(toks, x -> list_contains(['the','and','of','to','is'], x))) AS he,
                len(list_filter(toks, x -> list_contains(['der','die','und','das','ist'], x))) AS hd,
                len(list_filter(toks, x -> list_contains(['le','la','et','les','est'], x))) AS hf,
                len(list_filter(toks, x -> list_contains(['el','la','los','es','una'], x))) AS hs,
                len(list_filter(toks, x -> list_contains(['的','是','了','在','我'], x))) AS hz
              FROM (SELECT doc_id,
                           string_split_regex(lower(trim(text)), '\\s+') AS toks
                    FROM documents)
            )
            SELECT doc_id,
                   CASE WHEN greatest(he,hd,hf,hs,hz) = 0 THEN 'und'
                        WHEN he = greatest(he,hd,hf,hs,hz) THEN 'en'
                        WHEN hd = greatest(he,hd,hf,hs,hz) THEN 'de'
                        WHEN hf = greatest(he,hd,hf,hs,hz) THEN 'fr'
                        WHEN hs = greatest(he,hd,hf,hs,hz) THEN 'es'
                        ELSE 'zh' END AS lang_pred
            FROM h
        """,
        "fingerprints": """
            SELECT doc_id, md5(lower(trim(text))) AS content_fp FROM documents
        """,
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS qid, embedding AS qv FROM embeddings
              WHERE vec_id % 200 = 0
            ),
            s AS (
              SELECT q.qid AS query_id, e.vec_id,
                     round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                  q.qv::DOUBLE[]), 6) AS sim
              FROM embeddings e CROSS JOIN q
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY sim DESC, vec_id
              )::INTEGER AS rank FROM s
            )
            SELECT query_id, vec_id, rank, sim FROM r WHERE rank <= 10
        """,
        "embedding_near_dup_planted": """
            SELECT count(*) AS planted, 1 AS all_found
            FROM embeddings WHERE vec_id % 50 = 0
        """,
        "salted_join_counts": """
            SELECT d.source, count(*) AS n, max(g.src_total) AS src_total
            FROM documents d
            JOIN (SELECT source, count(*) AS src_total
                  FROM documents GROUP BY source) g USING (source)
            GROUP BY d.source
        """,
        "sessionize_events": """
            WITH lagged AS (
              SELECT user_id, ts, event_id, epoch_us(ts) AS us,
                     LAG(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events),
            seq AS (
              SELECT user_id, ts, us,
                     SUM(CASE WHEN prev IS NULL OR us - prev > 1800000000
                              THEN 1 ELSE 0 END) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sseq
              FROM lagged)
            SELECT user_id, CAST(sseq AS BIGINT) AS session_id_seq,
                   count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end,
                   (max(us) - min(us)) / 1000000.0 AS duration_sec
            FROM seq GROUP BY user_id, sseq
        """,
        "zorder_scan_events": """
            SELECT event_id, user_id, ts, event_type, value
            FROM events
            WHERE user_id % 10 = 3 AND value > 5.0
        """,
        "sample_exact_k_docs": """
            SELECT doc_id, source FROM documents
            WHERE doc_id IS NOT NULL
            ORDER BY md5('' || CAST(doc_id AS VARCHAR))
            LIMIT 500
        """,
        "dedup_lines_docs": """
            WITH l AS (
              SELECT doc_id, str_split(text, ' ') AS ls FROM documents
            ),
            pos AS (
              SELECT doc_id, i, ls[i] AS tok,
                     list_position(ls, ls[i]) AS fi
              FROM l, UNNEST(generate_series(1, len(ls))) t(i)
            ),
            kept AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean,
                     count(*) AS c
              FROM pos WHERE fi = i GROUP BY doc_id
            )
            SELECT l.doc_id,
                   (len(l.ls) - kept.c)::BIGINT AS n_removed,
                   kept.clean AS clean_text
            FROM l JOIN kept USING (doc_id)
        """,
        "topk_per_group_docs": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id DESC) AS rn
              FROM documents
              WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
            ) WHERE rn <= 7
        """,
        "weighted_sample_docs": """
            SELECT doc_id, source FROM documents
            WHERE doc_id IS NOT NULL
              AND n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0
            ORDER BY -ln(
                (CAST(CAST('0x' || substr(md5('' || CAST(doc_id AS VARCHAR)), 1, 13)
                           AS BIGINT) AS DOUBLE) + 1.0)
                / (16.0 ** 13)
              ) / CAST(n_chars AS DOUBLE)
            LIMIT 100
        """,
        "session_stream_events": """
            WITH lagged AS (
              SELECT user_id, ts, event_id, epoch_us(ts) AS us,
                     LAG(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events),
            seq AS (
              SELECT user_id, us,
                     SUM(CASE WHEN prev IS NULL OR us - prev > 1800000000
                              THEN 1 ELSE 0 END) OVER
                       (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sseq
              FROM lagged)
            SELECT user_id, min(us) AS start_us, max(us) AS end_us,
                   count(*) AS n_events
            FROM seq GROUP BY user_id, sseq
        """,
        "asof_join_events": """
            SELECT p.event_id, p.user_id, p.ts, p.value,
                   e.ts AS ts_err, e.value AS value_err
            FROM (SELECT event_id, user_id, ts, value FROM events
                  WHERE event_type <> 'error') p
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'error') e
              ON p.user_id = e.user_id AND p.ts >= e.ts
        """,
        "multimodal_meta": """
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   octet_length(encode(text))::INTEGER AS n_bytes
            FROM documents
        """,
        "streaming_windowed_counts": """
            SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS window_epoch,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "streaming_bloom_join": """
            SELECT 'u7' AS seg, count(*) AS n_joined,
                   count(DISTINCT user_id) AS n_users
            FROM events WHERE user_id % 7 = 0
        """,
        "hll_distinct_by_source": """
            SELECT source, count(DISTINCT doc_id) AS exact_distinct,
                   count(*) AS n_rows, TRUE AS within_bound
            FROM documents GROUP BY source
        """,
        "grouped_median_nchars": """
            SELECT source, count(*)::BIGINT AS n_rows,
                   TRUE AS within_bound, TRUE AS rows_exact
            FROM documents GROUP BY source ORDER BY source
        """,
        "sketch_store_incremental": """
            SELECT source, count(DISTINCT doc_id) AS exact_distinct,
                   count(*) AS n_rows, TRUE AS rows_accounted,
                   TRUE AS matches_oneshot, TRUE AS within_bound
            FROM documents GROUP BY source
        """,
        "sketch_store_stream_docs": """
            SELECT source, count(DISTINCT doc_id) AS exact_distinct,
                   count(*) AS n_rows, TRUE AS rows_accounted,
                   TRUE AS within_bound
            FROM documents GROUP BY source
        """,
        "stateful_hll_stream": """
            SELECT event_type, count(*) AS n_rows, TRUE AS within_bound
            FROM events GROUP BY event_type
        """,
        "topk_stream_events": """
            WITH c AS (
              SELECT event_type, user_id, COUNT(*)::BIGINT AS count_est
              FROM events GROUP BY event_type, user_id
            ),
            r AS (
              SELECT event_type, user_id AS item, count_est,
                     ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY count_est DESC, user_id ASC
                     )::INT AS rank
              FROM c
            )
            SELECT event_type, item, count_est, 0::BIGINT AS error, rank
            FROM r WHERE rank <= 5 ORDER BY event_type, rank
        """,
        "source_overlap_matrix_docs": r"""
            WITH raw AS (
              SELECT source,
                     unnest(regexp_split_to_array(lower(text), '\s+')) AS w
              FROM documents WHERE source IN ('src0', 'src1', 'src2')
            ),
            wn AS (SELECT DISTINCT source, w FROM raw WHERE w <> '')
            SELECT a.source AS group_a, b.source AS group_b,
                   count(*) AS exact_intersection, TRUE AS within_bound
            FROM wn a JOIN wn b ON a.w = b.w AND a.source < b.source
            GROUP BY 1, 2
        """,
        "fd_embeddings": """
            SELECT 'exact' AS mode, COUNT(*)::BIGINT AS n_rows,
                   MAX(len(embedding))::INT AS dim,
                   TRUE AS is_exact, TRUE AS gram_matches_exact,
                   TRUE AS psd_holds, TRUE AS bound_holds,
                   TRUE AS fro_matches
            FROM embeddings
            UNION ALL
            SELECT 'sketched', COUNT(*)::BIGINT,
                   MAX(len(embedding))::INT,
                   FALSE, FALSE, TRUE, TRUE, TRUE
            FROM embeddings
            ORDER BY mode
        """,
        "fd_mass_by_label": """
            SELECT label, COUNT(*)::BIGINT AS n_rows,
                   TRUE AS mass_matches_exact
            FROM embeddings GROUP BY label ORDER BY label
        """,
        "pca_project_embeddings": """
            SELECT COUNT(*)::BIGINT AS n_rows, 8 AS k,
                   TRUE AS proj_matches_exact, TRUE AS width_ok
            FROM embeddings
        """,
        "theta_source_overlap": r"""
            SELECT
              count(*) FILTER (WHERE in_a AND in_b) AS exact_overlap,
              count(*) FILTER (WHERE in_a AND NOT in_b) AS exact_only_a,
              count(*) AS exact_union,
              TRUE AS overlap_within_bound,
              TRUE AS diff_within_bound,
              TRUE AS union_within_bound
            FROM (
              SELECT w,
                     bool_or(source = 'src0') AS in_a,
                     bool_or(source = 'src1') AS in_b
              FROM (
                SELECT source,
                       unnest(regexp_split_to_array(lower(text), '\s+')) AS w
                FROM documents WHERE source IN ('src0', 'src1')
              )
              WHERE w <> ''
              GROUP BY w
            )
        """,
        "ngram_jaccard_docs": r"""
            WITH sub AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
            ),
            mx AS (SELECT max(doc_id) + 1 AS o FROM documents),
            u AS (
              SELECT doc_id, text FROM sub
              UNION ALL
              SELECT doc_id + (SELECT o FROM mx),
                     text || ' tail appended words for jaccard test'
              FROM sub WHERE doc_id % 30 = 0
            ),
            w AS (
              SELECT doc_id, lower(trim(text)) AS lt,
                     string_split_regex(lower(trim(text)), '\s+') AS w
              FROM u
            ),
            -- chr(31) separator keeps the 3-gram string domain disjoint
            -- from the short-doc whole-text fallback (Spark separates the
            -- domains by hashing structure)
            g AS (
              SELECT doc_id,
                     CASE WHEN len(w) >= 3
                          THEN list_distinct(list_transform(
                                 generate_series(1, len(w) - 2),
                                 i -> array_to_string(w[i:i+2], chr(31))))
                          ELSE [lt] END AS gs
              FROM w
            ),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gs AS ga, b.gs AS gb
              FROM g a JOIN g b ON a.doc_id < b.doc_id
            ),
            j AS (
              SELECT id_a, id_b,
                     round(len(list_intersect(ga, gb))::DOUBLE
                           / (len(ga) + len(gb) - len(list_intersect(ga, gb))),
                           6) AS jaccard
              FROM p
            )
            SELECT id_a, id_b, jaccard FROM j
            WHERE jaccard >= 0.6 ORDER BY id_a, id_b
        """,
        "grouped_topk_lineitem": """
            WITH c AS (
              SELECT l_returnflag, l_partkey, COUNT(*)::BIGINT AS count_est
              FROM lineitem GROUP BY l_returnflag, l_partkey
            ),
            r AS (
              SELECT l_returnflag, l_partkey AS item, count_est,
                     ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY count_est DESC, l_partkey ASC
                     )::INT AS rank
              FROM c
            )
            SELECT l_returnflag, item, count_est, 0::BIGINT AS error, rank
            FROM r WHERE rank <= 10 ORDER BY l_returnflag, rank
        """,
        "grouped_topk_weighted": """
            WITH c AS (
              SELECT l_returnflag, l_partkey,
                     SUM(l_quantity)::BIGINT AS count_est
              FROM lineitem GROUP BY l_returnflag, l_partkey
            ),
            r AS (
              SELECT l_returnflag, l_partkey AS item, count_est,
                     ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY count_est DESC, l_partkey ASC
                     )::INT AS rank
              FROM c
            )
            SELECT l_returnflag, item, count_est, 0::BIGINT AS error, rank
            FROM r WHERE rank <= 10 ORDER BY l_returnflag, rank
        """,
        "lsh_plan_report": r"""
            WITH b AS (
              SELECT i::INT AS bands, (128 // i)::INT AS rows
              FROM generate_series(1, 128) t(i)
            ),
            s AS (
              SELECT (j + 0.5) / 1000.0 AS s FROM generate_series(0, 999) t(j)
            ),
            p AS (
              SELECT b.bands, b.rows, s.s,
                     1.0 - pow(1.0 - pow(s.s, b.rows), b.bands) AS p
              FROM b, s
            )
            SELECT bands, rows,
                   round(sum(CASE WHEN s < 0.8 THEN p ELSE 0 END) / 1000.0, 4)
                     AS fp_area,
                   round(sum(CASE WHEN s >= 0.8 THEN 1.0 - p ELSE 0 END)
                         / 1000.0, 4) AS fn_area
            FROM p GROUP BY bands, rows ORDER BY bands
        """,
        "containment_docs": r"""
            WITH w0 AS (
              SELECT doc_id, text,
                     string_split_regex(lower(trim(text)), '\s+') AS w
              FROM documents
            ),
            base AS (
              SELECT doc_id, text FROM w0
              WHERE doc_id % 4 = 0 AND len(w) >= 12
            ),
            mx AS (SELECT max(doc_id) + 1 AS o FROM documents),
            u AS (
              SELECT doc_id, text FROM base
              UNION ALL
              SELECT doc_id + (SELECT o FROM mx),
                     array_to_string(
                       (string_split_regex(lower(trim(text)), '\s+'))[3:10],
                       ' ')
              FROM base WHERE doc_id % 20 = 0
            ),
            w AS (
              SELECT doc_id, lower(trim(text)) AS lt,
                     string_split_regex(lower(trim(text)), '\s+') AS w
              FROM u
            ),
            -- same 3-gram domain construction as ngram_jaccard_docs
            g AS (
              SELECT doc_id,
                     CASE WHEN len(w) >= 3
                          THEN list_distinct(list_transform(
                                 generate_series(1, len(w) - 2),
                                 i -> array_to_string(w[i:i+2], chr(31))))
                          ELSE [lt] END AS gs
              FROM w
            ),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gs AS ga, b.gs AS gb
              FROM g a JOIN g b ON a.doc_id != b.doc_id
            ),
            c AS (
              SELECT id_a, id_b,
                     round(len(list_intersect(ga, gb))::DOUBLE / len(ga), 6)
                       AS containment,
                     len(ga) AS len_a, len(gb) AS len_b
              FROM p
            )
            SELECT id_a, id_b, containment, len_a, len_b FROM c
            WHERE containment >= 0.9 ORDER BY id_a, id_b
        """,
        "minhash_full_dedup": """
            SELECT doc_id, source FROM documents
        """,
        "simhash_planted": """
            SELECT count(*) AS planted, TRUE AS all_found
            FROM documents WHERE doc_id % 5 = 0
        """,
        "ann_lsh_recall": """
            SELECT TRUE AS recall_at_least_half
        """,
        "ann_ivf_recall": """
            SELECT TRUE AS recall_at_least_half, TRUE AS full_probe_exact
        """,
        "ann_pq_recall": """
            SELECT TRUE AS recall_at_least_half, TRUE AS full_shortlist_exact
        """,
        "ann_ivf_pq_recall": """
            SELECT TRUE AS recall_at_least_half, TRUE AS full_probe_exact
        """,
        "ann_ivf_partitioned_recall": """
            SELECT TRUE AS recall_at_least_half, TRUE AS full_probe_exact
        """,
        "hash_keys_cross_type": """
            SELECT CAST(0 AS BIGINT) AS mismatches,
                   COUNT(*) AS n_keys FROM part
        """,
        "simhash_capped_bucket": """
            SELECT TRUE AS planted_found, TRUE AS bucket_dropped
        """,
        "winnowing_planted": """
            SELECT count(*) AS planted, TRUE AS all_paired,
                   TRUE AS all_identical_fps
            FROM documents WHERE doc_id % 5 = 0
        """,
        "cms_event_type_freq": """
            SELECT event_type, count(*) AS exact_cnt, TRUE AS within_bound
            FROM events GROUP BY event_type
        """,
        # F0 queries: inputs are synthesized deterministically (counter-based
        # splitmix64 datagen — identical on every machine/partitioning), so
        # the oracle pins the exact deterministic values.
        "bloom_join_tokens_f0": """
            SELECT 618 AS exact_rows, TRUE AS rows_and_token_arrays_identical
        """,
        "hll_distinct_tokens_f0": """
            SELECT TRUE AS hll_within_bound
        """,
        "cms_hot_tokens_f0": """
            SELECT TRUE AS cms_within_bound
        """,
        "topk_hot_tokens_f0": """
            SELECT TRUE AS top10_all_monitored, TRUE AS bounds_hold
        """,
        "salted_source_join_f0": """
            SELECT TRUE AS salted_equals_plain
        """,
        "bloom_params_report": """
            SELECT 16777216 AS m_bits, 12 AS k, 2097152 AS size_bytes,
                   TRUE AS target_met
        """,
        "token_profile_f0": """
            SELECT 809271 AS exact_total_tokens, TRUE AS total_exact,
                   TRUE AS hll_within_bound, TRUE AS cms_within_bound,
                   TRUE AS quantiles_monotone
        """,
        "bucketed_join_orders": """
            SELECT c.c_mktsegment,
                   COUNT(*)::BIGINT AS n_orders,
                   COUNT(DISTINCT c.c_custkey)::BIGINT AS n_custs,
                   SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))::BIGINT
                     AS sum_cents
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment
        """,
        "shuffled_ids_docs": """
            SELECT doc_id,
                   (ROW_NUMBER() OVER (
                        ORDER BY md5('epoch0' || doc_id::VARCHAR)
                    ) - 1)::BIGINT AS shuffle_rank
            FROM documents
        """,
        "contiguous_ids_docs": """
            SELECT doc_id, source,
                   (ROW_NUMBER() OVER (ORDER BY doc_id) - 1)::BIGINT
                     AS seq_id,
                   ((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 100)::BIGINT
                     AS shard_id
            FROM documents
        """,
        "range_scan_events": """
            SELECT event_type,
                   COUNT(*)::BIGINT AS n_events,
                   MIN(user_id)::BIGINT AS min_user,
                   MAX(user_id)::BIGINT AS max_user,
                   SUM(CAST(ROUND(value * 1000, 0) AS BIGINT))::BIGINT
                     AS sum_value_milli
            FROM events
            WHERE user_id BETWEEN 100 AND 500
            GROUP BY event_type
        """,
        "partitioned_scan_events": """
            SELECT event_type,
                   COUNT(*)::BIGINT AS n_events,
                   COUNT(DISTINCT user_id)::BIGINT AS n_users,
                   ROUND(AVG(value), 6) AS avg_value
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY event_type
        """,
        "bloom_index_lookup_docs": """
            SELECT doc_id, source, n_chars
            FROM documents
            WHERE n_chars % 97 = 0
        """,
    }
