"""Text-analysis operator tests (documents table)."""

import pytest
from pyspark.sql import functions as F

from bloomjoin_spark.operators import (
    add_fingerprint,
    add_lang_id,
    add_text_stats,
    bpe_ish_token_count,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_text_stats_jvm_only(docs):
    st = add_text_stats(docs)
    plan = st._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # whole-stage codegen only
    row = st.agg(
        F.min("n_tokens"), F.max("quality_score"), F.min("quality_score")
    ).first()
    assert row[0] >= 1
    assert 0.0 <= row[2] <= row[1] <= 1.0


def test_text_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, ""), (3, "   "), (4, "xyz")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in add_text_stats(df).collect()}
    assert rows[1]["n_tokens"] == 5
    assert rows[1]["stopword_ratio"] == pytest.approx(3 / 5)
    assert rows[2]["n_tokens"] == 0 and rows[3]["n_tokens"] == 0
    assert rows[4]["n_tokens"] == 1 and rows[4]["stopword_ratio"] == 0.0


def test_lang_id_corpus_consistency(docs):
    # the synthetic corpus text is English-ish word soup regardless of
    # its lang LABEL (no textual signal), so the text-based heuristic
    # must consistently answer en/und — never a spurious third language
    pred = add_lang_id(docs)
    langs = {r["lang_pred"] for r in pred.select("lang_pred").distinct().collect()}
    assert langs <= {"en", "und"}


def test_lang_id_basic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is happy"),
            (2, "der hund und die katze das ist gut"),
            (3, "le chat et la souris est dans les champs"),
            (4, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["lang_pred"] for r in add_lang_id(df).collect()}
    assert rows[1] == "en" and rows[2] == "de" and rows[3] == "fr"
    assert rows[4] == "und"


def test_fingerprint_stable_and_canonical(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "  hello world  "), (3, "other")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in add_fingerprint(df).collect()}
    assert rows[1]["content_fp"] == rows[2]["content_fp"]
    assert rows[1]["fp64"] == rows[2]["fp64"]
    assert rows[1]["content_fp"] != rows[3]["content_fp"]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame(
        [(1, "hello world, 42 times!"), (2, "plain words only")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n_tokens_bpe_ish"] for r in bpe_ish_token_count(df).collect()}
    # words(4) + puncts(2: , !) + digit runs(1: 42)
    assert rows[1] == 7
    assert rows[2] == 3


def test_winnowing_fingerprints(spark):
    """MOSS-style winnowing: a document sharing a long substring with
    another shares ≥1 fingerprint; unrelated docs (different token
    vocab) share none; short docs get a whole-text fallback."""
    from bloomjoin_spark.operators import winnowing_fingerprints

    base = " ".join(f"alpha{i}" for i in range(60))
    overlapping = "intro words " + " ".join(f"alpha{i}" for i in range(25, 55)) + " outro"
    unrelated = " ".join(f"beta{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, overlapping), (3, unrelated), (4, "tiny doc")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: set(r["winnow_fps"]) for r in
            winnowing_fingerprints(docs).collect()}
    assert rows[1] & rows[2], "long shared substring must share a fingerprint"
    assert not (rows[1] & rows[3]), "disjoint vocab must not collide"
    assert len(rows[4]) == 1  # whole-text fallback
    # determinism
    again = {r["doc_id"]: set(r["winnow_fps"]) for r in
             winnowing_fingerprints(docs).collect()}
    assert again == rows


# ---------------------------------------------------------------------------
# Gopher-style repetition stats and quality rules
# ---------------------------------------------------------------------------

def _tdf(spark, rows):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id bigint, text string"
    )


def test_repetition_stats_word_level(spark):
    from bloomjoin_spark.operators import add_repetition_stats

    df = _tdf(spark, [(0, "a b a b c"), (1, "x y z"), (2, "   ")])
    out = {
        r["doc_id"]: r
        for r in add_repetition_stats(df).collect()
    }
    # doc0: 5 words, 3 distinct → dup_frac 0.4; chars 5, distinct chars 3 → 0.4
    assert out[0]["dup_word_frac"] == 0.4
    assert out[0]["dup_word_char_frac"] == 0.4
    assert out[1]["dup_word_frac"] == 0.0
    assert out[2]["dup_word_frac"] == 0.0  # blank → 0, not null


def test_repetition_stats_line_level(spark):
    from bloomjoin_spark.operators import add_repetition_stats

    df = _tdf(spark, [(0, "aa\nbb\naa"), (1, "only one line")])
    out = {r["doc_id"]: r for r in add_repetition_stats(df).collect()}
    assert round(out[0]["dup_line_frac"], 6) == round(1 / 3, 6)
    assert round(out[0]["dup_line_char_frac"], 6) == round(2 / 6, 6)
    assert out[1]["dup_line_frac"] == 0.0


def test_top_ngram_frac_exact(spark):
    from bloomjoin_spark.operators import top_ngram_frac

    # "a b" occurs 3× in 7 words; gram chars 2, total word chars 7
    df = _tdf(spark, [(0, "a b a b a b c")])
    r = top_ngram_frac(df, n=2).collect()[0]
    assert r["top_ngram_count"] == 3
    assert r["top_ngram_char_frac"] == round(3 * 2 / 7, 6)


def test_top_ngram_frac_tie_deterministic(spark):
    from bloomjoin_spark.operators import top_ngram_frac

    # two grams tie on count; ("bb","bb") has more chars → wins
    df = _tdf(spark, [(0, "a a x bb bb y a a z bb bb")])
    r = top_ngram_frac(df, n=2).collect()[0]
    assert r["top_ngram_count"] == 2
    assert r["top_ngram_char_frac"] == round(2 * 4 / 15, 6)


def test_top_ngram_frac_drops_short_docs(spark):
    from bloomjoin_spark.operators import top_ngram_frac

    df = _tdf(spark, [(0, "solo"), (1, "two words")])
    rows = {r["doc_id"] for r in top_ngram_frac(df, n=2).collect()}
    assert rows == {1}


def test_quality_rules_each_rule_trips(spark):
    from bloomjoin_spark.operators import add_quality_rules

    good = "the and " + " ".join(f"word{i}" for i in range(28))  # 30 words, low dup
    df = _tdf(
        spark,
        [
            (0, good),
            (1, "too short"),                      # word count
            (2, ("ab " * 50) + "the"),            # dup words (ab repeated)
            (3, ("123 456 " * 25) + "the"),       # alpha fraction
            (4, "zz yy xx ww vv uu tt ss rr qq " * 5),  # no stopwords
        ],
    )
    out = {r["doc_id"]: r for r in add_quality_rules(df, min_words=20).collect()}
    assert out[0]["passes_quality"]
    assert not out[1]["rule_word_count"]
    assert not out[2]["rule_dup_words"]
    assert not out[3]["rule_alpha_words"]
    assert not out[4]["rule_stopwords"]


def test_quality_filter_preserves_schema(spark):
    from bloomjoin_spark.operators import quality_filter

    good = "the and " + " ".join(f"word{i}" for i in range(28))
    df = _tdf(spark, [(0, good), (1, "nope")])
    kept = quality_filter(df, min_words=20)
    assert kept.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in kept.collect()] == [0]


def test_scrub_patterns_masks_and_counts(spark):
    from bloomjoin_spark.operators import scrub_patterns

    df = _tdf(
        spark,
        [
            (0, "mail a.b+c@ex-site.org and http://x.io/p?q=1 from 10.0.0.1"),
            (1, "nothing here"),
            (2, "two mails x@y.zz w@v.com"),
        ],
    )
    out = {r["doc_id"]: r for r in scrub_patterns(df).collect()}
    assert out[0]["text"] == "mail <EMAIL> and <URL> from <IP>"
    assert (out[0]["n_email"], out[0]["n_url"], out[0]["n_ipv4"]) == (1, 1, 1)
    assert out[1]["text"] == "nothing here" and out[1]["n_email"] == 0
    assert out[2]["n_email"] == 2 and out[2]["text"] == "two mails <EMAIL> <EMAIL>"


def test_scrub_patterns_out_col_and_no_counts(spark):
    from bloomjoin_spark.operators import scrub_patterns

    df = _tdf(spark, [(0, "x@y.zz")])
    out = scrub_patterns(df, out_col="clean", with_counts=False)
    assert set(out.columns) == {"doc_id", "text", "clean"}
    r = out.collect()[0]
    assert r["text"] == "x@y.zz" and r["clean"] == "<EMAIL>"


def test_scrub_patterns_stays_jvm(spark, sf_dir):
    from bloomjoin_spark.operators import scrub_patterns

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = scrub_patterns(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_chunk_words_exact_boundaries(spark):
    from bloomjoin_spark.operators import chunk_words

    df = _tdf(spark, [(0, "a b c d e f g"), (1, "x y"), (2, "   ")])
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_words"])
        for r in chunk_words(df, max_words=3).collect()
    )
    assert rows == [
        (0, 1, "a b c", 3),
        (0, 2, "d e f", 3),
        (0, 3, "g", 1),
        (1, 1, "x y", 2),
    ]  # blank doc produces no chunks


def test_chunk_words_overlap_and_conservation(spark):
    from bloomjoin_spark.operators import chunk_words

    df = _tdf(spark, [(0, " ".join(f"w{i}" for i in range(10)))])
    rows = sorted(
        (r["chunk_id"], r["chunk_text"]) for r in
        chunk_words(df, max_words=4, overlap=1).collect()
    )
    # stride 3: [0:4], [3:7], [6:10]
    assert rows == [
        (1, "w0 w1 w2 w3"),
        (2, "w3 w4 w5 w6"),
        (3, "w6 w7 w8 w9"),
    ]


def test_chunk_words_single_chunk_and_validation(spark):
    from bloomjoin_spark.operators import chunk_words

    df = _tdf(spark, [(0, "a b")])
    rows = chunk_words(df, max_words=10).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "a b"
    import pytest

    with pytest.raises(ValueError):
        chunk_words(df, max_words=0)
    with pytest.raises(ValueError):
        chunk_words(df, max_words=4, overlap=4)


def test_chunk_words_no_shuffle(spark, sf_dir):
    from bloomjoin_spark.operators import chunk_words

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = chunk_words(docs, 32)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_quality_filter_does_not_clobber_caller_rule_columns(spark):
    """A caller's own rule_*/passes_quality columns must ride through
    quality_filter untouched (the predicate is applied directly)."""
    from pyspark.sql import Row

    from bloomjoin_spark.operators import quality_filter

    good = "the and " + " ".join(f"word{i}" for i in range(28))
    df = spark.createDataFrame(
        [Row(doc_id=0, text=good, passes_quality="caller-owned")],
        "doc_id bigint, text string, passes_quality string",
    )
    out = quality_filter(df, min_words=20)
    assert out.columns == ["doc_id", "text", "passes_quality"]
    assert out.collect()[0]["passes_quality"] == "caller-owned"


class TestDedupLinesWithin:
    def test_first_occurrence_kept_in_order(self, spark):
        from bloomjoin_spark.operators.text import dedup_lines_within

        df = spark.createDataFrame(
            [(1, "a\nb\na\nc\nb\nd"), (2, "x"), (3, None), (4, ""),
             (5, "m\n\n\nm\nn")],
            "id int, text string",
        )
        got = {r.id: (r.text, r.n_removed_lines)
               for r in dedup_lines_within(df).collect()}
        assert got[1] == ("a\nb\nc\nd", 2)
        assert got[2] == ("x", 0)
        assert got[3] == (None, None)       # NULL text stays NULL
        assert got[4] == ("", 0)
        assert got[5] == ("m\n\nn", 2)      # blank-run collapses too

    def test_custom_sep_is_literal_not_regex(self, spark):
        from bloomjoin_spark.operators.text import dedup_lines_within

        # '|' and '.' are regex metachars; a raw split would explode
        # every character.  sep must behave as a literal.
        df = spark.createDataFrame([(1, "ab|cd|ab|ef")], "id int, text string")
        r = dedup_lines_within(df, sep="|").collect()[0]
        assert (r.text, r.n_removed_lines) == ("ab|cd|ef", 1)
        df2 = spark.createDataFrame([(1, "a.b.a")], "id int, text string")
        r2 = dedup_lines_within(df2, sep=".").collect()[0]
        assert (r2.text, r2.n_removed_lines) == ("a.b", 1)

    def test_out_col_preserves_original(self, spark):
        from bloomjoin_spark.operators.text import dedup_lines_within

        df = spark.createDataFrame([(1, "a a b")], "id int, text string")
        r = dedup_lines_within(df, sep=" ", out_col="clean").collect()[0]
        assert r.text == "a a b" and r.clean == "a b" and r.n_removed_lines == 1

    def test_matches_python_brute_force_on_corpus(self, spark, sf_dir):
        from bloomjoin_spark.operators.text import dedup_lines_within

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        got = dedup_lines_within(
            docs.select("doc_id", "text"), sep=" "
        ).collect()
        src = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
        for r in got:
            ls = src[r.doc_id].split(" ")
            seen: list[str] = []
            for x in ls:
                if x not in seen:
                    seen.append(x)
            assert r.text == " ".join(seen)
            assert r.n_removed_lines == len(ls) - len(seen)
