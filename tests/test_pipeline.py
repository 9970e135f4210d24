"""prepare_corpus composition tests: the cross-stage column contracts
the per-operator suites cannot see (VERDICT r4 task #1) — stage order,
in-place text threading, split-aware packing, config validation."""

import pytest
from pyspark.sql import functions as F

from bloomjoin_spark import prepare_corpus

# 5 words: shorter than the decontam n=6 window, so the only shared
# word runs between distinct docs stay below gram length
FOOTER = "shared footer line every page"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# a permissive quality config: only the rules under test bite
LENIENT = {
    "min_words": 3,
    "min_mean_word_len": 0.0,
    "max_mean_word_len": 1000.0,
    "max_dup_word_frac": 1.0,
    "min_alpha_word_frac": 0.0,
    "min_distinct_stopwords": 0,
}


def test_full_chain_stages_schema_and_packs(spark):
    rows = [
        (i, "web" if i % 2 else "books",
         f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i}\n{FOOTER}")
        for i in range(40)
    ]
    # planted exact dup (same text, higher id) + whitespace variant
    rows.append((1000, "web", rows[0][2]))
    rows.append((1001, "web", rows[1][2].replace(" ", "  ")))
    df = _docs(spark, rows)
    bench = _docs(spark, [(9000, "bench", rows[2][2])])

    res = prepare_corpus(
        df,
        minhash={"n": 3, "num_perm": 32, "bands": 8, "threshold": 1.0},
        bench=bench,
        decontam={"n": 6},
        boilerplate_min_docs=2,
        quality=LENIENT,
        scrub=True,
        mixture={"rates": {"web": 1.0, "books": 1.0}},
        split={"fractions": {"train": 1.0}},
        pack={"max_tokens": 16},
    )
    assert res.stages == (
        "exact_dedup", "minhash_dedup", "decontaminate",
        "remove_boilerplate_lines", "quality_filter", "scrub_patterns",
        "weighted_mixture", "hash_split", "pack_sequences",
    )
    # schema contract: input columns preserved in order, + split label
    assert res.docs.columns == ["doc_id", "source", "text", "split"]

    out = {r["doc_id"]: r for r in res.docs.collect()}
    assert 1000 not in out          # exact dup removed (stage 1)
    assert 1001 not in out          # whitespace variant removed (stage 2)
    assert 2 not in out             # bench-contaminated doc removed (stage 3)
    assert 0 in out and 1 in out    # originals survive dedup stages
    # boilerplate footer stripped from every surviving text (stage 4)
    assert all(FOOTER not in r["text"] for r in out.values())
    assert all(r["split"] == "train" for r in out.values())

    # pack stage: every surviving doc packed exactly once, none invented
    packed_ids = sorted(
        i for r in res.packs.select("doc_ids").collect() for i in r["doc_ids"]
    )
    assert packed_ids == sorted(out)


def test_boilerplate_runs_before_quality(spark):
    """A doc whose word count clears min_words only BECAUSE of its
    boilerplate footer must be dropped: quality judges the cleaned
    text (quality after boilerplate), not the raw text."""
    rows = [
        (1, "web", f"tiny doc\n{FOOTER}"),             # 2 own words
        (2, "web", f"plenty of body words here now\n{FOOTER}"),
        (3, "web", f"another long enough body text\n{FOOTER}"),
    ]
    res = prepare_corpus(
        _docs(spark, rows),
        boilerplate_min_docs=2,
        quality=LENIENT,  # min_words=3
    )
    kept = {r["doc_id"] for r in res.docs.collect()}
    assert kept == {2, 3}  # doc 1 had 8 raw words but only 2 real ones


def test_quality_runs_before_scrub(spark):
    """A doc whose mean word length fails only on the RAW url span must
    be dropped: quality sees the original text (quality before scrub),
    even though the mask would have passed."""
    url = "https://averyveryverylong.example.com/path/goes/on"
    rows = [
        (1, "web", f"{url} a b"),                 # raw mean ~17 chars/word
        (2, "web", "short words only here okay"),
    ]
    quality = dict(LENIENT, max_mean_word_len=12.0)
    res = prepare_corpus(_docs(spark, rows), quality=quality, scrub=True)
    out = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    assert set(out) == {2}
    # and the survivor's text is post-scrub (no-op here, but in place)
    assert out[2] == "short words only here okay"


def test_scrub_masks_surviving_text_in_place(spark):
    rows = [(1, "web", "reach me at someone@example.com for details")]
    res = prepare_corpus(_docs(spark, rows), dedup_exact=False, scrub=True)
    [r] = res.docs.collect()
    assert "<EMAIL>" in r["text"] and "@example.com" not in r["text"]
    # lean pipeline default: no count columns
    assert res.docs.columns == ["doc_id", "source", "text"]


def test_pack_never_mixes_splits(spark):
    """Packs are built over ONE split label (default train) — doc ids
    from other splits must not appear in any pack."""
    rows = [(i, "web", f"word{i} alpha beta gamma") for i in range(200)]
    res = prepare_corpus(
        _docs(spark, rows),
        split={"fractions": {"train": 0.5, "val": 0.5}},
        pack={"max_tokens": 16},
    )
    train_ids = {
        r["doc_id"] for r in res.docs.where(F.col("split") == "train").collect()
    }
    val_ids = {
        r["doc_id"] for r in res.docs.where(F.col("split") == "val").collect()
    }
    assert train_ids and val_ids  # both sides populated at n=200
    packed = {
        i for r in res.packs.select("doc_ids").collect() for i in r["doc_ids"]
    }
    assert packed == train_ids
    assert not (packed & val_ids)


def test_pack_all_docs_without_split(spark):
    rows = [(i, "web", f"some words here number {i}") for i in range(10)]
    res = prepare_corpus(_docs(spark, rows), pack={"max_tokens": 8})
    packed = {
        i for r in res.packs.select("doc_ids").collect() for i in r["doc_ids"]
    }
    assert packed == set(range(10))
    assert res.stages == ("exact_dedup", "pack_sequences")


def test_config_validation(spark):
    df = _docs(spark, [(1, "web", "x")])
    with pytest.raises(ValueError, match="without a bench"):
        prepare_corpus(df, decontam={"n": 6})
    with pytest.raises(ValueError, match="requires 'rates'"):
        prepare_corpus(df, mixture={"stratum_col": "source"})
    with pytest.raises(ValueError, match="requires 'fractions'"):
        prepare_corpus(df, split={"salt": "x"})
    with pytest.raises(ValueError, match="requires 'max_tokens'"):
        prepare_corpus(df, pack={"count_col": "n"})
    with pytest.raises(ValueError, match="use_split needs the split stage"):
        prepare_corpus(df, pack={"max_tokens": 8, "use_split": "train"})
    with pytest.raises(TypeError, match="quality config"):
        prepare_corpus(df, quality=3)
    # lazy contract: none of the successful configs above ran a job,
    # and a full no-op call returns the input frame untouched
    res = prepare_corpus(df, dedup_exact=False)
    assert res.stages == ()
    assert res.docs is df and res.packs is None


def test_config_validation_round5_review(spark):
    """Round-5 review findings: silent-wrong and opaque-error configs
    must raise curated errors instead."""
    df = _docs(spark, [(1, "web", "x")])
    # a use_split label absent from the fractions would pack ZERO docs
    with pytest.raises(ValueError, match="not one of the split labels"):
        prepare_corpus(
            df,
            split={"fractions": {"training": 0.9, "holdout": 0.1}},
            pack={"max_tokens": 8},
        )
    # redundant bench token selectors must not leak into decontaminate()
    with pytest.raises(ValueError, match="both 'bench_tokens' and"):
        prepare_corpus(
            df, bench=df,
            decontam={"bench_tokens": F.col("text"), "bench_text_col": "text"},
        )
    # Mapping-only configs get the curated message, not dict(True)'s
    for cfg_kw in ({"mixture": True}, {"split": True}, {"pack": True}):
        with pytest.raises(TypeError, match="must be a mapping"):
            prepare_corpus(df, **cfg_kw)
    # an explicit use_split matching a real label still works (and an
    # explicit non-default label is honored)
    rows = [(i, "web", f"some words here number {i}") for i in range(20)]
    res = prepare_corpus(
        _docs(spark, rows),
        split={"fractions": {"training": 0.5, "holdout": 0.5}, "salt": "s"},
        pack={"max_tokens": 8, "use_split": "holdout"},
    )
    labels = {r["split"] for r in res.docs.select("split").distinct().collect()}
    packed = {
        i for r in res.packs.select("doc_ids").collect() for i in r["doc_ids"]
    }
    holdout = {
        r["doc_id"] for r in res.docs.where("split = 'holdout'").collect()
    }
    assert labels <= {"training", "holdout"}
    assert packed == holdout and packed


def test_jaccard_stage_in_pipeline(spark):
    """Round 5: the exact Jaccard tier slots between minhash and
    decontam; with jaccard enabled, near-dups above its threshold
    cannot survive the pipeline."""
    # per-doc-unique tokens so base docs share no shingles with each
    # other — only with their planted tail variants
    rows = [
        (i, "web", " ".join(f"d{i}tok{j}" for j in range(40)))
        for i in range(20)
    ]
    rows += [(100 + i, "web", t + " small tail") for i, (_, _, t) in
             zip(range(20), rows) if i % 4 == 0]
    df = _docs(spark, rows)
    res = prepare_corpus(df, jaccard={"threshold": 0.6, "max_shingle_df": None})
    assert res.stages == ("exact_dedup", "ngram_jaccard_dedup")
    ids = sorted(r.doc_id for r in res.docs.collect())
    assert all(i < 100 for i in ids) and len(ids) == 20


def test_pipeline_reports_expose_observability(spark):
    """Round 5: warnings are not the only observability channel — the
    near-dup tiers' bucket-cap stats and the decontam engine report
    surface on PreparedCorpus.reports."""
    rows = [
        (i, "web", " ".join(f"d{i}tok{j}" for j in range(40)))
        for i in range(12)
    ]
    df = _docs(spark, rows)
    bench = df.where("doc_id = 0")
    res = prepare_corpus(
        df,
        minhash={"n": 3, "num_perm": 32, "bands": 4, "threshold": 0.9},
        jaccard={"threshold": 0.9},
        bench=bench,
        decontam={"n": 6},
    )
    assert set(res.reports) == {
        "minhash_dedup", "ngram_jaccard_dedup", "decontaminate",
    }
    # no degenerate buckets in this tiny unique corpus
    assert res.reports["minhash_dedup"].get("dropped_buckets", 0) == 0
    assert res.reports["ngram_jaccard_dedup"].get("dropped_buckets", 0) == 0
    dc = res.reports["decontaminate"]
    assert dc.engine in ("native", "bloom", "none")
    # the observability contract: the fallback-reason field EXISTS
    assert hasattr(dc, "engine_fallback_reason")
    # the bench doc itself was decontaminated away
    ids = {r.doc_id for r in res.docs.collect()}
    assert 0 not in ids and 1 in ids


def test_embedding_stage_in_pipeline(spark):
    """Round 5: the semantic tier runs on a vector column carried on
    the docs frame, after the text tiers, with its drop stats on
    reports."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for i in range(12):
        v = rng.normal(size=8)
        v /= np.linalg.norm(v)
        rows.append((i, "web", f"unique text number {i} with words",
                     [float(x) for x in v]))
        if i % 3 == 0:  # semantic dup with DIFFERENT text
            w = v + rng.normal(scale=1e-4, size=8)
            w /= np.linalg.norm(w)
            rows.append((100 + i, "web",
                         f"totally different phrasing for {i}",
                         [float(x) for x in w]))
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, embedding array<float>"
    )
    res = prepare_corpus(df, embedding={"threshold": 0.999})
    assert res.stages == ("exact_dedup", "embedding_dedup")
    ids = sorted(r.doc_id for r in res.docs.collect())
    assert all(i < 100 for i in ids) and len(ids) == 12
    assert res.reports["embedding_dedup"].get("dropped_buckets", 0) == 0
    with pytest.raises(ValueError, match="requires 'threshold'"):
        prepare_corpus(df, embedding={"vec_col": "embedding"})


def test_pipeline_round5_second_review(spark):
    """Second review pass: reserved decontam key and frozen-dataclass
    hashability."""
    df = _docs(spark, [(1, "web", "some words here now")])
    with pytest.raises(ValueError, match="may not set 'return_report'"):
        prepare_corpus(df, bench=df, decontam={"return_report": True})
    # reports (a dict field) must not poison the frozen dataclass hash
    res = prepare_corpus(df, dedup_exact=False)
    assert isinstance(hash(res), int)
    assert {res}  # usable as a set member


def test_simhash_stage_in_pipeline(spark):
    rows = [(i, "web", f"distinct body text {i} with several words") for i in range(8)]
    rows += [(100 + i, "web", t) for i, _, t in rows if i % 2 == 0]
    df = _docs(spark, rows)
    res = prepare_corpus(df, dedup_exact=False, simhash=True)
    assert res.stages == ("simhash_dedup",)
    ids = sorted(r.doc_id for r in res.docs.collect())
    assert all(i < 100 for i in ids) and len(ids) == 8
    assert "simhash_dedup" in res.reports


def test_history_stage_runs_first_and_drops_prior_content(spark):
    from bloomjoin_spark.operators import build_history_filter

    history = _docs(spark, [
        (1, "s0", "previously ingested document alpha beta gamma"),
        (2, "s0", "previously ingested document delta epsilon zeta"),
    ])
    batch = _docs(spark, [
        (10, "s0", "a genuinely new document with fresh words here"),
        (11, "s0", "previously ingested document alpha beta gamma"),  # in history
        (12, "s0", "a genuinely new document with fresh words here"),  # within dup
    ])
    res = prepare_corpus(batch, history=history)
    assert res.stages[0] == "incremental_dedup"
    kept = sorted(r["doc_id"] for r in res.docs.select("doc_id").collect())
    assert kept == [10]
    # prebuilt filter path threads through history_dedup kwargs
    bf = build_history_filter(history)
    res2 = prepare_corpus(
        batch, history=history, history_dedup={"history_filter": bf}
    )
    assert sorted(r["doc_id"] for r in res2.docs.select("doc_id").collect()) == [10]


def test_history_dedup_kwargs_require_history(spark):
    batch = _docs(spark, [(1, "s0", "some text here")])
    with pytest.raises(ValueError, match="history"):
        prepare_corpus(batch, history_dedup={"fpp": 1e-3})


def test_line_dedup_stage_runs_before_boilerplate(spark):
    # doc 1 repeats the footer INTERNALLY twice; with only 2 docs and
    # min_docs=2, the footer is boilerplate across docs.  line_dedup
    # must collapse the internal repeat first (stage order), then
    # boilerplate removes the surviving copy from both docs.
    rows = [
        (1, "web", f"{FOOTER}\nunique one two three\n{FOOTER}"),
        (2, "web", f"other body words here\n{FOOTER}"),
    ]
    df = _docs(spark, rows)
    res = prepare_corpus(
        df, dedup_exact=False, line_dedup=True, boilerplate_min_docs=2
    )
    assert res.stages == ("dedup_lines_within", "remove_boilerplate_lines")
    got = {r.doc_id: r.text for r in res.docs.collect()}
    assert got[1] == "unique one two three" and got[2] == "other body words here"
    # count column is dropped by default, kept on request under the name
    assert "_n_removed_lines" not in res.docs.columns
    res2 = prepare_corpus(
        df, dedup_exact=False, line_dedup={"count_col": "n_line_dups"}
    )
    assert {r.doc_id: r.n_line_dups for r in res2.docs.collect()} == {1: 1, 2: 0}


def test_quota_stage_caps_per_group(spark):
    rows = [
        (i, "web" if i < 20 else "books",
         f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
        for i in range(25)
    ]
    df = _docs(spark, rows)
    # ranked quota: top 3 per source by doc_id
    res = prepare_corpus(
        df, dedup_exact=False,
        quota={"group_cols": "source", "k": 3, "order_col": "doc_id"},
    )
    assert res.stages == ("group_quota",)
    got = {r.doc_id for r in res.docs.collect()}
    assert got == {17, 18, 19, 22, 23, 24}
    # random quota: deterministic, exactly 3 per source, salt changes it
    r1 = prepare_corpus(
        df, dedup_exact=False, quota={"group_cols": "source", "k": 3},
    ).docs
    r2 = prepare_corpus(
        df, dedup_exact=False, quota={"group_cols": "source", "k": 3},
    ).docs
    ids1 = sorted(r.doc_id for r in r1.collect())
    assert ids1 == sorted(r.doc_id for r in r2.collect())
    counts = {r.source: r.c for r in
              r1.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts == {"web": 3, "books": 3}
    r3 = prepare_corpus(
        df, dedup_exact=False,
        quota={"group_cols": "source", "k": 3, "salt": "v2"},
    ).docs
    assert sorted(r.doc_id for r in r3.collect()) != ids1
    # the temp rank column never leaks
    assert "_es_rank" not in r1.columns


def test_quota_config_validation(spark):
    df = _docs(spark, [(1, "web", "a b c d e")])
    with pytest.raises(ValueError, match="requires 'k'"):
        prepare_corpus(df, quota={"group_cols": "source"})
    with pytest.raises(ValueError, match="group_cols"):
        prepare_corpus(df, quota={"k": 3})
    with pytest.raises(ValueError, match="salt.*only applies"):
        prepare_corpus(df, quota={
            "group_cols": "source", "k": 1, "order_col": "doc_id",
            "salt": "x"})
    with pytest.raises(ValueError, match="descending.*requires"):
        prepare_corpus(df, quota={
            "group_cols": "source", "k": 1, "descending": False})


def test_encode_stage_tokenizes_and_packs_ids(spark):
    from pyspark.sql import functions as F

    rows = [(i, "web", f"alpha beta gamma doc{i}") for i in range(20)]
    docs = _docs(spark, rows)
    res = prepare_corpus(
        docs,
        dedup_exact=False,
        split={"fractions": {"train": 1.0}},
        encode={"min_count": 2},
        pack={"max_tokens": 8},
    )
    assert res.stages == ("hash_split", "encode_documents", "pack_sequences")
    # split label rides through the encode; text is consumed
    assert set(res.docs.columns) == {"doc_id", "source", "split", "tokens", "n_tok"}
    assert res.vocab is not None
    vocab = {r["word"]: r["token_id"] for r in res.vocab.collect()}
    assert set(vocab) == {"alpha", "beta", "gamma"}  # doc{i} are count-1
    enc = {r["doc_id"]: r["tokens"] for r in res.docs.collect()}
    assert len(enc) == 20
    assert enc[3] == [vocab["alpha"], vocab["beta"], vocab["gamma"], 0]
    # packs carry concatenated token ids, conserving every token
    total_packed = res.packs.agg(F.sum("n_tokens")).first()[0]
    total_docs = res.docs.agg(F.sum("n_tok")).first()[0]
    assert total_packed == total_docs == 80
    assert res.packs.agg(F.max("n_tokens")).first()[0] <= 8
    first_pack_tokens = res.packs.select("tokens").first()[0]
    assert all(isinstance(t, int) for t in first_pack_tokens)


def test_encode_stage_reuses_passed_vocab(spark):
    from bloomjoin_spark.operators import build_vocab

    day1 = _docs(spark, [(1, "web", "aa bb aa"), (2, "web", "aa cc")])
    vocab = build_vocab(day1, min_count=1)
    day2 = _docs(spark, [(3, "web", "aa dd")])
    res = prepare_corpus(day2, dedup_exact=False, encode={"vocab": vocab})
    row = res.docs.first()
    v = {r["word"]: r["token_id"] for r in vocab.collect()}
    assert row["tokens"] == [v["aa"], 0]  # dd is OOV under day1's vocab
    assert res.vocab is vocab


def test_encode_config_validation(spark):
    from bloomjoin_spark.operators import build_vocab

    docs = _docs(spark, [(1, "web", "a b c")])
    with pytest.raises(ValueError, match="vocab"):
        prepare_corpus(
            docs,
            encode={"vocab": build_vocab(docs), "min_count": 2},
        )


def test_containment_stage_in_pipeline(spark):
    """Round 5: the asymmetric containment tier slots after the exact
    Jaccard tier; planted excerpts (contained in a larger page, near-
    zero symmetric Jaccard) drop while every page survives."""
    rows = [
        (i, "web", " ".join(f"c{i}tok{j}" for j in range(30)))
        for i in range(15)
    ]
    # excerpts: 10-word slices of every 3rd page — Jaccard vs the page
    # ≈ 8/28 < 0.3, containment = 1.0
    rows += [
        (100 + i, "web", " ".join(t.split()[5:15]))
        for i, (_, _, t) in zip(range(15), rows) if i % 3 == 0
    ]
    df = _docs(spark, rows)
    res = prepare_corpus(
        df,
        jaccard={"threshold": 0.8, "max_shingle_df": None},
        containment={"threshold": 0.9, "max_shingle_df": None},
    )
    assert res.stages == (
        "exact_dedup", "ngram_jaccard_dedup", "containment_dedup"
    )
    assert "containment_dedup" in res.reports
    ids = sorted(r.doc_id for r in res.docs.collect())
    assert all(i < 100 for i in ids) and len(ids) == 15


def test_bench_mapping_runs_multi_suite_decontam(spark):
    """Round 5: bench= accepts a dict of eval suites — one corpus scan,
    drop-if-hit-ANY, per-suite counts on the stage report."""
    rows = [
        (1, "web", "alpha beta gamma delta epsilon zeta"),
        (2, "web", "one two three four five six"),
        (3, "web", "clean words only here nothing shared"),
    ]
    df = _docs(spark, rows)
    benches = {
        "suite_a": df.where(F.col("doc_id") == 1).select("text"),
        "suite_b": df.where(F.col("doc_id") == 2).select("text"),
    }
    res = prepare_corpus(df, bench=benches, decontam={"n": 3})
    assert "decontaminate" in res.stages
    assert sorted(r.doc_id for r in res.docs.collect()) == [3]
    rep = res.reports["decontaminate"]
    assert any("suite_a" in s for s in rep.notes)
    assert any("suite_b" in s for s in rep.notes)
