"""Vocabulary building and document encoding: the bridge from raw
``documents`` (doc_id, text, source) to the pre-tokenized training-
sequence shape every sketch operator in this library consumes —
``(doc_id, tokens:array<int>, n_tok:int, source)``.

A training pipeline ends with exactly this step: after dedup /
decontam / quality / mixture have decided WHICH text survives,
the survivors are tokenized into bounded integer ids so downstream
systems (packing, sharding, the token-table sketches) never touch
strings again.  Both halves are engine-portable rules a DuckDB oracle
recomputes value-for-value:

``build_vocab``
    word histogram (the library's canonical whitespace tokenization,
    :func:`~bloomjoin_spark.operators.text.words_col`) → frequency
    ranking → contiguous ids.  Rank rule is ``ROW_NUMBER() OVER
    (ORDER BY n DESC, word)`` — ties break lexicographically, so the
    vocabulary is a pure function of the corpus, reproducible across
    engines and reruns.  Id 0 is reserved for out-of-vocabulary.

``encode_documents``
    words → LEFT JOIN vocab → per-document ordered id arrays.

Scale shape (100 TB):

- The histogram is one explode inside the scan stage plus one
  partial-aggregated ``groupBy word`` — the only corpus-sized exchange
  in ``build_vocab``, and partial aggregation collapses each input
  partition to its distinct words before the shuffle.
- The contiguous ranking reuses
  :func:`~bloomjoin_spark.operators.sampling.assign_contiguous_ids`
  (range-sort + per-partition count collect + mapInArrow offset), so
  there is NO single-partition global window even when a word-level
  vocabulary runs to hundreds of millions of rows.
- ``encode_documents`` joins the exploded words against the vocabulary
  WITHOUT a forced broadcast (AQE picks broadcast while the vocab fits,
  shuffle-join when it has grown past that — the same deliberate choice
  as ``remove_boilerplate_lines`` and ``group_token_divergence``), then
  reassembles per document.  The reassembly exchange carries only
  ``(doc_id, pos, token_id)`` integer triples — the text itself never
  shuffles.

No counterpart in the reference (scope: Bloom prefilter joins); this
extends the training-pipeline operator set and produces the exact
input shape of the north-rule token table (doc_id, tokens, n_tok,
source).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import assign_contiguous_ids
from .text import words_col

__all__ = ["build_vocab", "encode_documents"]

#: the reserved out-of-vocabulary id; real ids start at 1
OOV_ID = 0


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_size: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Frequency-ranked vocabulary of ``df[text_col]``:
    ``(token_id:int64, word:string, n:int64)`` with contiguous ids
    starting at 1 (0 = :data:`OOV_ID`, reserved).

    Rank rule (engine-portable, oracle-recomputable):
    ``ROW_NUMBER() OVER (ORDER BY n DESC, word ASC)``.
    ``min_count`` drops rare words BEFORE ranking; ``max_size`` keeps
    the top ``max_size`` ranked words.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_size is not None and max_size < 1:
        raise ValueError(f"max_size must be >= 1, got {max_size}")
    hist = (
        df.select(F.explode(words_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        hist = hist.filter(F.col("n") >= min_count)
    # descending-frequency rank without a single-partition window:
    # sort key (-n, word) through the range-sort + offset pass.
    ranked = assign_contiguous_ids(
        hist.withColumn("_bj_neg_n", -F.col("n")),
        order_by=["_bj_neg_n", "word"],
        out_col="token_id",
        start=1,
        num_partitions=num_partitions,
    ).drop("_bj_neg_n")
    if max_size is not None:
        ranked = ranked.filter(F.col("token_id") <= max_size)
    return ranked.select("token_id", "word", "n")


def encode_documents(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] | list[str] = ("source",),
    out_col: str = "tokens",
    oov_id: int = OOV_ID,
    drop_oov: bool = False,
) -> DataFrame:
    """Encode each document's words as an ordered ``array<int>`` of
    vocabulary ids: ``(id_col, *carry_cols, tokens:array<int>,
    n_tok:int)`` — the pre-tokenized training-sequence shape.

    Words absent from ``vocab`` become ``oov_id`` (or are dropped with
    ``drop_oov=True``).  Documents with no words keep an empty array
    (rows are never dropped).  ``carry_cols`` must be functionally
    dependent on ``id_col`` (they ride through the per-document
    aggregate); ``id_col`` must be unique.
    """
    carry = list(carry_cols)
    for c in (out_col, "n_tok", "_bj_pos", "_bj_word", "_bj_tid"):
        if c in docs.columns and c not in (out_col, "n_tok"):
            raise ValueError(f"encode_documents uses {c!r} internally")
    if out_col in docs.columns or "n_tok" in docs.columns:
        raise ValueError(f"output column {out_col!r}/'n_tok' already exists")

    vmap = vocab.select(
        F.col("word").alias("_bj_word"),
        F.col("token_id").cast("int").alias("_bj_tid"),
    )
    exploded = docs.select(
        id_col,
        *carry,
        F.posexplode_outer(words_col(F.col(text_col))).alias(
            "_bj_pos", "_bj_word"
        ),
    )
    # LEFT JOIN keeps OOV words; AQE chooses broadcast vs shuffle from
    # the vocabulary's real size (never forced — word-level vocabularies
    # grow with the corpus).
    joined = exploded.join(vmap, on="_bj_word", how="left")
    tid = F.coalesce(F.col("_bj_tid"), F.lit(int(oov_id)).cast("int"))
    entry = F.struct(F.col("_bj_pos").alias("pos"), tid.alias("tid"))
    keep = F.col("_bj_pos").isNotNull()
    if drop_oov:
        keep = keep & F.col("_bj_tid").isNotNull()
    # collect_list skips NULL inputs, so empty documents (pos NULL from
    # posexplode_outer) and dropped OOV words contribute nothing.
    toks = F.transform(
        F.array_sort(F.collect_list(F.when(keep, entry))),
        lambda s: s["tid"],
    )
    return (
        joined.groupBy(id_col, *carry)
        .agg(toks.alias(out_col))
        .withColumn("n_tok", F.size(F.col(out_col)).cast("int"))
    )
