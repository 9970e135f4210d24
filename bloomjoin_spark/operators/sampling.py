"""Deterministic dataset splitting and sequence packing — the two
pipeline steps between "corpus is clean" and "batches hit the trainer".

Both are designed for the 100 TB shape:

- ``hash_split`` is one stateless whole-stage-codegen expression per
  row (md5 prefix bucketing): no shuffle, no sampling state, stable
  under re-runs/backfills, and a row's split NEVER changes when the
  corpus grows — the property random `randomSplit` cannot give you
  (its assignment depends on partition layout and seed plumbing).
- ``pack_sequences`` is a single partition-local pass (``mapInArrow``
  with carry state across batches): packing is a bin-packing problem
  that does not need global optimality — per-partition greedy fill to
  ``max_tokens`` is what production training pipelines do, because a
  global pack would serialize the corpus through one node for ~1%
  better fill.

No counterpart in the reference (scope: its Bloom prefilter); these
extend the training-pipeline operator set (SURVEY.md §2 extras).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex digits of the md5 used as the split bucket — 4 digits = 65536
#: buckets, so requested fractions are honored to ±1/65536 exactly.
_SPLIT_HEX_DIGITS = 4
_SPLIT_BUCKETS = 16 ** _SPLIT_HEX_DIGITS


def _threshold_str(rate: float) -> str:
    """Lexicographic threshold string for ``bucket < threshold``.
    Buckets are fixed-width hex; a rate of 1.0 must keep EVERY bucket,
    and the naive ``format(65536, '04x')`` = '10000' is five chars and
    sorts BELOW 'ffff' — so any rate rounding to the full bucket count
    returns 'g', which every hex digit precedes.

    Rounding is HALF-UP (``int(x + 0.5)``), not Python's banker's
    ``round``: SQL engines round half away from zero, so half-up is
    what an oracle recomputing ``round(rate * 65536)`` reproduces
    bit-for-bit (rates are non-negative here, where the two agree)."""
    b = min(_SPLIT_BUCKETS, int(rate * _SPLIT_BUCKETS + 0.5))
    if b >= _SPLIT_BUCKETS:
        return "g"
    return format(b, f"0{_SPLIT_HEX_DIGITS}x")


def hash_split_col(
    key: Column,
    fractions: dict[str, float],
    salt: str = "",
) -> Column:
    """Split-label Column for a key expression: the first 4 hex digits
    of ``md5(key || '|' || salt)`` select a bucket in [0, 65536), and
    cumulative-fraction thresholds map buckets to labels.  Hex strings
    compare lexicographically in bucket order, so the whole expression
    is a CASE over string comparisons — portable to ANY engine with
    md5 (the DuckDB oracle replicates it verbatim), deterministic
    across runs/partitionings/engine versions, and stable per key as
    the corpus grows.  Change ``salt`` to draw an independent split."""
    if not fractions:
        raise ValueError("fractions must be a non-empty {label: fraction} dict")
    total = sum(fractions.values())
    if not (0.999 <= total <= 1.001):
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = _bucket_col(key, salt)
    labels = list(fractions)
    cum = 0.0
    expr = None
    for label in labels[:-1]:
        cum += fractions[label]
        threshold = _threshold_str(cum)
        cond = h < F.lit(threshold)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    last = F.lit(labels[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split by key hash: adds ``out_col``
    with the label from ``fractions`` (e.g. ``{"train": .9, "val": .05,
    "test": .05}``).  Same key → same split, forever — including across
    engines (see ``hash_split_col``) — which is what makes held-out
    sets leak-proof under incremental ingestion.  Rows with a NULL key
    land in the LAST label (the residual bucket), deterministically."""
    return df.withColumn(out_col, hash_split_col(F.col(key_col), fractions, salt))


def _bucket_col(key: Column, salt: str) -> Column:
    """The shared md5-prefix bucket string in [0000, ffff] — or the
    sentinel 'zzzz' for a NULL key, which sorts ABOVE every hex bucket
    and above the full-rate threshold 'g'.  Consequences, identical to
    the DuckDB oracle's NULL semantics (md5(NULL) → NULL → CASE ELSE /
    WHERE drops): ``hash_split`` routes null keys to the LAST label
    (the residual bucket) regardless of salt; ``hash_sample`` and
    ``weighted_mixture`` always DROP null-key rows.  Without the
    sentinel, ``concat_ws`` silently skips the NULL and the bucket
    degenerates to md5(salt) — an arbitrary salt-dependent label."""
    bucket = F.substring(
        F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt))), 1,
        _SPLIT_HEX_DIGITS,
    )
    return F.when(key.isNull(), F.lit("z" * _SPLIT_HEX_DIGITS)).otherwise(bucket)


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sample by key: keep a row iff its md5
    bucket falls under ``fraction`` (honored to ±1/65536).  Same
    portable-SQL rule as ``hash_split`` — the sample is reproducible
    across engines and STABLE under corpus growth (a kept key stays
    kept), which `df.sample()` cannot promise.  NULL keys are always
    dropped (SQL WHERE semantics — see ``_bucket_col``).  Change
    ``salt`` for an independent draw."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = _threshold_str(fraction)
    return df.filter(_bucket_col(F.col(key_col), salt) < F.lit(threshold))


def weighted_mixture(
    df: DataFrame,
    key_col: str,
    rates: dict[str, float],
    stratum_col: str = "source",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Training-mix composition: keep each row with its STRATUM's
    sampling rate (e.g. ``{"web": 0.1, "books": 1.0, "code": 0.5}``),
    decided by the same deterministic md5 bucket as ``hash_split`` —
    so the mixture is reproducible, engine-portable, and stable as
    sources grow.  Strata missing from ``rates`` use ``default_rate``
    (0 = drop); NULL keys are always dropped (SQL WHERE semantics —
    see ``_bucket_col``).  One stateless expression per row: no
    shuffle, no sampling state, composes with any downstream plan."""
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    bucket = _bucket_col(F.col(key_col), salt)

    expr = None
    for stratum, rate in rates.items():
        cond = F.col(stratum_col) == F.lit(stratum)
        lim = F.lit(_threshold_str(rate))
        expr = F.when(cond, lim) if expr is None else expr.when(cond, lim)
    limit = F.lit(_threshold_str(default_rate)) if expr is None else expr.otherwise(
        F.lit(_threshold_str(default_rate))
    )
    return df.filter(bucket < limit)


def split_sizes(df: DataFrame, key_col: str, fractions: dict[str, float],
                salt: str = "") -> DataFrame:
    """Per-split row counts (one aggregation) — the quick calibration
    check that the md5 buckets honor the requested fractions."""
    return (
        hash_split(df, key_col, fractions, salt)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("split")
    )


def _list_offsets_i32(lens, what: str):
    """Arrow ListArray offsets from per-list lengths — accumulated in
    int64 and bound-checked before the int32 cast (ADVICE r4: cumsum
    straight into an int32 buffer wraps silently past 2^31 total
    elements, yielding corrupt/negative list offsets instead of an
    error).  Spark's Arrow bridge speaks 32-bit list offsets, so the
    honest failure mode is a loud error telling the caller to shrink
    the Arrow batch."""
    import numpy as np

    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    if len(offs) > 1 and offs[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            f"pack_sequences: one Arrow output batch holds {offs[-1]} "
            f"total {what} elements, past the 2^31-1 limit of Spark's "
            "32-bit Arrow list offsets — lower "
            "spark.sql.execution.arrow.maxRecordsPerBatch so fewer "
            "packs close per batch"
        )
    return offs.astype(np.int32)


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    count_col: str | None = None,
    tokens_col: str | None = None,
    text_col: str | None = None,
) -> DataFrame:
    """Greedy partition-local packing of documents into training
    sequences of at most ``max_tokens`` tokens.

    Exactly one token-source must be given:

    - ``count_col`` — precomputed per-doc token count (cheapest);
    - ``tokens_col`` — an ``array<int>`` token-id column: output packs
      also carry the concatenated ``tokens`` array (Arrow list
      buffers concatenated via numpy, no per-token Python);
    - ``text_col`` — whitespace tokenization (``token_count_col``'s
      rule, matching the text_stats oracle) counted JVM-side first.

    Output: one row per pack — ``pack_id`` (globally unique:
    partition_id * 2^40 + local index), ``doc_ids`` array, ``n_docs``,
    ``n_tokens``, ``oversize`` (true for a single document that alone
    exceeds ``max_tokens``: it becomes its own pack, untruncated —
    truncation policy belongs to the trainer, not the packer), plus
    ``tokens`` when ``tokens_col`` was given.

    Packing is greedy in partition order: a document that would
    overflow the open pack closes it.  Fill efficiency is bounded below
    by 50% for docs ≤ max_tokens and in practice is ~90%+ when
    max_tokens ≫ median doc length; the operator is ONE scan with no
    shuffle and no driver state — at 100 TB each executor packs its
    partitions independently, which is the standard production
    trade-off (a globally optimal pack would serialize the corpus).

    Vectorized: the greedy recurrence iterates per PACK, not per row —
    each pack boundary is one ``searchsorted`` into the batch's token
    cumsum, and doc ids / token ids move as numpy slice copies into
    ONE output RecordBatch per input batch (ListArray offsets built
    from the pack lengths).  Python-level work is O(packs), not
    O(rows)."""
    import numpy as np
    import pyarrow as pa
    from pyspark import TaskContext

    sources = [s for s in (count_col, tokens_col, text_col) if s is not None]
    if len(sources) != 1:
        raise ValueError("pass exactly one of count_col / tokens_col / text_col")
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")

    id_type = dict(df.dtypes).get(id_col, "").lower()
    if id_type not in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        raise ValueError(
            f"pack_sequences requires an integral id_col; {id_col!r} is "
            f"{id_type or 'missing'} — remap string/uuid ids to a dense "
            "integer id first (a silent cast would turn them into NULLs "
            "deep inside the executor)"
        )
    carry_tokens = tokens_col is not None
    idc = F.col(id_col).cast("long").alias("__id")
    if count_col is not None:
        keyed = df.select(idc, F.col(count_col).cast("long").alias("__n"))
    elif tokens_col is not None:
        keyed = df.select(idc, F.col(tokens_col).alias("__toks"),
                          F.size(F.col(tokens_col)).cast("long").alias("__n"))
    else:
        from .text import token_count_col

        keyed = df.select(idc, token_count_col(F.col(text_col)).cast("long").alias("__n"))

    out_fields = "pack_id bigint, doc_ids array<bigint>, n_docs int, " \
                 "n_tokens bigint, oversize boolean"
    if carry_tokens:
        out_fields += ", tokens array<int>"

    def pack_fn(it):
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        next_pack = int(np.int64(pid) << np.int64(40))
        # open (carried) pack: numpy slice chunks spanning batches
        open_id_chunks: list = []
        open_tok_chunks: list = []
        open_n = 0
        open_docs = 0

        def close_open():
            nonlocal open_id_chunks, open_tok_chunks, open_n, open_docs
            p = {"ids": open_id_chunks, "tok": open_tok_chunks,
                 "n": open_n, "docs": open_docs, "oversize": False}
            open_id_chunks, open_tok_chunks, open_n, open_docs = [], [], 0, 0
            return p

        def flush(closed):
            """ONE RecordBatch for every pack closed in this batch."""
            nonlocal next_pack
            m = len(closed)
            id_chunks = [c for p in closed for c in p["ids"]]
            flat_ids = (
                np.concatenate(id_chunks) if id_chunks
                else np.empty(0, dtype=np.int64)
            )
            lens = np.fromiter((p["docs"] for p in closed), np.int64, m)
            id_offs = _list_offsets_i32(lens, "doc_ids")
            cols = [
                pa.array(next_pack + np.arange(m, dtype=np.int64)),
                pa.ListArray.from_arrays(
                    pa.array(id_offs, pa.int32()), pa.array(flat_ids, pa.int64())
                ),
                pa.array(lens.astype(np.int32)),
                pa.array(np.fromiter((p["n"] for p in closed), np.int64, m)),
                pa.array(np.fromiter((p["oversize"] for p in closed), bool, m)),
            ]
            names = ["pack_id", "doc_ids", "n_docs", "n_tokens", "oversize"]
            if carry_tokens:
                tok_chunks = [c for p in closed for c in p["tok"]]
                flat_tok = (
                    np.concatenate(tok_chunks) if tok_chunks
                    else np.empty(0, dtype=np.int32)
                )
                tlens = np.fromiter(
                    (sum(len(c) for c in p["tok"]) for p in closed), np.int64, m
                )
                t_offs = _list_offsets_i32(tlens, "tokens")
                cols.append(pa.ListArray.from_arrays(
                    pa.array(t_offs, pa.int32()), pa.array(flat_tok, pa.int32())
                ))
                names.append("tokens")
            next_pack += m
            return pa.RecordBatch.from_arrays(cols, names=names)

        for batch in it:
            n_rows = batch.num_rows
            if n_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            if ids.dtype.kind != "i":
                raise ValueError(
                    "pack_sequences: id column contains NULLs — every "
                    "document needs a non-null integral id"
                )
            if carry_tokens:
                la = batch.column(1)
                # one zero-copy flatten per batch; per-pack runs are
                # contiguous numpy slices of it
                flat = la.flatten().to_numpy(zero_copy_only=False).astype(
                    np.int32, copy=False
                )
                offs = np.asarray(la.offsets, dtype=np.int64)
                offs = offs - offs[0]
                ns = batch.column(2).to_numpy(zero_copy_only=False)
            else:
                ns = batch.column(1).to_numpy(zero_copy_only=False)
            # NaN (null count) → 0; Spark size(NULL array) = -1 → 0
            if ns.dtype.kind == "f":
                ns = np.nan_to_num(ns, nan=0.0)
            ns = np.maximum(ns, 0).astype(np.int64)
            cum = np.cumsum(ns)
            closed: list = []
            i = 0
            while i < n_rows:
                base = int(cum[i - 1]) if i else 0
                budget = max_tokens - open_n
                # largest j: rows i..j-1 fit the open pack's budget
                j = int(np.searchsorted(cum, base + budget, side="right"))
                if j > i:
                    open_id_chunks.append(ids[i:j])
                    if carry_tokens:
                        open_tok_chunks.append(flat[offs[i] : offs[j]])
                    open_n += int(cum[j - 1]) - base
                    open_docs += j - i
                    i = j
                    if i < n_rows:  # next row doesn't fit → pack is full
                        closed.append(close_open())
                elif open_docs:
                    closed.append(close_open())  # retry row i, empty pack
                else:
                    # empty pack and row i alone exceeds max_tokens
                    closed.append({
                        "ids": [ids[i : i + 1]],
                        "tok": [flat[offs[i] : offs[i + 1]]] if carry_tokens else [],
                        "n": int(ns[i]), "docs": 1, "oversize": True,
                    })
                    i += 1
            if closed:
                yield flush(closed)
            if open_docs:
                # consolidate the carried pack into owned arrays: its
                # chunks are VIEWS into this batch's buffers, and a
                # view would pin the whole batch in memory until the
                # pack closes in some later batch
                open_id_chunks = [np.concatenate(open_id_chunks)]
                if open_tok_chunks:
                    open_tok_chunks = [np.concatenate(open_tok_chunks)]
        if open_docs:
            yield flush([close_open()])

    return keyed.mapInArrow(pack_fn, schema=out_fields)


def pack_stats(packs: DataFrame, max_tokens: int) -> DataFrame:
    """One-row packing summary (the invariants a training job asserts
    before trusting a packed corpus): pack count, docs, total tokens,
    max non-oversize pack size, bound/fill diagnostics."""
    return packs.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.coalesce(
            F.max(F.when(~F.col("oversize"), F.col("n_tokens"))), F.lit(0)
        ).cast("long").alias("max_regular_pack"),
        F.sum(F.when(F.col("oversize"), 1).otherwise(0)).cast("long").alias(
            "oversize_packs"
        ),
        F.coalesce(
            F.round(
                F.avg(F.when(~F.col("oversize"), F.col("n_tokens"))) / max_tokens, 4
            ),
            F.lit(0.0),
        ).alias("avg_fill_ratio"),
    )


def token_budget_mixture(
    df: DataFrame,
    key_col: str,
    budgets: dict[str, int],
    count_col: str = "n_tok",
    stratum_col: str = "source",
    keep_unbudgeted: bool = True,
    salt: str = "",
    return_rates: bool = False,
):
    """Training-mix composition by TOKEN BUDGET instead of rate: sample
    each stratum down to ≈``budgets[stratum]`` tokens by computing
    ``rate = min(1, budget / actual_tokens)`` from one per-stratum
    aggregation (strata are low-cardinality by definition — the
    collected totals are a handful of rows at any corpus size), then
    applying the same deterministic md5-bucket ``weighted_mixture``.

    Document-level Bernoulli: the kept token count is budget in
    EXPECTATION (each doc kept whole), not an exact cut — the right
    semantics for training mixes, where splitting documents to hit an
    exact budget would corrupt document boundaries.  Deterministic and
    engine-portable like every hash_split-family operator; strata
    without a budget are kept whole (``keep_unbudgeted=True``) or
    dropped.  ``return_rates=True`` also returns the
    ``{stratum: (actual_tokens, rate)}`` decision table."""
    for s, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {s!r} must be >= 0, got {b}")
    totals = {
        r[stratum_col]: r["__tbm_t"]
        for r in df.groupBy(stratum_col)
        .agg(F.sum(count_col).alias("__tbm_t"))
        .collect()
        if r[stratum_col] is not None
    }
    def _rate(s: str) -> float:
        if budgets[s] == 0:
            return 0.0  # explicit zero budget = drop the stratum
        t = totals.get(s)
        if not t:
            return 1.0  # stratum has no token mass: docs are free
        return min(1.0, budgets[s] / t)

    rates = {s: _rate(s) for s in budgets if s in totals}
    kept = weighted_mixture(
        df, key_col, rates, stratum_col=stratum_col,
        default_rate=1.0 if keep_unbudgeted else 0.0, salt=salt,
    )
    if return_rates:
        return kept, {s: (totals.get(s, 0), rates.get(s, 0.0)) for s in budgets}
    return kept


def repeat_mixture(
    df: DataFrame,
    key_col: str,
    rates: dict[str, float],
    stratum_col: str = "source",
    default_rate: float = 1.0,
    salt: str = "",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Training-mix composition with UPSAMPLING: each stratum's rate
    may exceed 1 and is realized as repeat counts — ``floor(rate)``
    full copies per document plus one extra copy for the keys whose
    md5 bucket falls under ``frac(rate)``, so the stratum's kept mass
    is ``rate`` in expectation and every copy carries a 0-based
    ``epoch_col`` index (salt ``deterministic_shuffle`` by it for a
    distinct training order per epoch).  ``rate=0.5`` degrades to
    exactly ``weighted_mixture``'s Bernoulli keep; ``default_rate=1``
    passes unlisted strata through as single copies.

    Same deterministic, engine-portable md5-bucket rule as the whole
    ``hash_split`` family — reproducible across engines and stable as
    sources grow.  One codegen expression + an explode; no shuffle.
    NULL-key rows get ``floor(rate)`` copies (the fractional coin is
    undecidable without a key — SQL comparison semantics drop them,
    matching the oracle); NULL strata use ``default_rate``."""
    for s, r in rates.items():
        if not (0 <= r < float("inf")):  # rejects negatives, NaN, inf
            raise ValueError(f"rate for {s!r} must be finite >= 0, got {r}")
    if not (0 <= default_rate < float("inf")):
        raise ValueError(
            f"default_rate must be finite >= 0, got {default_rate}"
        )
    if epoch_col in df.columns:
        raise ValueError(f"output column {epoch_col!r} already exists")
    bucket = _bucket_col(F.col(key_col), salt)

    def _parts(r: float) -> tuple[int, str]:
        full = int(r)
        return full, _threshold_str(r - full)

    n_expr, t_expr = None, None
    for stratum, rate in rates.items():
        cond = F.col(stratum_col) == F.lit(stratum)
        full, thr = _parts(rate)
        n_expr = (F.when(cond, full) if n_expr is None else n_expr.when(cond, full))
        t_expr = (F.when(cond, thr) if t_expr is None else t_expr.when(cond, thr))
    d_full, d_thr = _parts(default_rate)
    n_full = F.lit(d_full) if n_expr is None else n_expr.otherwise(F.lit(d_full))
    thr = F.lit(d_thr) if t_expr is None else t_expr.otherwise(F.lit(d_thr))
    copies = n_full + (bucket < thr).cast("int")
    seq = F.when(
        copies > 0, F.sequence(F.lit(0), copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return df.select("*", F.explode(seq).alias(epoch_col))


def temperature_mixture(
    df: DataFrame,
    key_col: str,
    alpha: float,
    total_budget: int | None = None,
    count_col: str = "n_tok",
    stratum_col: str = "source",
    salt: str = "",
    return_rates: bool = False,
    allow_upsampling: bool = False,
    epoch_col: str = "epoch",
):
    """Temperature-flattened training mix (the public multilingual-LM
    sampling rule — mBERT / XLM-R style): target each stratum's share
    of the kept mass at ``p_s ∝ t_s^alpha`` where ``t_s`` is the
    stratum's ``count_col`` total.  ``alpha=1`` keeps natural
    proportions, ``alpha→0`` flattens toward uniform-per-stratum,
    between values boost low-resource strata relative to their size.

    Default realization is DOWNSAMPLE-ONLY (document-level Bernoulli
    cannot replicate rows): with ``total_budget`` B the rate is
    ``min(1, B·p_s / t_s)``; without it, rates are max-normalized
    ``t_s^(alpha-1) / max_u t_u^(alpha-1)`` — the stratum the
    temperature favors most is kept whole and every other stratum is
    downsampled to sit at the target RATIO to it (the largest kept
    corpus with exact ``p_s`` proportions).

    ``allow_upsampling=True`` realizes rates ABOVE 1 as repeat counts
    via :func:`repeat_mixture` (the result gains ``epoch_col``): with
    a budget the rate is the uncapped ``B·p_s / t_s``; without one the
    kept TOTAL mass stays at the corpus total (``B = Σt`` — the
    constant-size temperature resample of the multilingual-LM
    papers).

    One per-stratum aggregate (a handful of driver-side rows at any
    corpus size, same bound as ``token_budget_mixture``), then the
    deterministic md5-bucket keep/repeat rule — engine-portable,
    growth-stable, no shuffle.  NULL-stratum and NULL-key rows are
    dropped in downsample mode (SQL WHERE semantics; see
    ``repeat_mixture`` for its NULL rules).  ``return_rates=True``
    also returns ``{stratum: (total, rate)}``."""
    if not (alpha >= 0.0):  # rejects negatives AND NaN
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if total_budget is not None and not (total_budget >= 0):
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    totals = {
        r[stratum_col]: float(r["__tm_t"]) if r["__tm_t"] is not None else 0.0
        for r in df.groupBy(stratum_col)
        .agg(F.sum(count_col).alias("__tm_t"))
        .collect()
        if r[stratum_col] is not None
    }
    # zero-mass strata are FREE (kept whole): they carry no tokens, so
    # they cannot distort the temperature proportions — the same rule
    # as token_budget_mixture, and what the SQL oracle computes (its
    # CASE t > 0 falls through to rate 1)
    pos = {s: t for s, t in totals.items() if t > 0}
    cap = (lambda r: r) if allow_upsampling else (lambda r: min(1.0, r))
    try:
        if not pos:
            rates: dict[str, float] = {}
        elif total_budget is None and not allow_upsampling:
            top = max(t ** (alpha - 1.0) for t in pos.values())
            rates = {s: cap((t ** (alpha - 1.0)) / top) for s, t in pos.items()}
        else:
            budget = float(total_budget) if total_budget is not None else sum(
                pos.values()
            )
            z = sum(t ** alpha for t in pos.values())
            rates = {
                s: cap(budget * (t ** alpha / z) / t) for s, t in pos.items()
            }
    except OverflowError as ex:
        raise ValueError(
            f"alpha={alpha} overflows the rate computation for these "
            "stratum totals"
        ) from ex
    rates.update({s: 1.0 for s, t in totals.items() if t <= 0})
    if allow_upsampling:
        kept = repeat_mixture(
            df, key_col, rates, stratum_col=stratum_col,
            default_rate=0.0, salt=salt, epoch_col=epoch_col,
        )
    else:
        kept = weighted_mixture(
            df, key_col, rates, stratum_col=stratum_col,
            default_rate=0.0, salt=salt,
        )
    if return_rates:
        return kept, {s: (totals[s], rates[s]) for s in totals}
    return kept


def assign_contiguous_ids(
    df: DataFrame,
    order_by: str | list[str],
    out_col: str = "seq_id",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Globally contiguous, gap-free int64 row ids in ``order_by``
    order — ``ROW_NUMBER() OVER (ORDER BY ...) - 1 + start`` semantics
    WITHOUT the single-partition exchange a global window plans (an
    un-partitioned window funnels the entire corpus through ONE task;
    at 100 TB that is the job).

    The scalable shape is sort + two passes:

    1. ``repartitionByRange`` (sampled boundaries, one shuffle) +
       ``sortWithinPartitions`` gives a global order across partitions;
       the layout is pinned with a lazy ``localCheckpoint`` so both
       passes see identical partitions.
    2. A partition-count aggregation collects ONE int per partition;
       the driver prefix-sums them into per-partition offsets (KB-scale
       at any corpus size).
    3. One ``mapInArrow`` pass adds ``offset[pid] + local_index`` —
       no further shuffle, no Python per-row work (ids are a numpy
       arange per batch).

    ``order_by`` should be a unique key (ties make the id assignment
    within the tie arbitrary, exactly as ROW_NUMBER's would be).
    Downstream: deterministic training shards are
    ``F.floor(F.col(out_col) / shard_size)``.

    No counterpart in the reference (scope: Bloom prefilter joins);
    extends the training-pipeline set — ids for packed sequences,
    sample manifests, resumable shard writing.
    """
    import numpy as np
    import pyarrow as pa

    keys = [order_by] if isinstance(order_by, str) else list(order_by)
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    if "_bj_pid" in df.columns:
        raise ValueError(
            "assign_contiguous_ids uses '_bj_pid' internally; rename the "
            "input column"
        )
    if num_partitions is not None:
        parts = num_partitions
    else:
        try:
            parts = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except ValueError:  # vendor-managed value, e.g. "auto"
            parts = df.sparkSession.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(parts, *[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .withColumn("_bj_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r["_bj_pid"]: r["n"]
        for r in sorted_df.groupBy("_bj_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    max_pid = max(counts, default=-1)
    offsets = []
    acc = int(start)
    for pid in range(max_pid + 1):
        offsets.append(acc)
        acc += counts.get(pid, 0)

    out_fields = [f for f in sorted_df.schema.fields if f.name != "_bj_pid"]
    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in out_fields) + f", `{out_col}` bigint"

    def _add_ids(batches):
        base = None
        seen = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if base is None:
                base = offsets[batch.column("_bj_pid")[0].as_py()]
            ids = pa.array(
                np.arange(base + seen, base + seen + batch.num_rows,
                          dtype=np.int64)
            )
            seen += batch.num_rows
            names = [n for n in batch.schema.names if n != "_bj_pid"]
            arrays = [batch.column(n) for n in names] + [ids]
            yield pa.RecordBatch.from_arrays(arrays, names + [out_col])

    return sorted_df.mapInArrow(_add_ids, out_schema)


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "",
    out_col: str = "shuffle_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Reproducible global random ordering — the training-order
    shuffle.  Rows are ranked by ``md5(salt || key)`` (the same
    engine-portable construction as ``hash_split``): one range-sort
    shuffle at any scale, no RNG state, the SAME order on every rerun
    and every engine, and a different-but-deterministic order per
    ``salt`` (use the epoch number).  The rank is materialized through
    :func:`assign_contiguous_ids`, so downstream shard assignment is
    ``floor(rank / shard_size)`` and a resumable reader can seek to an
    exact rank.  ``key_col`` must be unique (ties would make the order
    within the tie arbitrary)."""
    if "__ds_key" in df.columns:
        raise ValueError("reserved column __ds_key already exists")
    keyed = df.withColumn(
        "__ds_key",
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
    )
    out = assign_contiguous_ids(
        keyed, "__ds_key", out_col=out_col, num_partitions=num_partitions
    )
    return out.drop("__ds_key")


def sample_exact_k(
    df: DataFrame,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic EXACTLY-k global sample: the k rows whose
    ``md5(salt || key)`` ranks lowest.  Complements ``hash_sample``
    (Bernoulli: deterministic membership, binomial SIZE) when a job
    needs a fixed budget — eval sets, spot-check panels, pilot
    corpora.  Same engine-portable construction as ``hash_split``:
    reproducible across engines and reruns, a different independent
    draw per ``salt``, and NESTED — the k=1000 sample is a subset of
    the k=2000 sample (ranks only extend), the same growth-stability
    contract ``hash_sample`` gives fractions.

    Scale shape: ``orderBy(h).limit(k)`` plans as
    TakeOrderedAndProject — each partition keeps a size-k heap and the
    driver merges P·k CANDIDATE KEYS, never a global sort or full
    shuffle.  For k·P beyond driver comfort (k in the millions on 10^5
    partitions), pre-gate with ``hash_sample`` at a fraction a few
    sigma above k/N, then exact-k among survivors — same output,
    because the Bernoulli gate keeps every row the top-k rule keeps.

    ``key_col`` should be unique (md5 ties between distinct keys are
    2^-128 events; duplicate keys tie and make which copy wins
    arbitrary).  NULL keys are dropped (SQL semantics, as in
    ``hash_sample``)."""
    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return (
        df.filter(F.col(key_col).isNotNull())
        .orderBy(h.asc())
        .limit(k)
    )


def weighted_sample_exact_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted EXACTLY-k sample without replacement
    (Efraimidis–Spirakis A-ES, Inf. Process. Lett. 97(5), 2006): keep
    the k rows minimizing ``-ln(u) / w``, where ``u`` is the row's
    engine-portable md5 uniform and ``w`` its weight.  Every run — and
    every engine that implements md5/ln the same way — selects the
    SAME rows; inclusion probability scales with weight, which is the
    per-domain/per-quality budget rule production corpora use ("sample
    200k docs, proportional to quality score").

    The uniform is the first 13 hex digits of ``md5(salt || key)``
    (52 bits — exact in a double) scaled to (0,1]; the +1 in the
    numerator keeps u>0 so ln(u) is finite.  Like
    ``sample_exact_k``: a different ``salt`` is an independent draw,
    and the output is NESTED in k (ranks only extend).

    Scale shape: identical to ``sample_exact_k`` —
    ``orderBy(rank).limit(k)`` plans as TakeOrderedAndProject (size-k
    per-partition heaps, P·k candidates merged on the driver, no
    global sort).

    Rows with NULL keys, or NULL/non-positive weights, are dropped
    (a zero weight has zero inclusion probability; negative weights
    are undefined under A-ES).  ``key_col`` should be unique — see
    ``sample_exact_k``."""
    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    # (0,1]-uniform: 13 hex chars = 52 bits, exact in IEEE double both
    # here (conv → double) and in DuckDB (('0x'||…)::BIGINT::DOUBLE).
    u = (F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(16**13)
    )
    rank = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(
            F.col(key_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col).cast("double") > 0)
        )
        .orderBy(rank.asc())
        .limit(k)
    )


def topk_per_group(
    df: DataFrame,
    group_cols: str | list[str],
    order_col: str,
    k: int,
    id_col: str,
    descending: bool = True,
    salts: int = 32,
) -> DataFrame:
    """Per-group quota: keep at most ``k`` rows per group, the ones
    ranking highest (``descending=True``) or lowest on
    ``(order_col, id_col)``.  The domain-cap / source-cap primitive
    web corpora need ("at most 10k docs per domain, best quality
    first") — a rule a global sort cannot give you affordably and a
    plain window gives you at the price of one reducer per group.

    Scale shape — the full rows NEVER shuffle and no group ever lands
    on one task:

    1. **rank slice** — only ``(group, order, id)`` triples leave the
       scan.
    2. **salted phase 1** — ``groupBy(group, xxhash64(id) % salts)``
       collects and slices a size-k sorted list per cell, so a
       pathological group (one domain = 10% of the corpus) is spread
       over ``salts`` reduce cells instead of melting one task.
    3. **phase 2** — per group, merge the ≤ ``salts`` size-k lists
       (≤ ``salts·k`` structs per group move) and slice the final k.
    4. **fan back** — a LEFT SEMI join on ``id_col`` restores the
       original rows; the winner set is ≤ groups·k ids, which AQE
       broadcasts when small, so the corpus-side rows still never
       shuffle.

    Determinism: selection is by the lexicographic struct order of
    ``(order_col, id_col)`` — ties on ``order_col`` break by
    ``id_col`` in the SAME direction (largest id wins under
    ``descending=True``).  Rows with NULL ``order_col`` or NULL
    ``id_col`` are dropped from RANKING (never selected); ``id_col``
    MUST be row-unique or the semi-join fans a win out to every
    duplicate (same contract as ``remove_boilerplate_lines``)."""
    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    if k == 0:
        return df.limit(0)
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    if "_win_id" in df.columns:
        # the semi-join condition F.col(id_col) == F.col("_win_id")
        # would resolve ambiguously against a caller column of that
        # name — fail with the real cause (sibling contract:
        # spans._check_columns)
        raise ValueError("reserved column '_win_id' already exists on df")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    entry = F.struct(F.col(order_col).alias("o"), F.col(id_col).alias("i"))

    def _top(col: Column) -> Column:
        # ascending struct sort either way; "largest k" = the tail.
        # (a plain slice(-k) start would fall off the front of cells
        # holding fewer than k entries and return [] — clamp to 1.)
        s = F.sort_array(col)
        if not descending:
            return F.slice(s, 1, k)
        return F.slice(s, F.greatest(F.size(s) - F.lit(k) + 1, F.lit(1)), k)

    ranks = (
        df.select(*groups, entry.alias("_e"))
        .filter(F.col("_e.o").isNotNull() & F.col("_e.i").isNotNull())
        .groupBy(*groups, (F.pmod(F.xxhash64(F.col("_e.i")), F.lit(salts))).alias("_s"))
        .agg(_top(F.collect_list("_e")).alias("_t"))
        .groupBy(*groups)
        .agg(_top(F.flatten(F.collect_list("_t"))).alias("_t"))
        .select(F.explode("_t").alias("_e"))
        .select(F.col("_e.i").alias("_win_id"))
    )
    return df.join(ranks, on=F.col(id_col) == F.col("_win_id"), how="left_semi")


def sample_exact_k_per_group(
    df: DataFrame,
    group_cols: str | list[str],
    key_col: str,
    k: int,
    salt: str = "",
    salts: int = 32,
) -> DataFrame:
    """Deterministic EXACTLY-k sample PER GROUP (at most k where the
    group is smaller): ``sample_exact_k``'s md5-rank rule ranked within
    each group — "5k random docs per language", "k eval docs per
    source" — executed as ``topk_per_group`` over the portable rank,
    so it inherits the salted two-phase plan (rows never shuffle, hot
    groups never melt one reduce task) AND the engine-portable
    determinism/nesting/salt contract of the global sampler.

    NULL keys are dropped; ``key_col`` must be row-unique (both as the
    rank domain and as the semi-join fan-back key)."""
    if "_es_rank" in df.columns:
        # withColumn would silently REPLACE the caller's column and the
        # final drop would delete it from the result — refuse instead
        raise ValueError("reserved column '_es_rank' already exists on df")
    rank = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    tagged = df.withColumn("_es_rank", rank)
    out = topk_per_group(
        tagged, group_cols, "_es_rank", k, key_col,
        descending=False, salts=salts,
    )
    return out.drop("_es_rank")


def quantile_cutoffs(
    df: DataFrame,
    col: str,
    k: int,
    method: str = "exact",
    kll_k: int = 200,
) -> list[float]:
    """The ``k-1`` equi-depth cutoffs of ``df[col]`` at quantiles
    ``i/k`` (``i = 1..k-1``).

    ``method="exact"`` uses Spark's exact ``percentile`` aggregate
    (Hive rule: ``pos = p·(n-1)``, linear interpolation) — the
    engine-portable rule the DuckDB oracle recomputes value-for-value.
    Its per-partition buffer is a counts map over DISTINCT values, so
    it is exact-and-cheap for bounded domains (lengths, token counts)
    but not for continuous doubles at 100 TB.

    ``method="kll"`` is the declared scale path: one mergeable
    KLL-sketch build (``aggregate.build_sketch`` — Arrow partials,
    tree merge, published rank-error bound), constant memory per
    partition regardless of the value domain.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    ps = [i / k for i in range(1, k)]
    if method == "exact":
        row = df.agg(F.percentile(F.col(col), F.lit(ps)).alias("q")).first()
        return [float(v) for v in row["q"]]
    if method == "kll":
        from ..aggregate import build_sketch
        from ..sketches import KllSketch

        sk = build_sketch(df, lambda: KllSketch(kll_k), cols=col).sketch
        return [float(sk.quantile(p)) for p in ps]
    raise ValueError(f"method must be 'exact' or 'kll', got {method!r}")


def quantile_buckets(
    df: DataFrame,
    col: str,
    k: int | None = None,
    method: str = "exact",
    cutoffs: list[float] | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """Equi-depth bucket id per row: ``out_col`` = number of cutoffs
    strictly below ``col`` (0-based; ties land in the LOWER bucket;
    NULL values get a NULL bucket).  Curriculum binning, length-
    stratified mixtures, skew-aware salting all start here.

    Two jobs total: the cutoff aggregate (see
    :func:`quantile_cutoffs`), then ONE stateless codegen projection —
    the cutoff array is a ``k-1`` element literal, so assignment adds
    no shuffle and no Python.  Pass precomputed ``cutoffs`` to skip
    the first job entirely (e.g. bucket a 100 TB corpus by cutoffs
    measured on one day's partition).
    """
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    if cutoffs is None:
        if k is None:
            raise ValueError("pass k or precomputed cutoffs")
        cutoffs = quantile_cutoffs(df, col, k, method=method)
    arr = F.array(*[F.lit(float(c)) for c in cutoffs])
    v = F.col(col).cast("double")
    bucket = F.size(F.filter(arr, lambda c: v > c))
    return df.withColumn(
        out_col, F.when(v.isNotNull(), bucket).cast("int")
    )
