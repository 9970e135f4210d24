"""Temporal operators over event streams: sessionization and the
as-of (nearest-prior) join.

Both are workhorse event-analytics operators the reference's users
run around their joins (the reference itself is join-only —
``R/bloomjoin.R:62-124`` — these extend the engine the same way the
dedup/decontam family does) and both are pure whole-stage-codegen
window plans:

* ``sessionize`` — gap-based session ids.  ONE shuffle (hash on the
  entity key), then two window functions inside a single window
  spec: a LAG to flag gap-opening events and a running SUM to number
  sessions.  No Python, no second exchange — per-entity event counts
  are small, so the window never spills, and entity keys are
  high-cardinality, so the shuffle is skew-free at any corpus size.
* ``asof_join`` — for each left row, the single most recent right
  row at-or-before it (per key).  Implemented as the union+window
  plan: tag both sides, union them (co-partitioned by ONE hash
  exchange on the key), sort within partition by (ts, tag), and
  carry the right side's payload forward with
  ``last(..., ignorenulls=True)``.  This is the scalable shape — a
  range join would rewrite to an O(n·m) BroadcastNestedLoop per key,
  while the union plan is one exchange + one sort at any scale, and
  the right payload travels inline (no second join).  DuckDB's
  native ``ASOF JOIN`` is the value oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats", "asof_join"]


def _micros(df: DataFrame, ts_col: str) -> Column:
    """Microseconds-since-epoch for a timestamp column, exact and
    timezone-independent for both TIMESTAMP and TIMESTAMP_NTZ
    (``unix_micros`` rejects NTZ; an NTZ→LTZ cast would shift by the
    session zone, DST-variably)."""
    dtype = dict(df.dtypes)[ts_col]
    if dtype == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: float = 1800.0,
    order_cols: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids: a new session opens when the
    entity's inter-event gap exceeds ``gap_sec``.

    Adds two columns: ``<session_col>_seq`` (1-based session ordinal
    within the entity) and ``session_col`` (portable string id
    ``"<key>#<seq>"``).  Ties on ``ts_col`` are broken by
    ``order_cols`` (pass the event id for full determinism).

    Plan: one hash exchange on ``key_col``, one sort, two window
    expressions over the SAME window spec (no extra exchange), all
    whole-stage codegen.

    Rows with a NULL ``ts_col`` are EXCLUDED from the output: an
    event with no position on the timeline belongs to no session
    (left in, Spark's NULLS-FIRST window order would make each one a
    phantom session opener, shifting every real session ordinal).
    """
    if gap_sec <= 0:
        raise ValueError(f"gap_sec must be positive, got {gap_sec}")
    df = df.filter(F.col(ts_col).isNotNull())
    seq_name = f"{session_col}_seq"
    for c in (session_col, seq_name):
        if c in df.columns:
            raise ValueError(f"output column {c!r} already exists")
    order = [F.col(ts_col).asc(), *(F.col(c).asc() for c in order_cols)]
    w = Window.partitionBy(key_col).orderBy(*order)
    # Microsecond integer arithmetic: exact on both Spark and the
    # SQL oracle (no float epoch rounding at the gap boundary).
    us = _micros(df, ts_col)
    gap_us = int(round(gap_sec * 1_000_000))
    new_session = (us - F.lag(us).over(w) > F.lit(gap_us)).cast("int")
    seq = F.sum(F.coalesce(new_session, F.lit(1))).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq_col = f"{session_col}_seq"
    return df.withColumn(seq_col, seq).withColumn(
        session_col,
        F.concat_ws("#", F.col(key_col).cast("string"), F.col(seq_col).cast("string")),
    )


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: float = 1800.0,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-session summary: event count, start/end, duration seconds.

    ``sessionize``'s exchange is reused by the groupBy — the session
    key is a function of the partition key, so Catalyst plans the
    aggregate WITHOUT a second shuffle (partial agg + the existing
    hash partitioning on ``key_col`` satisfies the grouping).
    """
    s = sessionize(df, key_col, ts_col, gap_sec, order_cols)
    us = _micros(df, ts_col)
    return s.groupBy(key_col, "session_id_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        ((F.max(us) - F.min(us)) / F.lit(1_000_000.0)).alias("duration_sec"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tolerance_sec: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of (backward) left join: each left row picks the single
    most recent right row with ``right_ts <= left_ts`` per key —
    ``NULL`` payload when none exists (or when the match is older
    than ``tolerance_sec``).

    Matches DuckDB ``ASOF LEFT JOIN`` semantics (``>=`` — a right
    row AT the left timestamp matches; a NULL timestamp on either
    side never matches: NULL-``right_ts`` rows are dropped from the
    state stream, and a NULL-``left_ts`` row gets NULL payload).
    The right side must be unique per ``(key, right_ts)``; when it
    is not, the latest row wins deterministically only if
    ``right_cols`` values agree, so callers with
    duplicate-timestamp state should pre-dedup.

    Plan shape: project both sides to (key, ts-in-micros, payload,
    side tag), union, ONE hash exchange on the key, one sort by
    (ts, tag) — tag 0 sorts right-side rows first at equal
    timestamps so ``>=`` holds — then ``last(payload,
    ignorenulls=True)`` carries state forward.  No join operator at
    all: cost is one shuffle of (left + right) rows regardless of
    time-range fan-out, where a range-condition join would plan a
    per-key nested loop.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    for c in right_cols:
        if c not in right.columns:
            raise ValueError(f"right_cols entry {c!r} not in right side")
    matched_ts = f"{right_ts}{suffix}"

    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} must exist on both sides")
    reserved = [c for c in left.columns if c.startswith("__asof_")]
    if reserved:
        raise ValueError(f"reserved __asof_ columns already exist: {reserved}")
    clashes = [f"{c}{suffix}" for c in [right_ts, *right_cols]
               if f"{c}{suffix}" in left.columns]
    if clashes:
        raise ValueError(
            f"output columns {clashes} already exist on the left side; "
            "pass a different suffix"
        )

    # The right payload (match ts, both raw-typed and in micros, +
    # value columns) travels as ONE struct, null on left rows —
    # last(ignorenulls) then carries the whole latest state even
    # when individual payload FIELDS are null (per-column carries
    # would resurrect older non-null values).
    state = F.struct(
        _micros(right, right_ts).alias("__us"),
        F.col(right_ts).alias("__rts"),
        *(F.col(c).alias(c) for c in right_cols),
    )
    r_dtypes = dict(right.dtypes)
    state_type = (
        f"struct<__us:bigint,__rts:{r_dtypes[right_ts]},"
        + ",".join(f"`{c}`:{r_dtypes[c]}" for c in right_cols)
        + ">"
    ) if right_cols else f"struct<__us:bigint,__rts:{r_dtypes[right_ts]}>"
    l_dtypes = dict(left.dtypes)
    l_tagged = left.select(
        "*",
        _micros(left, left_ts).alias("__asof_us"),
        F.lit(1).alias("__asof_tag"),
        F.lit(None).cast(state_type).alias("__asof_state"),
    )
    # NULL right_ts rows would sort NULLS-FIRST and be carried as the
    # "most recent prior" state for every early left row — drop them
    # (DuckDB ASOF, the value oracle, never matches a NULL timestamp).
    right = right.filter(F.col(right_ts).isNotNull())
    r_tagged = right.select(
        *(
            F.col(c).cast(l_dtypes[c]).alias(c) if c in keys
            else F.lit(None).cast(l_dtypes[c]).alias(c)
            for c in left.columns
        ),
        _micros(right, right_ts).alias("__asof_us"),
        F.lit(0).alias("__asof_tag"),
        state.alias("__asof_state"),
    )
    u = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__asof_us").asc(), F.col("__asof_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__asof_state", ignorenulls=True).over(w)
    out = (
        u.withColumn("__asof_m", carried)
        .filter(F.col("__asof_tag") == 1)
    )
    within = (
        F.lit(True)
        if tolerance_sec is None
        else (F.col("__asof_us") - F.col("__asof_m.__us"))
        <= F.lit(int(round(tolerance_sec * 1_000_000)))
    )
    keep_match = F.col("__asof_m").isNotNull() & within
    return out.select(
        *left.columns,
        F.when(keep_match, F.col("__asof_m.__rts")).alias(matched_ts),
        *(
            F.when(keep_match, F.col(f"__asof_m.{c}")).alias(f"{c}{suffix}")
            for c in right_cols
        ),
    )
