"""Physical-plan audit: turn ``df.explain()`` prose into the numbers a
pipeline can assert on.

Every plan contract this library documents (probe before exchange,
pruned scans, pushed filters, no Python in the row path, bucketed
joins with zero Exchange) is ultimately a statement about the
executed physical plan.  ``tests/test_plans.py`` pins those contracts
for the library's own operators; ``plan_audit`` gives USERS the same
instrument for their composed jobs — a CI step can fail a pipeline
when a code change silently reintroduces a shuffle, drops a pushdown,
or pulls a row-at-a-time Python UDF into the hot path, instead of
discovering it as a 10× regression on the cluster.

Everything reads the already-planned query (``queryExecution``): the
audit runs no jobs and touches no data.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["PlanAudit", "plan_audit"]


@dataclass
class PlanAudit:
    """Structured summary of one executed physical plan."""

    #: shuffle exchanges (each is a full rewrite of the stream)
    n_shuffle_exchanges: int = 0
    #: broadcast exchanges (driver collect + re-send; fine when small)
    n_broadcast_exchanges: int = 0
    #: join operators by strategy, e.g. {"BroadcastHashJoin": 1}
    joins: dict = field(default_factory=dict)
    #: per-scan pushdown evidence: [{"format", "pushed_filters",
    #: "read_schema_cols"}] — an empty pushed_filters on a filtered
    #: scan means the predicate runs AFTER the read
    scans: list = field(default_factory=list)
    #: WholeStageCodegen spans (wider is better: fused JVM loops)
    n_codegen_spans: int = 0
    #: operators that run Python per batch (ArrowEvalPython, MapInArrow,
    #: FlatMapGroupsInPandas, ...) — the declared slow path
    python_operators: list = field(default_factory=list)
    #: row-at-a-time Python UDF operators (BatchEvalPython) — the
    #: anti-pattern; this library keeps it at zero
    n_row_python_udfs: int = 0
    #: sort operators (each may spill; global sorts also range-exchange)
    n_sorts: int = 0

    def __str__(self) -> str:  # human-readable one-pager
        lines = [
            f"shuffle exchanges:    {self.n_shuffle_exchanges}",
            f"broadcast exchanges:  {self.n_broadcast_exchanges}",
            f"joins:                {self.joins or '{}'}",
            f"codegen spans:        {self.n_codegen_spans}",
            f"sorts:                {self.n_sorts}",
            f"python operators:     {self.python_operators or '[]'}",
            f"row-python UDFs:      {self.n_row_python_udfs}",
            f"scans:                {len(self.scans)}",
        ]
        for s in self.scans:
            lines.append(
                f"  - {s['format']}: pushed={s['pushed_filters']} "
                f"cols={s['read_schema_cols']}"
            )
        return "\n".join(lines)


_JOIN_RE = re.compile(r"\b(\w*Join\w*)\b")
# greedy to the LAST ']' on the line: In(c, [a,b]) nests brackets
_PUSHED_RE = re.compile(r"PushedFilters:\s*\[(.*)\]")
_READSCHEMA_RE = re.compile(r"ReadSchema:\s*struct<([^>]*)>")


def _split_top_level(s: str) -> list[str]:
    """Split a PushedFilters payload on top-level commas only —
    ``In(doc_id, [a,b])`` and ``Or(LessThan(x,1),GreaterThan(x,9))``
    each stay ONE filter string (a naive regex stops at the first
    ``]`` or can't match nested parens and emits fragment words)."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            part = "".join(cur).strip()
            if part:
                parts.append(part)
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts
_PY_OPS = (
    "ArrowEvalPython",
    "MapInArrow",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "AggregateInPandas",
)


def plan_audit(df: DataFrame) -> PlanAudit:
    """Audit ``df``'s executed physical plan (no job runs).

    The counters deliberately mirror the library's documented
    contracts: assert ``n_shuffle_exchanges == 0`` after
    ``co_located_join``, ``n_row_python_udfs == 0`` on any hot path,
    ``scans[i]["pushed_filters"]`` non-empty when a filter should
    reach parquet, ``"Join" not in joins`` for the as-of union+window
    plan.
    """
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    out = PlanAudit()

    for line in plan.splitlines():
        stripped = line.lstrip(" +-*:(0123456789)")
        if "ReusedExchange" in line:
            continue
        if "BroadcastExchange" in line:
            out.n_broadcast_exchanges += 1
        elif "Exchange" in line and "Exchange" in stripped.split("(")[0]:
            out.n_shuffle_exchanges += 1
        m = _JOIN_RE.search(stripped.split("(")[0])
        if m and not stripped.startswith("Exchange"):
            out.joins[m.group(1)] = out.joins.get(m.group(1), 0) + 1
        if stripped.startswith("Sort"):
            out.n_sorts += 1
        for op in _PY_OPS:
            if stripped.startswith(op):
                out.python_operators.append(op)
        if stripped.startswith("BatchEvalPython"):
            out.n_row_python_udfs += 1

    # scan pushdown evidence + codegen spans come from the formatted
    # explain (the simple plan string omits PushedFilters, and Spark 4
    # renders codegen fusion as "*(n)" markers there)
    formatted = qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    # codegen spans: under AQE the "*(n)" fusion markers exist only
    # once stages have executed (the pre-execution AdaptiveSparkPlan
    # hides its subtree from the codegen explain mode too) — so the
    # count is authoritative AFTER an action has run the df, and a
    # conservative 0 before
    star_ids = set(re.findall(r"\*\((\d+)\)", plan))
    codegen = qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("codegen")
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", codegen)
    out.n_codegen_spans = max(len(star_ids), int(m.group(1)) if m else 0)
    # node-detail sections only ("(1) Scan parquet ... ReadSchema: ...");
    # the top tree also prints "Scan parquet (1)" header lines, which
    # carry no detail and must not count as scans
    for scan in re.finditer(
        r"\(\d+\) Scan (\w+)[\s\S]*?(?=\n\(\d+\)|\Z)", formatted
    ):
        text = scan.group(0)
        if "ReadSchema:" not in text:
            continue
        pushed = _PUSHED_RE.search(text)
        schema = _READSCHEMA_RE.search(text)
        cols = []
        if schema:
            cols = [c.split(":")[0] for c in schema.group(1).split(",") if c]
        filters = []
        if pushed:
            filters = _split_top_level(pushed.group(1))
        out.scans.append(
            {
                "format": scan.group(1),
                "pushed_filters": filters,
                "read_schema_cols": cols,
            }
        )
    return out
