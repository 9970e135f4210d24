"""SpaceSaving top-k / heavy hitters (Metwally, Agrawal & El Abbadi,
"Efficient computation of frequent and top-k elements in data streams",
ICDT 2005), with the mergeable-summaries merge (Agarwal, Cormode,
Huang, Phillips, Wei & Yi, PODS 2012).

The sixth sketch of the suite — the question CMS cannot answer alone:
*which* items are the heavy hitters (CMS gives point frequencies, but
enumerating candidates needs a monitored set).  SpaceSaving maintains k
(item, count, error) counters with the invariants, preserved by merge:

- ``count`` NEVER undercounts: true frequency ≤ count;
- ``count − error`` never overcounts: count − error ≤ true frequency;
- after any sequence of merges, every item with true frequency
  > 2·total/k is guaranteed to be monitored (the PODS'12 bound).

Items are integer-valued (token ids, user ids, hashed keys); the
two-phase harness feeds them through ``CONSUMES = "values"`` exactly
like the quantile sketches — per-partition partials, merged in any
order/grouping on the driver or in the grouped/streaming paths.

No counterpart in the reference (its scope is the Bloom prefilter,
``/root/reference/src/BloomFilter.h``); this extends the suite for the
training-pipeline profile (hot tokens, hot sources, hot shard keys).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch


class TopKSketch(Sketch):
    KIND = b"TPK1"
    CONSUMES = "values"

    def __init__(self, k: int = 64):
        if k < 1:
            raise ValueError(f"k must be ≥ 1, got {k}")
        self.k = int(k)
        self.total = 0
        self.has_null = False
        #: item -> [count, error]
        self._counters: dict[int, list] = {}

    # -- build ---------------------------------------------------------
    def update_values(self, v: np.ndarray) -> None:
        """Absorb a batch of integer-valued items (float64 transport,
        the harness's value lane).  Batch pre-aggregation: np.unique
        collapses the batch to (item, count) pairs, offered heaviest
        first so a big new item evicts the true minimum instead of a
        counter another batch item just inflated."""
        if v.size == 0:
            return
        items = v.astype(np.int64)
        vals, cnts = np.unique(items, return_counts=True)
        order = np.argsort(-cnts, kind="stable")
        d = self._counters
        for item, c in zip(vals[order].tolist(), cnts[order].tolist()):
            ent = d.get(item)
            if ent is not None:
                ent[0] += c
            elif len(d) < self.k:
                d[item] = [c, 0]
            else:
                # SpaceSaving eviction: the new item inherits the min
                # counter's count as its (over)count and error
                m_item = min(d, key=lambda i: d[i][0])
                m = d[m_item][0]
                del d[m_item]
                d[item] = [m + c, m]
        self.total += int(items.size)

    def add_null(self) -> None:
        self.has_null = True

    # -- query ---------------------------------------------------------
    def topk(self) -> list[tuple[int, int, int]]:
        """Monitored items as (item, count, error), count-descending
        (deterministic tie-break: smaller item first).  true ∈
        [count − error, count] for every row."""
        return sorted(
            ((i, c, e) for i, (c, e) in self._counters.items()),
            key=lambda t: (-t[1], t[0]),
        )

    def guaranteed_min_frequency(self) -> float:
        """Items with true frequency above this are certainly monitored
        (2·total/k — the post-merge mergeable-summaries bound; a
        single-stream build guarantees the tighter total/k)."""
        return 2.0 * self.total / self.k

    # -- merge ---------------------------------------------------------
    def merge(self, other: "TopKSketch") -> "TopKSketch":
        """Mergeable-summaries combine: shared items sum counts and
        errors; an item monitored on only one side inherits the OTHER
        side's min count as extra count+error (an absent item's true
        count there is at most that min — zero if that side is under
        capacity).  Then keep the k largest.  Both invariants survive:
        counts stay upper bounds, count−error stays a lower bound."""
        if other.k != self.k:
            raise ValueError("cannot merge TopKSketch with different k")
        a, b = self._counters, other._counters
        min_a = min((c for c, _ in a.values()), default=0) if len(a) >= self.k else 0
        min_b = min((c for c, _ in b.values()), default=0) if len(b) >= other.k else 0
        merged: dict[int, list] = {}
        for item, (c, e) in a.items():
            ob = b.get(item)
            if ob is not None:
                merged[item] = [c + ob[0], e + ob[1]]
            else:
                merged[item] = [c + min_b, e + min_b]
        for item, (c, e) in b.items():
            if item not in merged:
                merged[item] = [c + min_a, e + min_a]
        if len(merged) > self.k:
            keep = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))[: self.k]
            merged = dict(keep)
        self._counters = merged
        self.total += other.total
        self.has_null |= other.has_null
        return self

    # -- serialization -------------------------------------------------
    def _payload_bytes(self) -> bytes:
        n = len(self._counters)
        items = np.fromiter(self._counters.keys(), dtype=np.int64, count=n)
        counts = np.fromiter(
            (c for c, _ in self._counters.values()), dtype=np.int64, count=n
        )
        errors = np.fromiter(
            (e for _, e in self._counters.values()), dtype=np.int64, count=n
        )
        head = struct.pack("<IqB", self.k, self.total, int(self.has_null))
        return head + items.tobytes() + counts.tobytes() + errors.tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "TopKSketch":
        k, total, has_null = struct.unpack_from("<IqB", payload, 0)
        off = struct.calcsize("<IqB")
        body = np.frombuffer(payload, dtype=np.int64, offset=off)
        n = body.size // 3
        obj = cls(k)
        obj.total = total
        obj.has_null = bool(has_null)
        obj._counters = {
            int(i): [int(c), int(e)]
            for i, c, e in zip(body[:n], body[n : 2 * n], body[2 * n :])
        }
        return obj
