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

Items are integer-valued (token ids, category codes, bucketed keys);
the two-phase harness feeds them through ``CONSUMES = "values"``
exactly like the quantile sketches — per-partition partials, merged in
any order/grouping on the driver or in the grouped/streaming paths.

PRECISION LIMIT: items ride the harness's float64 value lane, so only
magnitudes ≤ 2^53 are exact — 64-bit ids (snowflake ids, raw xxhash64
keys) beyond that are rounded by the float64 transport and DISTINCT ids
can conflate.  ``update_values`` raises on such input rather than
silently merging heavy hitters; route wide ids through ``hash_keys64``
→ ``pmod``/bucketing, or remap them to a dense ≤2^53 id space first.

No counterpart in the reference (its scope is the Bloom prefilter,
``/root/reference/src/BloomFilter.h``); this extends the suite for the
training-pipeline profile (hot tokens, hot sources, hot shard keys).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch

_SAFE_INT = float(1 << 53)


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
        the harness's value lane) as one VECTORIZED summary merge: the
        batch's ``np.unique`` (item, count) table is an exact, zero-error
        frequency summary, so folding it in via the PODS'12 combine
        (shared items sum; batch-only items inherit the current min as
        overcount+error when at capacity; keep the k largest) preserves
        both count invariants and the 2·total/k presence guarantee —
        the same bounds ``merge`` maintains, with no per-unique Python
        loop (a batch costs one ``np.unique`` + one searchsorted match +
        one top-k partition, ~O(u log u) for u uniques).

        Raises ValueError when any item does not round-trip through
        float64 (magnitude beyond 2^53, or fractional): such items
        would silently conflate distinct heavy hitters — see the module
        docstring's PRECISION LIMIT."""
        if v.size == 0:
            return
        with np.errstate(invalid="ignore"):
            if float(np.abs(v).max()) > _SAFE_INT:
                raise ValueError(
                    "TopKSketch items must have magnitude <= 2^53 (float64 "
                    "value-lane transport is exact only in that range; larger "
                    "ids conflate distinct heavy hitters). Bucket 64-bit ids "
                    "first (e.g. hash_keys64 then pmod) or remap to a dense "
                    "id space."
                )
        items = v.astype(np.int64)
        if (items.astype(np.float64) != v).any():
            raise ValueError(
                "TopKSketch items must be integer-valued (got fractional "
                "values, which would be silently truncated)"
            )
        vals, cnts = np.unique(items, return_counts=True)  # vals ascending
        self._fold(vals, cnts, int(items.size))

    def update_weighted(self, items: np.ndarray, weights: np.ndarray) -> None:
        """Absorb a batch of (item, weight) pairs — each row contributes
        ``weight`` instances instead of one (e.g. items = doc ids /
        part keys, weights = n_tok / quantity).  The batch collapses to
        an exact per-unique weight-sum table (one ``np.unique`` + one
        segmented ``np.add.at``), then folds in through the same
        PODS'12 combine as :meth:`update_values`, so both SpaceSaving
        invariants and the 2·total/capacity presence bound hold with
        ``total`` = the weighted instance count.

        Weights must be integer-valued and ≥ 0 (fractional weights
        would corrupt the int64 counters; negative weights break the
        count-never-undercounts invariant). Zero-weight rows are
        legal no-ops."""
        if items.size != weights.size:
            raise ValueError(
                f"items ({items.size}) and weights ({weights.size}) must "
                "have equal length"
            )
        if items.size == 0:
            return
        with np.errstate(invalid="ignore"):
            if float(np.abs(items).max()) > _SAFE_INT:
                raise ValueError(
                    "TopKSketch items must have magnitude <= 2^53 — see "
                    "update_values"
                )
        iv = items.astype(np.int64)
        if (iv.astype(np.float64) != items.astype(np.float64)).any():
            raise ValueError("TopKSketch items must be integer-valued")
        w = np.asarray(weights)
        wi = w.astype(np.int64)
        if (wi.astype(np.float64) != w.astype(np.float64)).any():
            raise ValueError(
                "TopKSketch weights must be integer-valued (fractional "
                "weights would corrupt the int64 counters)"
            )
        if (wi < 0).any():
            raise ValueError("TopKSketch weights must be >= 0")
        vals, inv = np.unique(iv, return_inverse=True)
        wsums = np.zeros(vals.size, dtype=np.int64)
        np.add.at(wsums, inv, wi)
        nz = wsums > 0
        if not nz.all():
            vals, wsums = vals[nz], wsums[nz]
        if vals.size:
            self._fold(vals, wsums, int(wi.sum()))

    def _fold(self, vals: np.ndarray, cnts: np.ndarray, n_instances: int) -> None:
        """Fold an exact ascending (item, count) summary table into the
        monitored set via the PODS'12 combine (shared items sum;
        table-only items inherit the current min as overcount+error
        when at capacity; keep the k largest)."""
        d = self._counters
        n_mon = len(d)
        if n_mon:
            mon = np.fromiter(d.keys(), np.int64, n_mon)
            mcnt = np.fromiter((c for c, _ in d.values()), np.int64, n_mon)
            merr = np.fromiter((e for _, e in d.values()), np.int64, n_mon)
            min_s = int(mcnt.min()) if n_mon >= self.k else 0
            # match batch items to monitored items via one searchsorted
            mord = np.argsort(mon, kind="stable")
            mon_sorted = mon[mord]
            pos = np.searchsorted(mon_sorted, vals)
            posc = np.minimum(pos, n_mon - 1)
            shared = mon_sorted[posc] == vals
            np.add.at(mcnt, mord[posc[shared]], cnts[shared])
        else:
            mon = mcnt = merr = np.empty(0, dtype=np.int64)
            min_s = 0
            shared = np.zeros(vals.size, dtype=bool)
        # batch-only items: exact batch count + the current min as the
        # SpaceSaving overcount/error (zero when under capacity)
        all_items = np.concatenate([mon, vals[~shared]])
        all_cnt = np.concatenate([mcnt, cnts[~shared] + min_s])
        all_err = np.concatenate(
            [merr, np.full(int((~shared).sum()), min_s, dtype=np.int64)]
        )
        if all_items.size > self.k:
            # keep the k largest; tie-break smaller item (same order as
            # merge's truncation)
            sel = np.lexsort((all_items, -all_cnt))[: self.k]
            all_items, all_cnt, all_err = all_items[sel], all_cnt[sel], all_err[sel]
        self._counters = {
            int(i): [int(c), int(e)]
            for i, c, e in zip(all_items, all_cnt, all_err)
        }
        self.total += n_instances

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
        (2·total/k — the mergeable-summaries bound, which covers both
        the batched build path and any partial-merge tree)."""
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
