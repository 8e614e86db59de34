"""Distributed sketches: HyperLogLog (cardinality) and Count-Min (frequency).

The reference counts distinct values exactly inside its time-series
aggregation (``pkg/database/time_series_aggregation.go`` keeps a per-bucket
value set); at 10^10 rows an exact set per group is not viable, so this adds
the standard HLL sketch (Flajolet et al. 2007 construction) as a
Ray-Data-native operator:

    map_batches → one 2^b-byte register array per batch   (no shuffle)
      → driver max-merge of the tiny register arrays
      → bias-corrected estimate

Registers are a pure function of the value set (md5-high-64 hashes), so the
whole distributed pipeline is EXACTLY recomputable in SQL — the
``q_hll_users`` oracle rebuilds every register with DuckDB md5/bin/strpos
and the driver hash-gate compares them integer-for-integer. Merge is
order-independent (max), which is what makes the sketch cluster-safe:
4 KiB per batch moves to the driver regardless of data size.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _hash64(values) -> np.ndarray:
    """md5-high-64 of the string form — matches the SQL twin's
    ('0x' || substr(md5(v), 1, 16))::UBIGINT."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big"
        )
    return out


class HyperLogLog:
    """Registers + estimate. b bits of bucket index (m = 2^b registers)."""

    def __init__(self, b: int = 12):
        self.b = b
        self.m = 1 << b
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        w_bits = 64 - self.b
        j = (h >> np.uint64(w_bits)).astype(np.int64)
        w = h & np.uint64((1 << w_bits) - 1)
        # rho = leading zeros of w within w_bits, + 1  ==  w_bits+1 - bit_length;
        # bit_length via frexp's exponent — exact because w < 2^53 is exactly
        # representable in float64 (b ≥ 11 keeps w_bits ≤ 53)
        assert w_bits <= 53
        bl = np.frexp(w.astype(np.float64))[1].astype(np.int64)  # 0 for w=0
        rho = (w_bits + 1 - bl).astype(np.uint8)
        np.maximum.at(self.registers, j, rho)

    def add_values(self, values) -> None:
        self.add_hashes(_hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.b == other.b
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        # exact integer sum of 2^(K - M_j) keeps the harmonic mean
        # reproducible (no float-summation order sensitivity)
        K = 64 - self.b + 1
        s = int(np.sum(1 << (K - self.registers.astype(np.int64))))
        e = alpha * m * m * (1 << K) / s
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * math.log(m / zeros)
        return e


class HLLBatchStage:
    """map_batches stage: N rows → ONE register-array row (4 KiB at b=12).
    Stateless; the driver (or a downstream reduce) max-merges rows."""

    def __init__(self, column: str, b: int = 12):
        self.column = column
        self.b = b

    def __call__(self, batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(self.b)
        hll.add_values(batch[self.column].to_pylist())
        return pa.table(
            {"registers": pa.array([hll.registers.tolist()],
                                   pa.list_(pa.uint8(), hll.m))}
        )


def hll_distinct(ds, column: str, b: int = 12) -> HyperLogLog:
    """Dataset → merged HLL for ``column``. Only register rows reach the
    driver: 4 KiB × #batches."""
    rows = ds.map_batches(
        HLLBatchStage, fn_constructor_args=(column, b),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    out = HyperLogLog(b)
    for regs in rows["registers"]:
        out.registers = np.maximum(out.registers,
                                   np.asarray(regs, dtype=np.uint8))
    return out


def hll_register_table(hll: HyperLogLog) -> pd.DataFrame:
    """Nonzero registers as (bucket, register) rows — the integer-exact
    shape the SQL oracle recomputes."""
    j = np.nonzero(hll.registers)[0]
    return pd.DataFrame(
        {"bucket": j.astype(np.int64),
         "register": hll.registers[j].astype(np.int64)}
    )


class CountMinSketch:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005): d rows ×
    w buckets of counters; add = increment h_r(v) in each row; point query
    = min over rows. Mergeable by element-wise SUM, so per-batch partials
    combine exactly — like the HLL above, counters are a pure function of
    the multiset and the q_cms_users oracle recomputes them in SQL."""

    def __init__(self, d: int = 4, w: int = 1024):
        self.d = d
        self.w = w
        self.counts = np.zeros((d, w), dtype=np.int64)

    def _buckets(self, values) -> np.ndarray:
        """(d, n) bucket ids: md5-high-64 of 'r|value' mod w — the seeded
        per-row hash family the SQL twin mirrors. Hashes memoize per
        unique value (real columns repeat heavily)."""
        out = np.empty((self.d, len(values)), dtype=np.int64)
        cache: dict = {}
        for i, v in enumerate(values):
            cols = cache.get(v)
            if cols is None:
                cols = [
                    int.from_bytes(
                        hashlib.md5(f"{r}|{v}".encode("utf-8")).digest()[:8],
                        "big",
                    ) % self.w
                    for r in range(self.d)
                ]
                cache[v] = cols
            for r in range(self.d):
                out[r, i] = cols[r]
        return out

    def add_values(self, values) -> None:
        b = self._buckets(values)
        for r in range(self.d):
            np.add.at(self.counts[r], b[r], 1)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.d, self.w) == (other.d, other.w)
        self.counts += other.counts
        return self

    def query(self, value) -> int:
        b = self._buckets([value])[:, 0]
        return int(min(self.counts[r, b[r]] for r in range(self.d)))


class CMSBatchStage:
    """map_batches stage: N rows → ONE flattened counter row (d*w int64)."""

    def __init__(self, column: str, d: int = 4, w: int = 1024):
        self.column = column
        self.d = d
        self.w = w

    def __call__(self, batch: pa.Table) -> pa.Table:
        cms = CountMinSketch(self.d, self.w)
        cms.add_values(batch[self.column].to_pylist())
        return pa.table(
            {"counts": pa.array([cms.counts.reshape(-1).tolist()],
                                pa.list_(pa.int64(), self.d * self.w))}
        )


def cms_frequencies(ds, column: str, d: int = 4, w: int = 1024) -> CountMinSketch:
    """Dataset → merged CMS. Only counter rows (d*w*8 B each) move."""
    rows = ds.map_batches(
        CMSBatchStage, fn_constructor_args=(column, d, w),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    out = CountMinSketch(d, w)
    for c in rows["counts"]:
        out.counts += np.asarray(c, dtype=np.int64).reshape(d, w)
    return out


def cms_table(cms: CountMinSketch) -> pd.DataFrame:
    """Nonzero counters as (row, bucket, cnt) — the SQL-recomputable shape."""
    r, b = np.nonzero(cms.counts)
    return pd.DataFrame(
        {"row": r.astype(np.int64), "bucket": b.astype(np.int64),
         "cnt": cms.counts[r, b]}
    )


class FixedBinHistogram:
    """Mergeable fixed-width histogram — the scale path for quantiles:
    per-batch integer bin counts sum-merge (like the CMS above), and any
    percentile reads off the merged counts with bounded error = bin width.
    Bin = floor(value / width), clamped to [lo_bin, hi_bin] edge bins so
    outliers can't explode the array."""

    def __init__(self, width: float, lo_bin: int = -1024, hi_bin: int = 1024):
        self.width = float(width)
        self.lo_bin = lo_bin
        self.hi_bin = hi_bin
        self.counts = np.zeros(hi_bin - lo_bin + 1, dtype=np.int64)

    def _bins(self, values: np.ndarray) -> np.ndarray:
        b = np.floor(np.asarray(values, dtype=np.float64) / self.width)
        return np.clip(b, self.lo_bin, self.hi_bin).astype(np.int64) - self.lo_bin

    def add_values(self, values) -> None:
        np.add.at(self.counts, self._bins(np.asarray(values)), 1)

    def merge(self, other: "FixedBinHistogram") -> "FixedBinHistogram":
        assert (self.width, self.lo_bin, self.hi_bin) == (
            other.width, other.lo_bin, other.hi_bin)
        self.counts += other.counts
        return self

    def quantile(self, q: float) -> float:
        """Lower-edge quantile: the left edge of the bin containing the
        q-th ordered element. Error ≤ one bin width."""
        total = int(self.counts.sum())
        if total == 0:
            return float("nan")
        target = max(1, int(np.ceil(q * total)))
        cum = np.cumsum(self.counts)
        idx = int(np.searchsorted(cum, target))
        return (idx + self.lo_bin) * self.width


class HistogramBatchStage:
    def __init__(self, column: str, width: float,
                 lo_bin: int = -1024, hi_bin: int = 1024):
        self.column = column
        self.args = (width, lo_bin, hi_bin)

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = FixedBinHistogram(*self.args)
        h.add_values(batch[self.column].to_numpy(zero_copy_only=False))
        return pa.table({"counts": pa.array([h.counts.tolist()],
                                            pa.list_(pa.int64(), len(h.counts)))})


def histogram_sketch(ds, column: str, width: float,
                     lo_bin: int = -1024, hi_bin: int = 1024) -> FixedBinHistogram:
    rows = ds.map_batches(
        HistogramBatchStage, fn_constructor_args=(column, width, lo_bin, hi_bin),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    out = FixedBinHistogram(width, lo_bin, hi_bin)
    for c in rows["counts"]:
        out.counts += np.asarray(c, dtype=np.int64)
    return out


def histogram_table(h: FixedBinHistogram) -> pd.DataFrame:
    nz = np.nonzero(h.counts)[0]
    return pd.DataFrame({
        "bin": (nz + h.lo_bin).astype(np.int64),
        "cnt": h.counts[nz],
    })


class MisraGries:
    """Misra-Gries heavy-hitters summary (Misra & Gries 1982; mergeable
    form per Agarwal et al. 2013 "Mergeable Summaries"). Holds at most
    ``k`` counters; any value with true frequency > N/(k+1) is
    guaranteed present, and every kept estimate undercounts its true
    frequency by at most N/(k+1). When ``k`` ≥ the number of distinct
    values the summary is EXACT — which is what makes the small-scale
    SQL oracle a plain GROUP BY."""

    def __init__(self, k: int):
        if k < 1:
            raise ValueError("MisraGries: k must be >= 1")
        self.k = k
        self.counters: dict = {}

    def add_values(self, values) -> None:
        c = self.counters
        k = self.k
        for v in values:
            if v in c:
                c[v] += 1
            elif len(c) < k:
                c[v] = 1
            else:
                # decrement-all; drop zeros (the classic step, batched:
                # decrement by 1 via dict sweep only when full)
                dead = []
                for key in c:
                    c[key] -= 1
                    if c[key] == 0:
                        dead.append(key)
                for key in dead:
                    del c[key]

    def merge(self, other: "MisraGries") -> "MisraGries":
        """Mergeable-summaries merge: add counters, then if over
        capacity subtract the (k+1)-th largest count from all and drop
        non-positives. Error adds linearly — the distributed guarantee."""
        c = dict(self.counters)
        for v, n in other.counters.items():
            c[v] = c.get(v, 0) + n
        if len(c) > self.k:
            cut = sorted(c.values(), reverse=True)[self.k]
            c = {v: n - cut for v, n in c.items() if n - cut > 0}
        out = MisraGries(self.k)
        out.counters = c
        return out


class MGBatchStage:
    """Per-batch Misra-Gries partial → ≤k (value, est) rows. No shuffle;
    the driver merges the tiny per-batch summaries."""

    def __init__(self, column: str, k: int):
        self.column = column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mg = MisraGries(self.k)
        mg.add_values(batch[self.column].to_pylist())
        vals = list(mg.counters.keys())
        return pa.table({
            "value": pa.array([str(v) for v in vals], pa.string()),
            "est": pa.array([mg.counters[v] for v in vals], pa.int64()),
        })


def heavy_hitters(ds, column: str, k: int = 4096,
                  top: int | None = None) -> pd.DataFrame:
    """Distributed heavy hitters over ``column`` → DataFrame
    (value, est) ordered (est DESC, value ASC), optionally truncated to
    ``top`` rows. Driver traffic is ≤ k rows per input batch (the
    summaries), never the data."""
    rows = ds.map_batches(
        MGBatchStage, fn_constructor_args=(column, k),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    # k-way merge: sum the per-batch counters, then one capacity cut
    # (subtract the (k+1)-th largest, keep positives). Error stays
    # bounded by Σ per-summary errors ≤ N/(k+1) — Agarwal et al. §3.
    agg = rows.groupby("value", sort=False)["est"].sum()
    if len(agg) > k:
        cut = int(agg.sort_values(ascending=False).iloc[k])
        agg = agg[agg - cut > 0] - cut
    df = agg.reset_index()
    df = df.sort_values(["est", "value"], ascending=[False, True],
                        kind="mergesort").reset_index(drop=True)
    if top is not None:
        df = df.head(top)
    df["est"] = df["est"].astype("int64")
    return df


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (MRL / KLL-with-equal-capacities)
# ---------------------------------------------------------------------------


class QuantileSketch:
    """Mergeable quantile sketch — Manku-Rajagopalan-Lindsay 1998
    levels with the KLL compaction step (Karnin-Lang-Liberty 2016),
    equal per-level capacity ``k`` and a DETERMINISTIC alternating
    compaction offset instead of the random coin (public derandomized
    variant: the randomized guarantee becomes an empirical one,
    property-tested; determinism is what makes runs reproducible and
    the exact-at-capacity SQL gate possible).

    Level ``i`` items carry weight ``2^i``. When a level exceeds ``k``
    items it is sorted and every other item (offset alternating per
    level across compactions) moves up one level. With ``k`` ≥ the
    total item count nothing ever compacts and the sketch is EXACT —
    the ``MisraGries`` gate pattern.
    """

    def __init__(self, k: int):
        if k < 2:
            raise ValueError("QuantileSketch: k must be >= 2")
        self.k = k
        self.levels: list[np.ndarray] = [np.array([], dtype=np.int64)]
        self.flips: list[int] = [0]
        self.n = 0

    def add_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.int64)
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        out = QuantileSketch(self.k)
        out.n = self.n + other.n
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        out.flips = []
        for i in range(depth):
            a = (self.levels[i] if i < len(self.levels)
                 else np.array([], dtype=np.int64))
            b = (other.levels[i] if i < len(other.levels)
                 else np.array([], dtype=np.int64))
            out.levels.append(np.concatenate([a, b]))
            out.flips.append(
                (self.flips[i] if i < len(self.flips) else 0)
                + (other.flips[i] if i < len(other.flips) else 0))
        out._compact()
        return out

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            lv = self.levels[i]
            if len(lv) > self.k:
                lv = np.sort(lv, kind="mergesort")
                # odd sizes keep one leftover at this level so total
                # weight is preserved EXACTLY: promoted items carry
                # doubled weight for their discarded partners
                if len(lv) % 2:
                    leftover = lv[-1:]
                    lv = lv[:-1]
                else:
                    leftover = lv[:0]
                off = self.flips[i] % 2
                self.flips[i] += 1
                up = lv[off::2]
                self.levels[i] = leftover
                if i + 1 == len(self.levels):
                    self.levels.append(np.array([], dtype=np.int64))
                    self.flips.append(0)
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], up])
            i += 1

    def quantile(self, q: float) -> int:
        """The smallest item whose cumulative weight exceeds
        floor(q·(n−1)) over the weight-expanded ascending order —
        identical to the ``ops/quantiles.py`` rank when exact."""
        if self.n == 0:
            raise ValueError("QuantileSketch: empty")
        vals = np.concatenate(self.levels)
        wts = np.concatenate([
            np.full(len(lv), 1 << i, dtype=np.int64)
            for i, lv in enumerate(self.levels)])
        order = np.argsort(vals, kind="mergesort")
        vals, wts = vals[order], wts[order]
        target = int(np.floor(q * (self.n - 1)))
        cum = np.cumsum(wts)
        j = int(np.searchsorted(cum, target + 1))
        return int(vals[min(j, len(vals) - 1)])

    def rows(self):
        """(level, value) rows — the mergeable wire format."""
        for i, lv in enumerate(self.levels):
            for v in lv:
                yield i, int(v)

    @classmethod
    def from_rows(cls, k: int, levels: np.ndarray,
                  values: np.ndarray, n: int) -> "QuantileSketch":
        out = cls(k)
        out.n = n
        depth = int(levels.max()) + 1 if len(levels) else 1
        out.levels = [values[levels == i].astype(np.int64)
                      for i in range(depth)]
        out.flips = [0] * depth
        out._compact()
        return out


class QSketchBatchStage:
    """Per-batch quantile-sketch partial → (level, value, n_items)
    rows. No shuffle; the driver merges the per-batch sketches."""

    def __init__(self, column: str, k: int):
        self.column = column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sk = QuantileSketch(self.k)
        sk.add_values(batch[self.column].to_numpy(
            zero_copy_only=False).astype(np.int64))
        rows = list(sk.rows())
        return pa.table({
            "level": pa.array([r[0] for r in rows], pa.int64()),
            "value": pa.array([r[1] for r in rows], pa.int64()),
            "n_items": pa.array(
                [sk.n] + [0] * (len(rows) - 1) if rows else [],
                pa.int64()),
        })


def sketch_quantiles(ds, column: str, qs: list[float],
                     k: int = 1 << 20) -> pd.DataFrame:
    """Distributed mergeable-sketch quantiles over ``column`` →
    DataFrame (q_permille, n, value) — the ``exact_quantiles`` schema.
    Driver traffic: ≤ O(k·levels) sketch rows per batch, never data.
    With ``k`` ≥ the total row count the sketch never compacts and the
    result is the exact order statistic (the SQL gate); below that the
    MRL/KLL error bound applies (property-tested)."""
    parts = ds.select_columns([column]).map_batches(
        QSketchBatchStage, fn_constructor_args=(column, k),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(columns=["q_permille", "n", "value"])
    sk = QuantileSketch.from_rows(
        k,
        parts["level"].to_numpy(np.int64),
        parts["value"].to_numpy(np.int64),
        int(parts["n_items"].sum()),
    )
    return pd.DataFrame({
        "q_permille": [int(round(q * 1000)) for q in qs],
        "n": [sk.n] * len(qs),
        "value": [sk.quantile(q) for q in qs],
    })
