"""Mergeable quantile sketch (stages/sketch.py:QuantileSketch):
exact-at-capacity pin, compaction error bound, merge == bulk,
partitioning invariance of the bound."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from thecrowler_ray.stages.sketch import QuantileSketch, sketch_quantiles


def _true_rank(sorted_vals: np.ndarray, x: int) -> int:
    return int(np.searchsorted(sorted_vals, x, side="left"))


class TestSketch:
    def test_exact_when_under_capacity(self, ray_session):
        rng = np.random.RandomState(3)
        v = rng.randint(0, 10_000, size=5_000).astype(np.int64)
        sk = QuantileSketch(k=8_192)
        sk.add_values(v)
        assert len(sk.levels) == 1  # never compacted
        sv = np.sort(v)
        for q in (0.0, 0.05, 0.25, 0.5, 0.9, 1.0):
            assert sk.quantile(q) == sv[int(np.floor(q * (len(v) - 1)))]

    def test_error_bound_under_compaction(self, ray_session):
        rng = np.random.RandomState(7)
        n, k = 200_000, 256
        v = rng.randint(0, 1 << 40, size=n).astype(np.int64)
        sk = QuantileSketch(k=k)
        for chunk in np.array_split(v, 37):
            sk.add_values(chunk)
        sv = np.sort(v)
        # observed rank error; MRL/KLL eps ~ O(log^2(n/k)/k) — assert
        # a generous 3% of n
        for q in (0.1, 0.5, 0.9):
            est = sk.quantile(q)
            err = abs(_true_rank(sv, est) - q * (n - 1))
            assert err < 0.03 * n, (q, err)

    def test_merge_equals_bulk(self, ray_session):
        rng = np.random.RandomState(11)
        a = rng.randint(0, 1000, size=3_000).astype(np.int64)
        b = rng.randint(0, 1000, size=4_000).astype(np.int64)
        k = 16_384  # under capacity: merge must stay exact
        sa, sb = QuantileSketch(k), QuantileSketch(k)
        sa.add_values(a)
        sb.add_values(b)
        m = sa.merge(sb)
        sv = np.sort(np.concatenate([a, b]))
        for q in (0.2, 0.5, 0.8):
            assert m.quantile(q) == sv[int(np.floor(q * (m.n - 1)))]

    def test_deterministic(self, ray_session):
        v = np.arange(10_000, dtype=np.int64) % 997
        outs = []
        for _ in range(2):
            sk = QuantileSketch(k=64)
            sk.add_values(v)
            outs.append([sk.quantile(q) for q in (0.1, 0.5, 0.9)])
        assert outs[0] == outs[1]

    def test_distributed_stage_exact_gate(self, ray_session):
        rng = np.random.RandomState(13)
        v = rng.randint(0, 500, size=2_000).astype(np.int64)
        ds = rd.from_arrow(pa.table({"x": pa.array(v)})).repartition(8)
        got = sketch_quantiles(ds, "x", [0.25, 0.5, 0.75], k=1 << 15)
        sv = np.sort(v)
        want = [sv[int(np.floor(q * (len(v) - 1)))]
                for q in (0.25, 0.5, 0.75)]
        assert list(got["value"]) == want
        assert list(got["n"]) == [len(v)] * 3

    def test_empty_raises(self, ray_session):
        with pytest.raises(ValueError):
            QuantileSketch(k=16).quantile(0.5)
