"""Misra-Gries heavy hitters (stages/sketch.py): exactness at capacity,
the N/(k+1) guarantee below it, merge bounds, distributed parity."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.stages.sketch import MisraGries, heavy_hitters


def zipf_stream(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return [f"u{int(v)}" for v in rng.zipf(1.5, n) % 400]


def test_exact_when_capacity_covers_distinct():
    data = zipf_stream()
    mg = MisraGries(k=1000)
    mg.add_values(data)
    assert mg.counters == dict(Counter(data))


def test_guarantee_below_capacity():
    data = zipf_stream()
    true = Counter(data)
    n, k = len(data), 20
    mg = MisraGries(k)
    mg.add_values(data)
    for v, est in mg.counters.items():
        assert est <= true[v]
        assert true[v] - est <= n // (k + 1) + 1
    # every value with frequency > N/(k+1) must be present
    for v, c in true.items():
        if c > n / (k + 1):
            assert v in mg.counters


def test_merge_preserves_guarantee():
    data = zipf_stream(n=8000, seed=11)
    half = len(data) // 2
    true = Counter(data)
    n, k = len(data), 25
    a, b = MisraGries(k), MisraGries(k)
    a.add_values(data[:half])
    b.add_values(data[half:])
    m = a.merge(b)
    assert len(m.counters) <= k
    for v, est in m.counters.items():
        assert est <= true[v]
        # merged error ≤ sum of the two halves' errors ≤ N/(k+1)-ish
        assert true[v] - est <= n // (k + 1) + 2
    for v, c in true.items():
        if c > n / (k + 1):
            assert v in m.counters


def test_k_validation():
    with pytest.raises(ValueError):
        MisraGries(0)


def test_distributed_exact_at_capacity(ray_session):
    data = zipf_stream(n=6000, seed=3)
    ds = rd.from_pandas(pd.DataFrame({"v": data})).repartition(8)
    got = heavy_hitters(ds, "v", k=4096, top=10)
    true = Counter(data)
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["value"], got["est"])) == [
        (v, c) for v, c in want
    ]


def test_distributed_guarantee_under_capacity(ray_session):
    data = zipf_stream(n=6000, seed=3)
    ds = rd.from_pandas(pd.DataFrame({"v": data})).repartition(8)
    got = heavy_hitters(ds, "v", k=16)
    true = Counter(data)
    n_batches = 8
    bound = len(data) // 17 + n_batches  # per-batch floors accumulate
    for v, est in zip(got["value"], got["est"]):
        assert est <= true[v]
        assert true[v] - est <= bound
