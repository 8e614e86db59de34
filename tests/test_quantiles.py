"""Exact distributed quantiles (ops/quantiles.py): randomized oracle
vs np.sort, heavy duplicates, negatives, degenerate shapes."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.ops.quantiles import exact_quantiles

QS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]


def _oracle(values, qs):
    s = np.sort(np.asarray(values, dtype=np.int64))
    return {int(round(q * 1000)): int(s[int(np.floor(q * (len(s) - 1)))])
            for q in qs}


def _got(values, qs, **kw):
    ds = rd.from_pandas(pd.DataFrame({"v": np.asarray(values, "int64")}))
    out = exact_quantiles(ds, "v", qs, **kw).to_pandas()
    assert (out["n"] == len(values)).all()
    return dict(zip(out["q_permille"], out["value"]))


@pytest.mark.parametrize("seed", [0, 1])
def test_random_values(ray_session, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(-10**12, 10**12, 5000)
    assert _got(vals, QS) == _oracle(vals, QS)


def test_heavy_duplicates_and_small_buckets(ray_session):
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 7, 4000)  # 7 distinct values
    # tiny bucket count forces multiple refinement passes
    assert _got(vals, QS, n_buckets=2) == _oracle(vals, QS)


def test_negatives_and_single_row(ray_session):
    assert _got([-5], [0.0, 0.5, 1.0]) == {0: -5, 500: -5, 1000: -5}
    vals = [-100, -50, 0, 50, 100]
    assert _got(vals, [0.5]) == {500: 0}


def test_empty_dataset(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"v": pd.Series([], dtype="int64")}))
    out = exact_quantiles(ds, "v", [0.5]).to_pandas()
    assert len(out) == 0
