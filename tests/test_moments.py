"""Exact pairwise moments (stages/moments.py): integer exactness vs a
Python-int oracle, Pearson r vs numpy, partitioning invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from thecrowler_ray.stages.moments import (
    moment_records,
    pearson_from_moments,
)


def _df(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(100, 15, n)
    return pd.DataFrame(
        {
            "a": x,
            "b": 2.0 * x + rng.normal(0, 5, n),  # strongly correlated
            "c": rng.normal(0, 1, n),  # independent
        }
    )


def _brute(df, cols, digits=2):
    q = {
        c: [int(np.floor(v * 10.0**digits + 0.5)) for v in df[c]]
        for c in cols
    }
    out = {}
    for i, a in enumerate(sorted(cols)):
        for b in sorted(cols)[i:]:
            out[(a, b)] = {
                "n": len(df),
                "sum_x": sum(q[a]),
                "sum_y": sum(q[b]),
                "sum_xy": sum(x * y for x, y in zip(q[a], q[b])),
                "sum_xx": sum(x * x for x in q[a]),
                "sum_yy": sum(y * y for y in q[b]),
            }
    return out


def test_exact_vs_python_ints(ray_session):
    df = _df()
    got = moment_records(rd.from_pandas(df).repartition(7),
                         ["a", "b", "c"])
    want = _brute(df, ["a", "b", "c"])
    assert len(got) == 6  # 3 pairs + 3 variance rows
    for _, r in got.iterrows():
        w = want[(r["cx"], r["cy"])]
        assert int(r["n"]) == w["n"]
        for k in ("sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy"):
            assert int(r[k]) == w[k], (r["cx"], r["cy"], k)


def test_pearson_matches_numpy(ray_session):
    df = _df()
    got = moment_records(rd.from_pandas(df), ["a", "b", "c"])
    row_ab = got[(got["cx"] == "a") & (got["cy"] == "b")].iloc[0]
    # quantization at 2 decimals barely perturbs r
    r_np = np.corrcoef(df["a"], df["b"])[0, 1]
    assert abs(pearson_from_moments(row_ab) - r_np) < 1e-4
    row_ac = got[(got["cx"] == "a") & (got["cy"] == "c")].iloc[0]
    assert abs(pearson_from_moments(row_ac)) < 0.1


def test_partitioning_invariance(ray_session):
    df = _df(n=2000)
    a = moment_records(rd.from_pandas(df).repartition(2), ["a", "b"])
    b = moment_records(rd.from_pandas(df).repartition(13), ["a", "b"])
    pd.testing.assert_frame_equal(a, b)


def test_int64_overflow_territory(ray_session):
    # values ~1e7 after q2 quantization: x*x ~1e14, 60k rows → 6e18+
    # per-column products overflow a naive int64 total
    df = pd.DataFrame({"a": np.full(60_000, 99999.99),
                       "b": np.full(60_000, 99999.99)})
    got = moment_records(rd.from_pandas(df), ["a", "b"])
    xx = int(got.iloc[0]["sum_xx"])
    assert xx == 60_000 * 9999999 * 9999999  # > 2^63 — exact anyway
