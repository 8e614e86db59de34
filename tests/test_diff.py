"""Snapshot diff (stages/diff.py): status classification on a
hand-built snapshot pair + rollup arithmetic."""

import pandas as pd
import ray.data as rd

from thecrowler_ray.stages.diff import change_rates, snapshot_diff


def _sides():
    old = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["same", "will change", "gone", "also same"],
        "source": ["a", "a", "b", "b"],
    })
    new = pd.DataFrame({
        "doc_id": [1, 2, 4, 5],
        "text": ["same", "changed!", "also same", "brand new"],
        "source": ["a", "a", "b", "b"],
    })
    return rd.from_pandas(old), rd.from_pandas(new)


def test_snapshot_diff_statuses(ray_session):
    old, new = _sides()
    out = (snapshot_diff(old, new).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1, "status"] == "unchanged"
    assert out.loc[2, "status"] == "changed"
    assert out.loc[3, "status"] == "removed"
    assert out.loc[4, "status"] == "unchanged"
    assert out.loc[5, "status"] == "added"
    # removed docs keep their old-side metadata
    assert out.loc[3, "source"] == "b"
    assert len(out) == 5


def test_change_rates_rollup(ray_session):
    old, new = _sides()
    out = (change_rates(snapshot_diff(old, new)).to_pandas()
           .set_index("source").sort_index())
    assert out.loc["a"].tolist() == [0, 0, 1, 1, 0.5]
    # b: removed doc 3, added doc 5, unchanged doc 4 → 2/3 changed
    assert out.loc["b", "n_added"] == 1
    assert out.loc["b", "n_removed"] == 1
    assert out.loc["b", "n_unchanged"] == 1
    assert abs(out.loc["b", "change_rate"] - round(2 / 3, 6)) < 1e-12


def test_recrawl_intervals(ray_session):
    import math

    import pyarrow as pa
    from thecrowler_ray.stages.diff import recrawl_intervals

    rates = rd.from_arrow(pa.table({
        "source": ["all_changed", "none_changed", "half"],
        "n_added": [0, 0, 0],
        "n_removed": [0, 0, 0],
        "n_changed": [10, 0, 5],
        "n_unchanged": [0, 10, 5],
    }))
    out = (recrawl_intervals(rates).to_pandas()
           .set_index("source"))

    def lam(c, u):
        n = c + u
        return math.floor(-math.log((2 * u + 1) / (2 * n + 1)) * 1e6 + 0.5)

    # all changed → high λ → clamped to the 1h floor
    assert out.loc["all_changed", "lambda_q6"] == lam(10, 0)
    assert out.loc["all_changed", "next_interval_s"] == \
        max(86_400 * 1_000_000 // lam(10, 0), 3_600)
    # nothing changed → λ = 0 → clamped to the 30d ceiling
    assert out.loc["none_changed", "lambda_q6"] == 0
    assert out.loc["none_changed", "next_interval_s"] == 2_592_000
    assert out.loc["half", "lambda_q6"] == lam(5, 5)
    assert out.loc["half", "n_observed"] == 10
