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
