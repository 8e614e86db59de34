"""Flagship training-set export (pipelines/training_export.py)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import ray.data

from thecrowler_ray.pipelines.training_export import (
    export_summary,
    export_training_set,
    training_survivors,
)

SF = "/root/testdata/sf0.001"


def test_export_writes_splits_and_resumes(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    m1 = export_training_set(SF, out)
    assert set(m1["splits"]) == {"train", "val", "test"}
    # written rows match the manifest
    for split, entry in m1["splits"].items():
        tbl = pq.read_table(os.path.join(out, f"split={split}"))
        assert tbl.num_rows == entry["n_docs"]
        assert sum(tbl["ws_tokens"].to_pylist()) == entry["n_tokens"]
    # train carries bins; bin ids are a contiguous 0..max range in pos order
    tr = (
        pq.read_table(os.path.join(out, "split=train"))
        .to_pandas()
        .sort_values("pos")
    )
    assert (tr["bin"].diff().dropna() >= 0).all()
    assert tr["bin"].iloc[0] == 0
    assert m1["splits"]["train"]["n_bins"] == int(tr["bin"].max()) + 1
    # per-bin token sums never exceed window + the doc that crossed it
    sums = tr.groupby("bin")["ws_tokens"].sum()
    assert (sums.iloc[:-1] >= 2048 - tr["ws_tokens"].max()).all()

    # resume no-op: complete manifest + dirs → nothing recomputed
    manifest_before = json.load(open(os.path.join(out, "manifest.json")))
    m2 = export_training_set(SF, out)
    assert m2["splits"] == manifest_before["splits"]

    # partial failure: a split dir vanished but the manifest still lists
    # it → that split (and only it) is rebuilt, with identical contents
    import shutil

    val_dir = os.path.join(out, "split=val")
    train_mtime = os.path.getmtime(os.path.join(out, "split=train"))
    shutil.rmtree(val_dir)
    m3 = export_training_set(SF, out)
    assert m3["splits"] == manifest_before["splits"]
    assert pq.read_table(val_dir).num_rows == m3["splits"]["val"]["n_docs"]
    assert os.path.getmtime(os.path.join(out, "split=train")) == train_mtime

    # a manifest from another corpus must never satisfy this run
    mpath = os.path.join(out, "manifest.json")
    tampered = json.load(open(mpath))
    tampered["sf_dir"] = "/some/other/corpus"
    json.dump(tampered, open(mpath, "w"))
    m4 = export_training_set(SF, out)
    assert m4["splits"] == manifest_before["splits"]  # recomputed, equal
    # and the rewritten split dirs hold exactly one copy
    for split, entry in m4["splits"].items():
        tbl = pq.read_table(os.path.join(out, f"split={split}"))
        assert tbl.num_rows == entry["n_docs"]


def test_survivors_admission_and_dedup(ray_session):
    # two identical long docs (one must be dropped), one short doc
    # (admission drops it), one good unique doc
    long_a = " ".join(["alpha beta gamma delta"] * 20)  # 80 words
    df = pd.DataFrame(
        {
            "doc_id": [10, 11, 12, 13],
            "text": [long_a, long_a, "too short", long_a + " unique tail"],
        }
    )
    surv = training_survivors(ray.data.from_pandas(df)).to_pandas()
    assert set(surv["doc_id"]) == {10, 13}  # 11 deduped, 12 not admitted
    assert surv.set_index("doc_id")["ws_tokens"].to_dict() == {10: 80, 13: 82}
    # positions are a permutation of 0..n-1
    assert sorted(surv["pos"]) == [0, 1]


def test_survivors_near_dup_drop(ray_session):
    """near_dup=True drops MinHash cluster members, keeping cluster-min:
    two long docs differing by one word near-dup each other; an unrelated
    long doc survives alone."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            * 8).strip()                       # 80 words
    near = base.rsplit(" ", 1)[0] + " OMEGA"    # one-word change
    other = ("one two three four five six seven eight nine ten " * 8).strip()
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base, near, other],
    })
    ds = ray.data.from_pandas(df)
    exact = training_survivors(ds).to_pandas()
    assert set(exact["doc_id"]) == {1, 2, 3}   # exact dedup keeps all
    nd = training_survivors(ds, near_dup=True).to_pandas()
    assert set(nd["doc_id"]) == {1, 3}         # 2 clusters with 1 (min wins)
