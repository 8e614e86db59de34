"""RRF fusion (stages/fusion.py): hand-computed fusion arithmetic,
rank assignment determinism, grouped (multi-query) fusion."""

import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.stages.fusion import add_rank, rrf_fuse


def test_rrf_hand_computed(ray_session):
    # run A: [10, 11, 12]; run B: [11, 10, 13]
    runs = pd.DataFrame({
        "doc_id": [10, 11, 12, 11, 10, 13],
        "rank": [1, 2, 3, 1, 2, 3],
    })
    out = (rrf_fuse(rd.from_pandas(runs)).to_pandas()
           .set_index("doc_id").sort_index())
    c = lambda r: 10**6 // (60 + r)
    assert out.loc[10].tolist() == [c(1) + c(2), 2, 1]
    assert out.loc[11].tolist() == [c(2) + c(1), 2, 1]
    assert out.loc[12].tolist() == [c(3), 1, 3]
    assert out.loc[13].tolist() == [c(3), 1, 3]
    # doc in both runs beats docs in one
    assert out.loc[10, "rrf_q6"] > out.loc[12, "rrf_q6"]


def test_rrf_rejects_zero_based_ranks(ray_session):
    runs = rd.from_pandas(pd.DataFrame({"doc_id": [1], "rank": [0]}))
    with pytest.raises(Exception, match="1-based"):
        rrf_fuse(runs).materialize()


def test_add_rank_orders_within_block(ray_session):
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [5, 1, 3], "score": [7, 9, 7]})).repartition(3)
    out = (add_rank(ds, ["score", "doc_id"], [True, False])
           .to_pandas().set_index("doc_id"))
    # score desc, id asc: 1 (9), 3 (7), 5 (7)
    assert out.loc[1, "rank"] == 1
    assert out.loc[3, "rank"] == 2
    assert out.loc[5, "rank"] == 3


def test_rrf_grouped_by_query(ray_session):
    runs = pd.DataFrame({
        "query_id": [1, 1, 2, 2],
        "doc_id": [7, 8, 7, 9],
        "rank": [1, 2, 1, 1],
    })
    out = (rrf_fuse(rd.from_pandas(runs), group_cols=("query_id",))
           .to_pandas().set_index(["query_id", "doc_id"]).sort_index())
    assert len(out) == 4
    assert out.loc[(1, 7), "rrf_q6"] == 10**6 // 61
    assert out.loc[(2, 9), "rrf_q6"] == 10**6 // 61
