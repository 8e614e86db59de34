"""kNN graph (stages/similarity.py): brute-force vs numpy oracle, IVF
parity at n_centroids=1, recall sanity, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.stages.similarity import knn_graph, knn_graph_ivf


def _vecs(n=60, d=16, seed=2):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(rng.normal(size=(n, d)).astype(np.float32)),
        }
    )


def _oracle(df, k):
    m = np.asarray(df["embedding"].to_list(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    rows = []
    for i in range(len(df)):
        order = sorted(
            (j for j in range(len(df)) if j != i),
            key=lambda j: (-sims[i, j], j),
        )[:k]
        for j in order:
            rows.append((i, j, round(sims[i, j], 4)))
    return pd.DataFrame(rows, columns=["src", "dst", "cosine"])


def _sorted(df):
    return df.sort_values(["src", "dst"]).reset_index(drop=True)


def test_brute_matches_oracle(ray_session):
    df = _vecs()
    got = _sorted(knn_graph(rd.from_pandas(df).repartition(4), k=5)
                  .to_pandas())
    want = _sorted(_oracle(df, 5))
    pd.testing.assert_frame_equal(
        got.astype({"src": "int64", "dst": "int64"}), want
    )


def test_ivf_single_centroid_parity(ray_session):
    df = _vecs()
    brute = _sorted(knn_graph(rd.from_pandas(df), k=4).to_pandas())
    ivf = _sorted(
        knn_graph_ivf(rd.from_pandas(df), k=4, n_centroids=1).to_pandas()
    )
    pd.testing.assert_frame_equal(
        ivf.astype(brute.dtypes.to_dict())[brute.columns], brute
    )


def test_ivf_recall_is_reasonable(ray_session):
    df = _vecs(n=200, d=8, seed=4)
    brute = knn_graph(rd.from_pandas(df), k=3).to_pandas()
    ivf = knn_graph_ivf(rd.from_pandas(df), k=3, n_centroids=4).to_pandas()
    b = set(zip(brute["src"], brute["dst"]))
    v = set(zip(ivf["src"], ivf["dst"]))
    recall = len(b & v) / len(b)
    assert recall > 0.5  # bucketed graph keeps most true edges


def test_max_rows_guard(ray_session):
    df = _vecs(n=30)
    with pytest.raises(ValueError):
        knn_graph(rd.from_pandas(df), k=2, max_rows=10)


def test_each_node_has_k_edges(ray_session):
    df = _vecs(n=25)
    got = knn_graph(rd.from_pandas(df), k=6).to_pandas()
    counts = got.groupby("src").size()
    assert (counts == 6).all()
    assert (got["src"] != got["dst"]).all()


def test_boundary_ties_keep_smallest_dst(ray_session):
    """Duplicate embeddings create exact cosine ties straddling rank k:
    the winner must be the smallest dst (the SQL twin's row_number
    contract), not an argpartition artifact."""
    import numpy as np

    base = np.array([1.0, 0.0, 0.0, 0.0], dtype=np.float32)
    other = np.array([0.0, 1.0, 0.0, 0.0], dtype=np.float32)
    # ids 1..5 all identical (cosine 1.0 with each other), id 0 distinct
    df = pd.DataFrame(
        {
            "vec_id": np.arange(6, dtype=np.int64),
            "embedding": [other] + [base] * 5,
        }
    )
    got = knn_graph(rd.from_pandas(df), k=2).to_pandas()
    for src in range(1, 6):
        dsts = sorted(got.loc[got["src"] == src, "dst"])
        want = sorted([d for d in range(1, 6) if d != src])[:2]
        assert dsts == want, (src, dsts)


def test_semantic_dedup_clusters(ray_session):
    """SemDeDup: engineered near-identical groups collapse to min-id
    representatives; singletons keep themselves."""
    import numpy as np

    from thecrowler_ray.stages.similarity import semantic_dedup

    rng = np.random.default_rng(5)
    base_a = rng.normal(size=8)
    base_b = rng.normal(size=8)
    vecs = (
        [base_a + rng.normal(scale=1e-3, size=8) for _ in range(3)]  # 0-2
        + [base_b + rng.normal(scale=1e-3, size=8) for _ in range(2)]  # 3-4
        + [rng.normal(size=8) for _ in range(4)]  # 5-8 singles
    )
    df = pd.DataFrame(
        {"vec_id": np.arange(9, dtype=np.int64),
         "embedding": [v.astype(np.float32) for v in vecs]}
    )
    got = (semantic_dedup(rd.from_pandas(df), tau=0.95)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert got["cluster_id"].tolist()[:5] == [0, 0, 0, 3, 3]
    assert got["keep"].tolist()[:5] == [True, False, False, True, False]
    # singletons all keep themselves
    assert got["keep"].tolist()[5:] == [True] * 4
    assert (got.loc[5:, "cluster_id"] == got.loc[5:, "vec_id"]).all()


def test_cosine_edges_threshold_and_order(ray_session):
    import numpy as np

    from thecrowler_ray.stages.similarity import cosine_edges

    df = pd.DataFrame(
        {"vec_id": np.arange(3, dtype=np.int64),
         "embedding": [np.array([1, 0], dtype=np.float32),
                       np.array([1, 0.01], dtype=np.float32),
                       np.array([0, 1], dtype=np.float32)]}
    )
    got = (cosine_edges(rd.from_pandas(df), 0.9)
           .to_pandas().sort_values(["doc_a", "doc_b"]))
    assert list(zip(got["doc_a"], got["doc_b"])) == [(0, 1)]
