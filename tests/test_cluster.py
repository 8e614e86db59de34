"""Distributed connected components (large-star/small-star) over candidate
pairs: chains, merged components, randomized parity vs union-find."""

import numpy as np
import pytest
import ray.data


def _cc(pairs_rows, **kw):
    from thecrowler_ray.stages.cluster import connected_components

    ds = ray.data.from_items(pairs_rows)
    out = connected_components(ds, **kw).to_pandas()
    if out.empty:  # ray to_pandas drops columns on empty datasets
        return {}
    return dict(zip(out["node"].astype(int), out["label"].astype(int)))


def _union_find(pairs):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component min as canonical label
    labels = {}
    for n in parent:
        labels[n] = find(n)
    return labels


@pytest.mark.parametrize("thresh", [2_000_000, 0],
                         ids=["driver-path", "star-rounds"])
def test_chain_collapses_to_min(thresh):
    # a 17-node chain: worst case for naive propagation, O(log n) for stars
    pairs = [{"doc_a": i, "doc_b": i + 1} for i in range(16)]
    got = _cc(pairs, driver_threshold=thresh)
    assert got == {i: 0 for i in range(17)}


def test_two_components_and_duplicate_edges():
    pairs = [
        {"doc_a": 5, "doc_b": 9}, {"doc_a": 9, "doc_b": 5},
        {"doc_a": 9, "doc_b": 7}, {"doc_a": 7, "doc_b": 7},  # self loop
        {"doc_a": 20, "doc_b": 30},
    ]
    got = _cc(pairs)
    assert got == {5: 5, 7: 5, 9: 5, 20: 20, 30: 20}
    assert _cc(pairs, driver_threshold=0) == got


def test_randomized_parity_with_union_find():
    rng = np.random.default_rng(11)
    n = 80
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(120, 2))
             if a != b]
    rows = [{"doc_a": a, "doc_b": b} for a, b in edges]
    want = _union_find(edges)
    # both the driver union-find fast path and the distributed star rounds
    assert _cc(rows) == want
    assert _cc(rows, driver_threshold=0) == want


def test_empty_pairs():
    # only a self loop → no edges, on both paths
    got = _cc([{"doc_a": 1, "doc_b": 1}])
    assert got == {}
    assert _cc([{"doc_a": 1, "doc_b": 1}], driver_threshold=0) == {}


def test_nonconvergence_guard():
    from thecrowler_ray.stages.cluster import connected_components

    ds = ray.data.from_items([{"doc_a": 0, "doc_b": 1}])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ds, max_rounds=0, driver_threshold=0)
