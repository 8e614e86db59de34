"""Triangle counting (ops/triangles.py): brute-force oracle on random
graphs, broadcast-vs-join parity, dirty-input canonicalization."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.ops.triangles import triangle_counts


def brute_force(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _ds(edges):
    return rd.from_pandas(
        pd.DataFrame(edges, columns=["x", "y"]).astype("int64"))


def _got(ds):
    df = ds.to_pandas()
    if df.empty:  # empty to_pandas drops columns (Ray quirk)
        return {}
    return dict(zip(df["node"], df["triangles"]))


def test_k4_plus_tail(ray_session):
    # K4 (4 triangles, each node in 3) + a tail edge (no triangle)
    edges = list(itertools.combinations([1, 2, 3, 4], 2)) + [(4, 5)]
    got = _got(triangle_counts(_ds(edges)))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_dirty_input_canonicalized(ray_session):
    # duplicates, reversed orientation, self-loops — one triangle
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    got = _got(triangle_counts(_ds(edges)))
    assert got == {1: 1, 2: 1, 3: 1}


@pytest.mark.parametrize("threshold", [2_000_000, 0])
def test_random_graph_vs_brute_force(ray_session, threshold):
    rng = np.random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 25, 160), rng.integers(0, 25, 160))]
    got = _got(triangle_counts(_ds(edges), broadcast_threshold=threshold))
    assert got == brute_force(edges)


def test_no_triangles(ray_session):
    got = _got(triangle_counts(_ds([(1, 2), (3, 4), (2, 3)])))
    assert got == {}


def test_pre_canonical_and_return_degrees(ray_session):
    # pre_canonical on an already-canonical set must match the default
    # path, and the returned degree table must equal the true degrees
    edges = list(itertools.combinations([1, 2, 3, 4], 2)) + [(4, 5)]
    canon = sorted({tuple(sorted(e)) for e in edges})
    tri, deg = triangle_counts(_ds(canon), pre_canonical=True,
                               return_degrees=True)
    assert _got(tri) == {1: 3, 2: 3, 3: 3, 4: 3}
    dd = deg.to_pandas()
    assert dict(zip(dd["node"], dd["deg"])) == {1: 3, 2: 3, 3: 3, 4: 4,
                                               5: 1}


def test_reciprocity_path_parity(ray_session):
    # broadcast path (default threshold) and distributed self-join path
    # (threshold=0) must agree bit-for-bit on the same input
    from thecrowler_ray.pipelines.queries import q_reciprocity

    sf = "/root/testdata/sf0.001"
    a = q_reciprocity(sf)
    b = q_reciprocity(sf, broadcast_threshold=0)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_assortativity_path_parity(ray_session):
    # degree-LUT broadcast path vs distributed double-join path
    from thecrowler_ray.pipelines.queries import q_assortativity

    sf = "/root/testdata/sf0.001"
    a = q_assortativity(sf)
    b = q_assortativity(sf, broadcast_threshold=0)
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True))


def test_host_rank_path_parity(ray_session):
    # doc→host LUT broadcast path vs distributed double-join path
    from thecrowler_ray.pipelines.queries import q_host_rank

    sf = "/root/testdata/sf0.001"
    a = q_host_rank(sf).to_pandas()
    b = q_host_rank(sf, broadcast_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_clustering_coef_path_parity(ray_session):
    # degree-LUT broadcast path vs distributed join path
    from thecrowler_ray.pipelines.queries import q_clustering_coef

    sf = "/root/testdata/sf0.001"
    a = q_clustering_coef(sf).to_pandas()
    b = q_clustering_coef(sf, broadcast_threshold=0).to_pandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True))
