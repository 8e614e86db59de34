"""Fixed-point PageRank (ops/pagerank.py): brute-force oracle,
broadcast-vs-join path parity, dangling mass, convergence direction."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.ops.pagerank import (
    DAMP_DEN,
    DAMP_NUM,
    UNIT,
    pagerank,
)


def brute_force(edges: list[tuple[int, int]], iterations=5, unit=UNIT):
    nodes = sorted({n for e in edges for n in e})
    outdeg = {n: 0 for n in nodes}
    for s, _ in edges:
        outdeg[s] += 1
    base = (unit * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    r = {n: unit for n in nodes}
    for _ in range(iterations):
        nxt = {n: base for n in nodes}
        for s, d in edges:
            nxt[d] += (r[s] * DAMP_NUM) // (DAMP_DEN * outdeg[s])
        r = nxt
    return r


EDGES = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (2, 1), (5, 1)]
# node 6 only receives; node 5 dangles after one hop


def _got(ds):
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    return dict(zip(df["node"], df["rank_q"]))


def _edges_ds(edges):
    return rd.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )


def test_matches_brute_force(ray_session):
    got = _got(pagerank(_edges_ds(EDGES)))
    want = brute_force(EDGES)
    assert got == want


def test_join_path_parity(ray_session):
    a = _got(pagerank(_edges_ds(EDGES)))
    b = _got(pagerank(_edges_ds(EDGES), broadcast_threshold=0))
    assert a == b


def test_parallel_edges_are_multiplicity(ray_session):
    # duplicate edge (1,2): node 2 gets double contribution from 1
    single = brute_force([(1, 2), (1, 3)])
    double = brute_force([(1, 2), (1, 2), (1, 3)])
    assert double[2] > single[2]
    got = _got(pagerank(_edges_ds([(1, 2), (1, 2), (1, 3)])))
    assert got == double


def test_hub_ranks_highest(ray_session):
    # star graph: everyone points at 0
    edges = [(i, 0) for i in range(1, 10)]
    got = _got(pagerank(_edges_ds(edges)))
    assert got[0] == max(got.values())
    # spokes have no in-edges: exactly base after iteration 1
    base = (UNIT * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    assert got[3] == base


def test_empty_graph(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"src": pd.Series([], dtype="int64"),
                      "dst": pd.Series([], dtype="int64")})
    )
    assert pagerank(ds).count() == 0


def test_deterministic_across_partitionings(ray_session):
    rng = np.random.default_rng(8)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2))
             if a != b]
    a = _got(pagerank(_edges_ds(edges).repartition(2)))
    b = _got(pagerank(_edges_ds(edges).repartition(11)))
    assert a == b == brute_force(edges)


# -- personalized PageRank -------------------------------------------------

from thecrowler_ray.ops.pagerank import personalized_pagerank


def ppr_brute(edges, seeds, iterations=5, unit=UNIT):
    nodes = sorted({n for e in edges for n in e})
    seeds = set(seeds) & set(nodes)
    outdeg = {n: 0 for n in nodes}
    for s, _ in edges:
        outdeg[s] += 1
    base = (unit * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    r = {n: (unit if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        nxt = {n: (base if n in seeds else 0) for n in nodes}
        for s, d in edges:
            nxt[d] += (r[s] * DAMP_NUM) // (DAMP_DEN * outdeg[s])
        r = nxt
    return r


def test_ppr_matches_brute_force(ray_session):
    got = _got(personalized_pagerank(_edges_ds(EDGES), [1, 4]))
    assert got == ppr_brute(EDGES, [1, 4])


def test_ppr_path_parity(ray_session):
    bc = _got(personalized_pagerank(_edges_ds(EDGES), [2]))
    jn = _got(personalized_pagerank(_edges_ds(EDGES), [2],
                                    broadcast_threshold=0))
    assert bc == jn == ppr_brute(EDGES, [2])


def test_ppr_seed_outside_graph_ignored(ray_session):
    got = _got(personalized_pagerank(_edges_ds(EDGES), [1, 999]))
    assert got == ppr_brute(EDGES, [1])


def test_ppr_unreachable_nodes_get_zero(ray_session):
    # chain 1->2->3->4 seeded at 4: nothing flows backwards, so every
    # non-seed upstream node ends at exactly 0 (the mass-locality pin
    # plain PageRank can't express)
    chain = [(1, 2), (2, 3), (3, 4)]
    got = _got(personalized_pagerank(_edges_ds(chain), [4],
                                     iterations=6))
    assert got[1] == got[2] == got[3] == 0 and got[4] > 0
    assert got == ppr_brute(chain, [4], iterations=6)
