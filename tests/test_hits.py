"""HITS (ops/hits.py): brute-force integer oracle, broadcast-vs-join
path parity, ranking sanity on a hub/authority-structured graph."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.ops.hits import UNIT, hits


def brute_force(edges, iterations=5, unit=UNIT):
    nodes = sorted({n for e in edges for n in e})

    def rescale(vec):
        m = max(vec.values(), default=0)
        d = max((m + unit - 1) // unit, 1)
        return {n: v // d for n, v in vec.items()}

    h = {n: unit for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(iterations):
        a = {n: 0 for n in nodes}
        for s, d in edges:
            a[d] += h[s]
        a = rescale(a)
        h = {n: 0 for n in nodes}
        for s, d in edges:
            h[s] += a[d]
        h = rescale(h)
    return a, h


# directed, with a clear hub (1 links to everything) and a clear
# authority (5 linked from everywhere); 7 is isolated-ish (only out)
EDGES = [(1, 5), (1, 6), (1, 4), (2, 5), (3, 5), (4, 5), (2, 6), (7, 6),
         (1, 5)]  # parallel edge counts as multiplicity


def _edges_ds(edges):
    return rd.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64"))


def _got(ds):
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    return (dict(zip(df["node"], df["auth_q"])),
            dict(zip(df["node"], df["hub_q"])))


@pytest.mark.parametrize("threshold", [2_000_000, 0])
def test_hits_matches_brute_force(ray_session, threshold):
    got_a, got_h = _got(hits(_edges_ds(EDGES),
                             broadcast_threshold=threshold))
    want_a, want_h = brute_force(EDGES)
    assert got_a == want_a
    assert got_h == want_h


def test_hits_ranking_structure(ray_session):
    a, h = _got(hits(_edges_ds(EDGES)))
    # node 5 is the strongest authority, node 1 the strongest hub
    assert max(a, key=a.get) == 5
    assert max(h, key=h.get) == 1
    # pure hubs have zero authority; pure authorities zero hub score
    assert a[7] == 0 and a[1] == 0
    assert h[5] == 0 and h[6] == 0


def test_hits_random_parity(ray_session):
    rng = np.random.default_rng(11)
    edges = [(int(s), int(d)) for s, d in
             zip(rng.integers(0, 30, 150), rng.integers(0, 30, 150))
             if s != d]
    got_b = _got(hits(_edges_ds(edges)))
    got_j = _got(hits(_edges_ds(edges), broadcast_threshold=0))
    want = brute_force(edges)
    assert got_b == (want[0], want[1])
    assert got_j == got_b


def test_hits_empty(ray_session):
    out = hits(_edges_ds([]).filter(lambda r: False)).to_pandas()
    assert len(out) == 0
