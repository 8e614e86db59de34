"""Market-basket pair mining (frequent itemsets at size 2) — support
counts for item pairs co-occurring in a basket: co-ordered parts,
co-cited links, keywords co-occurring in a page. The canonical
association-mining primitive (Agrawal & Srikant 1994's Apriori at
k = 2, which is the only level that survives web scale without
candidate pruning).

Semantics (pinned by the self-join twin): items dedupe within a
basket; a pair is the unordered (x < y) combination; support = number
of baskets containing both; output the top-k by
(support DESC, x ASC, y ASC).

Scale note: pair explosion is quadratic in basket SIZE, not corpus
size — per-basket cost caps at |basket|²/2 inside the one
``groupby(basket)``; the pair stream then collapses through a slim
(x, y) count groupby. Skewed giant baskets want a basket-size cap
upstream (same reasoning as the O(√E) wedge bound in
``ops/triangles.py``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def pair_support(
    ds,
    *,
    basket: str,
    item: str,
    k: int = 100,
) -> "ray.data.Dataset":
    """Dataset with int64 ``basket``/``item`` → Dataset (x, y, support)
    — the k most-supported unordered item pairs."""
    from ray.data.aggregate import Sum

    slim = ds.select_columns([basket, item])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, gu in g.groupby(basket):
            p = np.unique(gu[item].to_numpy())
            if len(p) < 2:
                continue
            iu, ju = np.triu_indices(len(p), 1)
            out.append(pd.DataFrame({"x": p[iu], "y": p[ju]}))
        if not out:
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        df = pd.concat(out, ignore_index=True)
        # in-group combine before the shuffle
        return (df.groupby(["x", "y"], as_index=False).size()
                .rename(columns={"size": "c"}))

    return (slim.groupby(basket).map_groups(pairs,
                                            batch_format="pandas")
            .groupby(["x", "y"]).aggregate(Sum("c",
                                               alias_name="support"))
            .sort(["support", "x", "y"],
                  descending=[True, False, False])
            .limit(k))
