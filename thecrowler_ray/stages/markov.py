"""First-order Markov transition mining over an event stream — the
navigation-graph operator: per user, order events by time and count
(state → next_state) transitions, yielding the empirical transition
matrix (crawl plane: page-type navigation patterns, source lifecycle
hops; product plane: clickstream flows).

Semantics (pinned by the LEAD window twin): (key, seq) ties first
collapse to MIN(state) — same pin as ``stages/cdc.py`` — so per-key
order by seq is total; a transition is each consecutive pair; output
per (from_state, to_state): n (count) and p_ppm = (n · 10^6) //
from-state-total (integer parts-per-million, truncating division over
non-negative ints = floor = DuckDB //).

Distribution: one ``groupby(key)`` shuffle of slim (key, seq, state)
rows emits per-group transition pair partials; ONE further groupby
over (from_state, to_state) sums them; the per-from totals derive
from the same table (no second pass over the stream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

PPM = 10**6


def markov_transitions(
    ds,
    *,
    key: str,
    seq: str,
    state: str,
) -> "ray.data.Dataset":
    """Dataset with int64 ``key``/``seq`` + string ``state`` → Dataset
    (from_state, to_state, n, p_ppm)."""
    from ray.data.aggregate import Sum

    slim = ds.select_columns([key, seq, state])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby([key, seq], as_index=False)[state].min()
             .sort_values([key, seq], kind="mergesort"))
        nxt = g.groupby(key)[state].shift(-1)
        keep = nxt.notna()
        out = pd.DataFrame({
            "from_state": g.loc[keep, state].to_numpy(),
            "to_state": nxt[keep].to_numpy(),
        })
        return (out.groupby(["from_state", "to_state"], as_index=False)
                .size().rename(columns={"size": "n"}))

    from ..ops.gutil import group_by_key_shards

    # pairs() already vectorizes across keys — shard the key so one
    # map_groups call covers a whole shard; its Arrow output feeds the
    # transition-count groupby without the pandas exchange tax
    counts = (group_by_key_shards(slim, key, pairs)
              .groupby(["from_state", "to_state"])
              .aggregate(Sum("n", alias_name="n"))
              .materialize())

    from ..ops.gutil import collect_tables

    totals = {}
    for t in collect_tables(counts.groupby("from_state")
                            .aggregate(Sum("n", alias_name="tot"))):
        totals.update(zip(t["from_state"].to_pylist(),
                          t["tot"].to_pylist()))
    import ray
    tot_ref = ray.put(totals)

    def add_p(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(tot_ref)
        tot = b["from_state"].map(t).to_numpy(np.int64)
        n = b["n"].to_numpy(np.int64)
        b = b.copy()
        b["n"] = n
        b["p_ppm"] = (n * PPM) // tot
        return b

    return counts.map_batches(add_p, batch_format="pandas")
