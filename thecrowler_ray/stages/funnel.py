"""Ordered funnel analysis over a Ray Data event stream — for each
user, how far through a fixed step sequence (e.g. view → click →
purchase) did they progress, where step i+1 counts only STRICTLY AFTER
the completion time of step i. The standard product-analytics operator
(Amplitude/Mixpanel funnels); on the crawl plane it measures source
lifecycles (discovered → fetched → indexed).

Semantics (pinned by the chained-MIN SQL twin): t1 = MIN(seq) over
step-1 events; t_{i+1} = MIN(seq) over step-(i+1) events with
seq > t_i; steps_completed = largest i with t_i defined; undefined
times report -1. MIN makes ties deterministic.

Distribution: one ``groupby(user)`` shuffle of slim
(user, step_idx, seq) rows — events not matching any step are dropped
before the shuffle; each group resolves the chain with numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def funnel(
    ds,
    steps: list[str],
    *,
    user: str = "user_id",
    event: str = "event_type",
    seq: str = "seq",
) -> "ray.data.Dataset":
    """Dataset with int64 ``user``/``seq`` + string ``event`` →
    Dataset (user, steps_completed, t_1..t_k): per-user strictly-
    ordered funnel completion times (-1 where the funnel stalled)."""
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    step_idx = {s: i for i, s in enumerate(steps)}
    k = len(steps)

    def prep(batch: pa.Table) -> pa.Table:
        df = batch.select([user, event, seq]).to_pandas()
        df["step"] = df[event].map(step_idx)
        df = df[df["step"].notna()]
        return pa.table({
            "user": pa.array(df[user].to_numpy(np.int64)),
            "step": pa.array(df["step"].to_numpy(np.int64)),
            "seq": pa.array(df[seq].to_numpy(np.int64)),
        })

    slim = ds.map_batches(prep, batch_format="pyarrow")

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across users: k chained groupby-mins (k is the
        # funnel length, a small constant), floors carried per user —
        # never a Python loop over users
        users = np.unique(g["user"].to_numpy())
        floor = pd.Series(-(2 ** 62), index=users, dtype="float64")
        times: list[pd.Series] = []
        for i in range(k):
            gi = g[g["step"] == i]
            f = floor.loc[gi["user"]].to_numpy()
            gi = gi[gi["seq"].to_numpy() > f]
            col = gi.groupby("user")["seq"].min().reindex(users)
            times.append(col.fillna(-1).astype("int64"))
            # a stalled user blocks every later step (break semantics)
            floor = col.fillna(np.inf)
        out = pd.DataFrame({"user": users.astype(np.int64)})
        completed = np.zeros(len(users), dtype=np.int64)
        for i in range(k):
            completed += (times[i].to_numpy() >= 0).astype(np.int64)
            out[f"t_{i + 1}"] = times[i].to_numpy()
        out.insert(1, "steps_completed", completed)
        return out

    from ..ops.gutil import group_by_key_shards

    return group_by_key_shards(slim, "user", resolve)
