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
        out = []
        for uid, gu in g.groupby("user"):
            st = gu["step"].to_numpy()
            sq = gu["seq"].to_numpy()
            times = np.full(k, -1, dtype=np.int64)
            floor = -(2**62)
            for i in range(k):
                cand = sq[(st == i) & (sq > floor)]
                if len(cand) == 0:
                    break
                times[i] = cand.min()
                floor = times[i]
            row = {"user": np.int64(uid),
                   "steps_completed": np.int64((times >= 0).sum())}
            for i in range(k):
                row[f"t_{i + 1}"] = times[i]
            out.append(row)
        return pd.DataFrame(out)

    return slim.groupby("user").map_groups(resolve,
                                           batch_format="pandas")
