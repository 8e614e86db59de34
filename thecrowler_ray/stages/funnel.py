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

    INT64_MIN = np.iinfo(np.int64).min
    INT64_MAX = np.iinfo(np.int64).max

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across users: k chained scatter-mins (k is the
        # funnel length, a small constant), floors carried per user —
        # never a Python loop over users. Everything stays int64: a
        # float64 detour (reindex/fillna/np.inf) silently loses
        # precision for seq beyond 2^53 (epoch-nanosecond sequence
        # numbers are in-contract). Stalled users carry the sentinel
        # floor INT64_MAX — ``seq > INT64_MAX`` is unsatisfiable, which
        # IS the break semantics.
        users = np.unique(g["user"].to_numpy())
        nu = len(users)
        floor = np.full(nu, INT64_MIN, dtype=np.int64)
        seqs = g["seq"].to_numpy().astype(np.int64, copy=False)
        steps_col = g["step"].to_numpy()
        uidx_all = np.searchsorted(users, g["user"].to_numpy())
        out = pd.DataFrame({"user": users.astype(np.int64)})
        completed = np.zeros(nu, dtype=np.int64)
        tcols = []
        for i in range(k):
            sel = steps_col == i
            uidx, sv = uidx_all[sel], seqs[sel]
            if i:
                ok = sv > floor[uidx]
                uidx, sv = uidx[ok], sv[ok]
            # step 0 takes every event (no strictly-greater filter:
            # seq == INT64_MIN must still count)
            t = np.full(nu, INT64_MAX, dtype=np.int64)
            np.minimum.at(t, uidx, sv)
            present = np.zeros(nu, dtype=bool)
            present[uidx] = True
            completed += present
            tcols.append(np.where(present, t, np.int64(-1)))
            floor = np.where(present, t, INT64_MAX)
        out["steps_completed"] = completed
        for i, t in enumerate(tcols):
            out[f"t_{i + 1}"] = t
        return out

    from ..ops.gutil import group_by_key_shards

    return group_by_key_shards(slim, "user", resolve)
