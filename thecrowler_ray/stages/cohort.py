"""Cohort retention over a Ray Data event stream — bucket users by
first-activity period ("cohort week"), then count how many of each
cohort were active again k periods later. The standard growth-
analytics triangle; on the crawl plane it answers "of the sources
first seen in week W, how many still changed in week W+k" (feeding the
adaptive re-crawl scheduler, ``stages/diff.py``).

Semantics (pinned by the SQL twin): period = seq // period_len
(integer floor — seqs are non-negative); cohort(user) = MIN(period);
output one row per (cohort, offset) with n_users = COUNT(DISTINCT
user) active at cohort + offset (offset 0 is the cohort size itself).

Distribution: the event stream reduces per-batch to distinct
(user, period) pairs before ONE groupby(user) min-reduce; the cohort
map then meets the pair stream either as a broadcast LUT (≤ threshold
users) or via a hash join — the ``stages/ngram_lm.py`` threshold
switch. The final histogram is a groupby over slim
(cohort, offset, user) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def cohort_retention(
    ds,
    *,
    user: str = "user_id",
    seq: str = "seq",
    period_len: int,
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Dataset with int64 ``user``/``seq`` (seq ≥ 0) → Dataset
    (cohort, offset, n_users) — the retention triangle."""
    if period_len <= 0:
        raise ValueError("cohort_retention: period_len must be > 0")
    from ray.data.aggregate import Min

    def pairs(batch: pa.Table) -> pa.Table:
        u = batch[user].to_numpy(zero_copy_only=False).astype(np.int64)
        p = (batch[seq].to_numpy(zero_copy_only=False)
             .astype(np.int64) // period_len)
        uniq = np.unique(np.stack([u, p]), axis=1)
        return pa.table({"user": pa.array(uniq[0]),
                         "period": pa.array(uniq[1])})

    up = (ds.select_columns([user, seq])
          .map_batches(pairs, batch_format="pyarrow")
          .groupby(["user", "period"]).count()
          .drop_columns(["count()"])
          .materialize())

    cohorts = (up.groupby("user")
               .aggregate(Min("period", alias_name="cohort"))
               .materialize())

    n_users = cohorts.count()
    if n_users == 0:
        return ray.data.from_arrow(pa.table({
            "cohort": pa.array([], pa.int64()),
            "offset": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64())}))

    if n_users <= broadcast_threshold:
        lut = {}
        for b in cohorts.iter_batches(batch_format="pyarrow"):
            lut.update(zip(b["user"].to_pylist(),
                           b["cohort"].to_pylist()))
        ref = ray.put(lut)

        def attach(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)
            u = batch["user"].to_numpy(zero_copy_only=False)
            p = batch["period"].to_numpy(zero_copy_only=False)
            c = np.fromiter((m[int(x)] for x in u), dtype=np.int64,
                            count=len(u))
            return pa.table({"cohort": pa.array(c),
                             "offset": pa.array(p - c),
                             "user": pa.array(u)})

        triple = up.map_batches(attach, batch_format="pyarrow")
    else:
        from ..stages.ngram_lm import _join_partitions

        joined = up.join(cohorts, join_type="inner",
                         num_partitions=_join_partitions(),
                         on=("user",))

        def derive(batch: pa.Table) -> pa.Table:
            p = batch["period"].to_numpy(zero_copy_only=False)
            c = batch["cohort"].to_numpy(zero_copy_only=False)
            return pa.table({"cohort": pa.array(c.astype(np.int64)),
                             "offset": pa.array((p - c)
                                                .astype(np.int64)),
                             "user": batch["user"]})

        triple = joined.map_batches(derive, batch_format="pyarrow")

    # (user, period) pairs are already distinct -> plain count
    return (triple.groupby(["cohort", "offset"]).count()
            .map_batches(
                lambda b: pa.table({
                    "cohort": b["cohort"],
                    "offset": b["offset"],
                    "n_users": pc.cast(b["count()"], pa.int64())}),
                batch_format="pyarrow"))
