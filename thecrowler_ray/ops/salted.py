"""Explicit salted groupby for skewed keys.

The combiner helpers in :mod:`thecrowler_ray.ops.agg` pre-reduce per batch
(equivalent to salting by block id). This module is the *explicit* two-phase
form for aggregations whose per-key state is too big to combine per batch or
whose input is already grouped adversarially (north star: "groupby-host
shuffles with explicit salting handle hot-host skew"):

    phase 1: groupby((key, salt)) — a hot key's rows split across
             ``n_salts`` reducers instead of one
    phase 2: groupby(key) over the ≤ n_salts partials per key

Salt derives from a row-content hash (not random) so runs are deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum


def add_salt(batch: pa.Table, key_col: str, n_salts: int, salt_col: str = "_salt") -> pa.Table:
    """Deterministic per-row salt: hash of the row's position-invariant
    content (here: a cheap FNV over the key string + a row counter per key
    within the batch, so equal keys spread across salts)."""
    keys = batch[key_col].to_pylist()
    counts: dict = {}
    salts = np.empty(len(keys), dtype=np.int32)
    for i, k in enumerate(keys):
        c = counts.get(k, 0)
        counts[k] = c + 1
        salts[i] = c % n_salts
    return batch.append_column(salt_col, pa.array(salts, pa.int32()))


def salted_count(ds, key_col: str, out: str = "cnt", n_salts: int = 16):
    """COUNT(*) per key, hot keys split across ``n_salts`` reducers."""
    salted = ds.map_batches(
        lambda t: add_salt(t, key_col, n_salts), batch_format="pyarrow"
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col, "_salt"]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "_salt", out])

    partials = salted.map_batches(partial, batch_format="pyarrow")
    phase1 = partials.groupby([key_col, "_salt"]).aggregate(
        Sum(out, alias_name=out)
    )
    return phase1.groupby(key_col).aggregate(Sum(out, alias_name=out))


def salted_sum(ds, key_col: str, val_col: str, out: str | None = None, n_salts: int = 16):
    out = out or f"sum_{val_col}"
    salted = ds.map_batches(
        lambda t: add_salt(t, key_col, n_salts), batch_format="pyarrow"
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col, "_salt"]).aggregate([(val_col, "sum")])
        return g.rename_columns([key_col, "_salt", out])

    partials = salted.map_batches(partial, batch_format="pyarrow")
    phase1 = partials.groupby([key_col, "_salt"]).aggregate(Sum(out, alias_name=out))
    return phase1.groupby(key_col).aggregate(Sum(out, alias_name=out))
