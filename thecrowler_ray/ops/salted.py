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


# ---------------------------------------------------------------------------
# skew-aware join: hot-key split (broadcast the hot slice, hash-join the rest)
# ---------------------------------------------------------------------------


def _pa_fields(ds) -> list[tuple[str, "pa.DataType"]]:
    """(name, arrow type) pairs from a Dataset schema — the base schema
    is a pyarrow.Schema for Arrow blocks but a PandasBlockSchema (numpy
    dtypes) for pandas blocks; normalize both."""
    bs = ds.schema().base_schema
    if isinstance(bs, pa.Schema):
        return [(f.name, f.type) for f in bs]
    out = []
    for n, t in zip(bs.names, bs.types):
        if isinstance(t, pa.DataType):
            out.append((n, t))
        elif str(t) == "object":
            out.append((n, pa.string()))
        else:
            out.append((n, pa.from_numpy_dtype(t)))
    return out


def skew_join(left, right, *, on: str, hot_threshold: int = 1_000_000,
              num_partitions: int | None = None):
    """Inner join resilient to hot keys — the standard skew-join split
    (every production engine's "skew hint", done explicitly):

    1. one salted COUNT over the LEFT side's keys (slim rows; a hot key
       never lands on one reducer — that is ``salted_count``'s job);
    2. keys with count > ``hot_threshold`` become the HOT set (assumed
       small: these are the head of a Zipf tail — pulled to the driver
       and broadcast);
    3. the cold slice takes the normal hash join; the hot slice joins
       by broadcast lookup against the RIGHT rows of hot keys (the
       right side per key must be dim-like/bounded — a hot×hot
       many-to-many join has no non-quadratic answer and raises).

    Results are the union; inner-join semantics, column order
    left-then-right (join-key column once). Right columns must not
    collide with left's (no suffixing — keep the seam honest)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = num_partitions or max(2, min(64, cpus // 2))

    counts = salted_count(left.select_columns([on]), on).materialize()
    hot_ds = counts.filter(expr=f"cnt > {hot_threshold}")
    hot_keys = set()
    for b in hot_ds.iter_batches(batch_format="pyarrow"):
        hot_keys.update(b[on].to_pylist())

    if not hot_keys:
        return left.join(right, join_type="inner",
                         num_partitions=nparts, on=(on,))

    hot_ref = ray.put(hot_keys)

    def split(batch: pa.Table, keep_hot: bool) -> pa.Table:
        hs = ray.get(hot_ref)
        keys = batch[on].to_pylist()
        mask = pa.array([(k in hs) == keep_hot for k in keys])
        return batch.filter(mask)

    left_cold = left.map_batches(
        lambda b: split(b, False), batch_format="pyarrow")
    right_cold = right.map_batches(
        lambda b: split(b, False), batch_format="pyarrow")
    # an all-empty side loses its schema and breaks the hash join (Ray
    # quirk) — left-cold emptiness is free from the count table; the
    # right probe is one slim key pass over the dim-like side
    n_left_cold = counts.filter(expr=f"cnt <= {hot_threshold}").count()
    n_right_cold = right_cold.select_columns([on]).count()
    if n_left_cold == 0 or n_right_cold == 0:
        fields = _pa_fields(left) + [
            (n_, t_) for n_, t_ in _pa_fields(right) if n_ != on]
        cold = ray.data.from_arrow(pa.table(
            {n_: pa.array([], t_) for n_, t_ in fields}))
    else:
        cold = left_cold.join(right_cold, join_type="inner",
                              num_partitions=nparts, on=(on,))

    # hot right slice → broadcast dict key → list of right-row tuples
    right_hot = right.map_batches(
        lambda b: split(b, True), batch_format="pyarrow").materialize()
    rcols = [c for c in right_hot.schema().names if c != on]
    lookup: dict = {}
    n_hot_rows = 0
    for b in right_hot.iter_batches(batch_format="pyarrow"):
        ks = b[on].to_pylist()
        vals = [b[c].to_pylist() for c in rcols]
        n_hot_rows += len(ks)
        for i, k in enumerate(ks):
            lookup.setdefault(k, []).append(tuple(v[i] for v in vals))
    if any(len(v) > 10_000 for v in lookup.values()):
        raise ValueError(
            "skew_join: a hot key is also hot on the right side "
            "(many-to-many hot join) — no bounded broadcast exists")
    lut_ref = ray.put(lookup)

    rtypes = dict(_pa_fields(right_hot))

    def hot_join(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        keys = batch[on].to_pylist()
        idx, rrows = [], []
        for i, k in enumerate(keys):
            for tup in lut.get(k, ()):
                idx.append(i)
                rrows.append(tup)
        taken = batch.take(pa.array(idx, pa.int64()))
        for j, c in enumerate(rcols):
            taken = taken.append_column(
                c, pa.array([t[j] for t in rrows], rtypes[c]))
        return taken

    left_hot = left.map_batches(
        lambda b: split(b, True), batch_format="pyarrow")
    hot = left_hot.map_batches(hot_join, batch_format="pyarrow")
    return cold.union(hot)
