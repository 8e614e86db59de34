"""Snapshot diff — the re-crawl delta operator.

A recurring crawl produces successive corpus snapshots; scheduling and
freshness analytics need the delta: which documents were added, removed,
changed, or unchanged between two snapshots, and the per-source change
rate (the signal the reference's ``update_sources`` re-crawl windows act
on, ``pkg/database/source.go`` — here computed as a data op over the
snapshots themselves rather than tracked row-by-row in a DB).

Scale shape: each side is reduced to slim ``(id, content_md5, carry)``
rows inside ``map_batches`` (the text never shuffles); one hash
``full_outer`` join on the id compares the sides; status is a pure
per-row function of null-ness and hash equality. Per-source rollups are
one further groupby over (source, status) partial counts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _hash_rows(ds, *, id_col: str, text_col: str, carry_cols: tuple,
               suffix: str):
    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        hs = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
              for t in texts]
        cols = {id_col: batch[id_col], "h" + suffix: pa.array(hs, pa.string())}
        for c in carry_cols:
            cols[c + suffix] = batch[c]
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def snapshot_diff(old_ds, new_ds, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  carry_cols: tuple = ("source",),
                  num_partitions: int | None = None):
    """Dataset of ``(id, carry..., status)`` with status one of
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both, different content hash), ``unchanged``. Carried columns are
    coalesced new-side-first so removed docs keep their old metadata."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = num_partitions or max(2, min(64, cpus // 2))
    o = _hash_rows(old_ds, id_col=id_col, text_col=text_col,
                   carry_cols=carry_cols, suffix="_old")
    n = _hash_rows(new_ds, id_col=id_col, text_col=text_col,
                   carry_cols=carry_cols, suffix="_new")
    j = n.join(o, join_type="full_outer", num_partitions=nparts,
               on=(id_col,))

    def status(batch: pa.Table) -> pa.Table:
        hn = batch["h_new"].to_pylist()
        ho = batch["h_old"].to_pylist()
        st = [
            "added" if o is None else
            "removed" if n_ is None else
            "unchanged" if n_ == o else "changed"
            for n_, o in zip(hn, ho)
        ]
        cols = {id_col: batch[id_col],
                "status": pa.array(st, pa.string())}
        for c in carry_cols:
            new_side = batch[c + "_new"].to_pylist()
            old_side = batch[c + "_old"].to_pylist()
            cols[c] = pa.array(
                [a if a is not None else b
                 for a, b in zip(new_side, old_side)], pa.string())
        return pa.table(cols)

    return j.map_batches(status, batch_format="pyarrow")


def change_rates(diff_ds, *, group_col: str = "source"):
    """Per-group (group, n_added, n_removed, n_changed, n_unchanged,
    change_rate) rollup over a ``snapshot_diff`` result — one groupby
    over partial (group, status) counts."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": batch[group_col].to_pylist(),
            "s": batch["status"].to_pylist(),
        })
        piv = (df.groupby(["g", "s"]).size().unstack(fill_value=0)
               .reindex(columns=["added", "removed", "changed",
                                 "unchanged"], fill_value=0)
               .reset_index())
        return pa.table({
            group_col: pa.array(piv["g"], pa.string()),
            "n_added": pa.array(piv["added"].astype(np.int64)),
            "n_removed": pa.array(piv["removed"].astype(np.int64)),
            "n_changed": pa.array(piv["changed"].astype(np.int64)),
            "n_unchanged": pa.array(piv["unchanged"].astype(np.int64)),
        })

    agg = (diff_ds.map_batches(partial, batch_format="pyarrow")
           .groupby(group_col)
           .aggregate(Sum("n_added", alias_name="n_added"),
                      Sum("n_removed", alias_name="n_removed"),
                      Sum("n_changed", alias_name="n_changed"),
                      Sum("n_unchanged", alias_name="n_unchanged")))

    def rate(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["n_added"], dtype=np.int64)
        r = np.asarray(batch["n_removed"], dtype=np.int64)
        c = np.asarray(batch["n_changed"], dtype=np.int64)
        u = np.asarray(batch["n_unchanged"], dtype=np.int64)
        tot = np.maximum(a + r + c + u, 1)
        return batch.append_column(
            "change_rate",
            pa.array(np.round((a + r + c) / tot, 6), pa.float64()))

    return agg.map_batches(rate, batch_format="pyarrow")


def recrawl_intervals(rates_ds, *, group_col: str = "source",
                      base_interval_s: int = 86_400,
                      min_interval_s: int = 3_600,
                      max_interval_s: int = 2_592_000):
    """Adaptive re-crawl interval per source from one snapshot delta —
    the Cho & Garcia-Molina (2003) Poisson change-rate estimator
    (public method): with n surviving docs observed and u unchanged,
    ``λ̂ = −ln((u + 0.5) / (n + 0.5))`` changes per base interval; the
    next interval is ``base / λ̂`` clamped to [min, max]. The reference
    drives re-crawl from fixed per-source windows
    (``pkg/database/source.go`` update_sources); this derives the
    window from observed change behaviour instead.

    **Fixed point**: ``lambda_q6 = floor(−ln((u+0.5)/(n+0.5))·10^6+0.5)``
    — ln of a ratio of exactly-representable halves (both sides compute
    ``(2u+1)/(2n+1)``, an exact-int ratio, the ngram_lm portability
    contract); ``next_interval_s = clamp(base·10^6 // max(λ_q6, 1))``
    stays integer. Removed/added docs don't enter n (they have no
    change observation); n = changed + unchanged survivors."""
    def interval(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["n_changed"], dtype=np.int64)
        u = np.asarray(batch["n_unchanged"], dtype=np.int64)
        n = c + u
        lam = np.floor(
            -np.log((2 * u + 1).astype(np.float64)
                    / (2 * n + 1).astype(np.float64)) * 1_000_000 + 0.5
        ).astype(np.int64)
        nxt = (base_interval_s * 1_000_000) // np.maximum(lam, 1)
        nxt = np.clip(nxt, min_interval_s, max_interval_s)
        return pa.table({
            group_col: batch[group_col],
            "n_observed": pa.array(n),
            "lambda_q6": pa.array(lam),
            "next_interval_s": pa.array(nxt.astype(np.int64)),
        })

    return rates_ds.map_batches(interval, batch_format="pyarrow")
