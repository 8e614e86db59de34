"""Maintenance: correlated-sources lookup (J2) + checkpoint compaction (A5).

- ``correlated_sources``: the reference's plpgsql helper
  (``postgresql-setup.pgsql:2907-2950``) unions domain-substring matches
  across NetInfo ∪ HTTPInfo ∪ WebObjects to find sources related to a
  domain. Here: a broadcast substring filter over the enrichment tables +
  the crawl's search_index, unioned and deduplicated.
- ``compact_waves``: the reference runs VACUUM/REINDEX between polls
  (``cmd/thecrowler/main.go:168-206``); the parquet analog merges the many
  per-wave ``pages`` part-files into one consolidated table directory
  (fewer files → faster reads), leaving the per-wave checkpoint lineage
  untouched.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow as pa
import ray.data


def correlated_sources(domain: str, *, search_index_dir: str | None = None,
                       netinfo_ds=None, httpinfo_ds=None):
    """→ Dataset of (host, found_in) rows whose host or details mention the
    domain substring (case-insensitive), deduplicated by host."""
    import pyarrow.compute as pc

    needle = domain.lower()
    parts = []

    def _match(ds, text_col: str, label: str):
        def fn(t: pa.Table) -> pa.Table:
            hosts = t["host"].to_pylist()
            blobs = t[text_col].to_pylist() if text_col in t.column_names else hosts
            keep_h = [
                h for h, b in zip(hosts, blobs)
                if needle in (h or "").lower() or needle in (b or "").lower()
            ]
            return pa.table(
                {
                    "host": pa.array(keep_h, pa.string()),
                    "found_in": pa.array([label] * len(keep_h), pa.string()),
                }
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    if netinfo_ds is not None:
        parts.append(_match(netinfo_ds, "netinfo", "netinfo"))
    if httpinfo_ds is not None:
        parts.append(_match(httpinfo_ds, "httpinfo", "httpinfo"))
    if search_index_dir is not None:
        si = ray.data.read_parquet(search_index_dir, columns=["host", "url"])
        parts.append(_match(si, "url", "web_objects"))
    if not parts:
        raise ValueError("no sources given")
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.union(p)

    import pandas as pd

    def first_per_host_shard(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every host in the shard — one call per host
        # is a scheduler round-trip per distinct host at web scale
        g = g.sort_values(["host", "found_in"], kind="mergesort")
        return g.drop_duplicates(subset=["host"], keep="first")

    from ..ops.gutil import group_by_key_shards

    return group_by_key_shards(unioned, "host", first_per_host_shard)


def compact_waves(run_dir: str, out_dir: str | None = None) -> dict:
    """Merge all per-wave pages part-files into one consolidated parquet
    directory; write a compaction manifest. → {files_before, files_after,
    rows}."""
    out_dir = out_dir or os.path.join(run_dir, "pages_compacted")
    files = sorted(glob.glob(os.path.join(run_dir, "wave=*", "pages", "*.parquet")))
    if not files:
        return {"files_before": 0, "files_after": 0, "rows": 0}
    ds = ray.data.read_parquet(files)
    rows = ds.count()
    # compaction REPLACES its derived output: write_parquet appends
    # uniquely-named files, so re-running into a stale dir would
    # silently duplicate every row (idempotent-overwrite is the
    # resumable-restart contract)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    # one file per ~100k rows
    ds.repartition(max(1, rows // 100_000 + 1)).write_parquet(out_dir)
    after = len(glob.glob(os.path.join(out_dir, "*.parquet")))
    manifest = {
        "files_before": len(files),
        "files_after": after,
        "rows": rows,
        "source_waves": sorted(
            {os.path.basename(os.path.dirname(os.path.dirname(f))) for f in files}
        ),
    }
    # manifest lives NEXT TO the parquet dir so dataset readers of the
    # directory never trip over a non-parquet file
    with open(out_dir.rstrip("/") + ".compaction.json", "w") as f:
        json.dump(manifest, f, indent=1)
    return {k: manifest[k] for k in ("files_before", "files_after", "rows")}
