"""URL template mining — collapse URL paths to structural templates
(digit runs → ``{n}``, hex-ish ids → ``{h}``) and count pages per
(host, template). The crawl-scheduler signal the reference's per-source
config can't see: a host serving 10^7 pages of ``/item/{n}/view`` needs
ONE scrape rule and a budget, not 10^7 frontier entries — template
counts are how you find that (same role URL "URL patterns" play in
public sitemap-induction literature).

Semantics (pinned by the regexp_replace twin): templates normalize in
two ordered passes — 16+-char lowercase-hex runs → ``{h}`` first, then
any digit run → ``{n}``. Counting is one groupby over slim
(host, template) rows; per-batch pandas str.replace keeps the regex
vectorized.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

HEX_RE = r"[0-9a-f]{16,}"
NUM_RE = r"[0-9]+"


def template_of(series: pd.Series) -> pd.Series:
    """Vectorized template normalization (the pinned two passes)."""
    return (series.str.replace(HEX_RE, "{h}", regex=True)
            .str.replace(NUM_RE, "{n}", regex=True))


def url_templates(
    ds,
    *,
    host: str = "host",
    path: str = "path",
) -> "ray.data.Dataset":
    """Dataset with string ``host``/``path`` → Dataset
    (host, template, n_pages) sorted by (host, n_pages DESC,
    template)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([host, path]).to_pandas()
        df["template"] = template_of(df[path])
        out = (df.groupby([host, "template"], as_index=False).size()
               .rename(columns={"size": "c"}))
        out["c"] = out["c"].astype("int64")
        return pa.Table.from_pandas(out[[host, "template", "c"]],
                                    preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([host, "template"])
            .aggregate(Sum("c", alias_name="n_pages"))
            .sort([host, "n_pages", "template"],
                  descending=[False, True, False]))


def url_prefix_rollup(
    ds,
    *,
    host: str = "host",
    path: str = "path",
    max_depth: int = 4,
) -> "ray.data.Dataset":
    """Path-hierarchy rollup: every page counts toward each of its
    ancestor path prefixes up to ``max_depth`` segments — the
    site-structure view (pages under /cat-3/, under /cat-3/item/, ...)
    a crawl scheduler budgets by. → Dataset
    (host, prefix, depth, n_pages) sorted (host, depth, n_pages DESC,
    prefix).

    Semantics (pinned by the twin): prefixes are '/'-joined leading
    non-empty segments; depth counts segments (1-based); a page at
    depth d contributes to min(d, max_depth) prefixes. One slim
    (host, prefix) groupby; the per-batch pandas explode is vectorized
    string splitting."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pa.Table:
        df = batch.select([host, path]).to_pandas()
        segs = df[path].str.split("/")
        hosts_out, prefix_out, depth_out = [], [], []
        for h, parts in zip(df[host], segs):
            acc = ""
            d = 0
            for p in parts:
                if not p:
                    continue
                d += 1
                if d > max_depth:
                    break
                acc = acc + "/" + p
                hosts_out.append(h)
                prefix_out.append(acc)
                depth_out.append(d)
        out = pd.DataFrame({host: hosts_out, "prefix": prefix_out,
                            "depth": depth_out})
        out = (out.groupby([host, "prefix", "depth"], as_index=False)
               .size().rename(columns={"size": "c"}))
        return pa.table({
            host: pa.array(out[host].tolist(), pa.string()),
            "prefix": pa.array(out["prefix"].tolist(), pa.string()),
            "depth": pa.array(out["depth"].to_numpy("int64")),
            "c": pa.array(out["c"].to_numpy("int64"))})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby([host, "prefix", "depth"])
            .aggregate(Sum("c", alias_name="n_pages"))
            .sort([host, "depth", "n_pages", "prefix"],
                  descending=[False, False, True, False]))
