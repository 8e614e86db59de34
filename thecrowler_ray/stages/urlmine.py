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
