"""End-to-end training-set export — the flagship composition of the
training-data plane.

documents → Gopher admission (``gopher_filter_stage``) → exact content
dedup (md5, keep min doc_id) → deterministic shuffle + hash split
(``ops/shuffle.py``) → sequence packing of the train split (global
exclusive prefix scan of token counts in shuffle order, ``ops/prefix.py``)
→ partitioned, resumable parquet (one directory per split + a JSON
manifest).

Scale shape:
- admission + hashing are one streaming map over the text; the text
  itself never shuffles — dedup moves (md5, doc_id) 48-byte rows and the
  split placement moves (doc_id, tokens) slim rows that ride the one
  placement groupby (winners are materialized once; no re-execution, no
  join).
- packing runs only on the train split (bins are training-sequence
  budgets) as one two-level scan over materialized slim rows.
- the write is one directory per split; a re-run skips splits already
  recorded in ``manifest.json`` (per-split lineage: row count, token sum,
  config echo), so a failed export resumes instead of restarting.

The reference engine has no training-export analog (its sinks are the
index DB writers, ``pkg/database``); this is part of the
large-scale-training-data plane this repo adds on top, with every step
SQL-replayable (★ ``q_training_export``).
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import ray.data

from ..ops.prefix import exclusive_prefix_sum
from ..ops.shuffle import global_shuffle_split
from ..stages.text_analysis import gopher_filter_stage

_WINDOW_DEFAULT = 2048


# admission predicates over gopher_filter_stage's rule flags. "gopher" is
# the full Rae et al. battery; "no_stop" drops the stop-word rule — the
# deterministic test corpus contains no English stop words at all, so the
# full battery admits zero rows there (export still exercises every stage)
_ADMISSION_RULES = {
    "gopher": ("rule_len", "rule_wl", "rule_sym", "rule_alpha", "rule_stop"),
    "no_stop": ("rule_len", "rule_wl", "rule_sym", "rule_alpha"),
}


def _admit_and_hash(
    batch: pd.DataFrame, admission: str = "no_stop"
) -> pd.DataFrame:
    """One text pass: Gopher signals + content md5 + token count; only
    admitted rows leave (slim columns — the text stays behind)."""
    g = gopher_filter_stage(batch)
    keep = (
        g[list(_ADMISSION_RULES[admission])].min(axis=1).to_numpy() == 1
    )
    texts = batch["text"].fillna("").to_numpy()
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in texts[keep]]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy()[keep],
            "content_md5": md5s,
            "ws_tokens": g["n_words"].to_numpy()[keep],
        }
    )


def _dedup_winners(slim: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact content dedup over admitted rows: per md5, the minimum doc_id
    survives (one groupby over 48-byte rows)."""

    def first_win_shard(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every md5 in the shard (one map_groups call
        # per unique document would be a scheduler round-trip per doc)
        g = g.sort_values(["content_md5", "doc_id"], kind="mergesort")
        return g.drop_duplicates(subset=["content_md5"], keep="first")[
            ["doc_id", "ws_tokens"]]

    from ..ops.gutil import group_by_key_shards

    return group_by_key_shards(slim, "content_md5", first_win_shard)


def _near_dup_losers(ds: "ray.data.Dataset",
                     keep_ids: "ray.data.Dataset",
                     threshold: float = 0.8, k: int = 3,
                     pair_cap: int = 2_000_000) -> set:
    """Verified MinHash near-dup clustering over the admitted winners:
    LSH candidate pairs are CONFIRMED by exact k-shingle Jaccard ≥
    ``threshold`` before clustering — band collisions between dissimilar
    documents must never delete training data. Every doc that is not its
    (verified) cluster's minimum id is a loser.

    Verification runs driver-side over the candidate set (the
    connected-components threshold-switch doctrine): pairs and the texts
    of PAIR ENDPOINTS ONLY are pulled once, bounded by ``pair_cap``
    (candidates are collision survivors, orders of magnitude smaller than
    the corpus). Above the cap the export refuses rather than silently
    degrading — shard the corpus or raise the LSH precision first."""
    from ..stages.cluster import _driver_union_find
    from ..stages.dedup import minhash_candidate_pairs, ngram_jaccard

    keep = keep_ids.join(ds, join_type="inner", num_partitions=8,
                         on=("doc_id",)).materialize()
    pairs = minhash_candidate_pairs(keep).to_pandas()
    if pairs.empty:
        return set()
    if len(pairs) > pair_cap:
        raise ValueError(
            f"{len(pairs)} candidate pairs exceed pair_cap={pair_cap}; "
            "shard the corpus or raise LSH precision before near-dup "
            "export")
    cand = set(pairs["doc_a"].astype(int)) | set(pairs["doc_b"].astype(int))

    import ray as _ray

    cand_ref = _ray.put(cand)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        ids = _ray.get(cand_ref)
        m = df["doc_id"].isin(ids)
        return df.loc[m, ["doc_id", "text"]]

    texts = dict(
        keep.map_batches(pick, batch_format="pandas")
        .to_pandas().itertuples(index=False, name=None)
    )
    verified_a, verified_b = [], []
    for a, b in zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)):
        if ngram_jaccard(texts.get(a, ""), texts.get(b, ""), k=k) \
                >= threshold:
            verified_a.append(a)
            verified_b.append(b)
    if not verified_a:
        return set()
    import numpy as np

    labels = _driver_union_find(
        np.asarray(verified_a, dtype=np.int64),
        np.asarray(verified_b, dtype=np.int64),
    ).to_pandas()
    return set(labels.loc[labels["node"] != labels["label"], "node"]
               .astype(int).tolist())


def training_survivors(
    ds: "ray.data.Dataset", *, seed: str = "s0", admission: str = "no_stop",
    near_dup: bool = False,
) -> "ray.data.Dataset":
    """→ (doc_id, ws_tokens, shuffle_key, pos, split) for every admitted,
    deduplicated document. ``near_dup=True`` additionally drops MinHash
    near-duplicate cluster members (cluster-min survives), chaining the
    ★-tested pair/cluster machinery into the export."""
    slim = ds.map_batches(
        lambda df: _admit_and_hash(df, admission), batch_format="pandas"
    )
    # materialize: the placement consumes winners twice (bucket totals +
    # attach) — without pinning, the admission/hash text pass re-executes
    winners = _dedup_winners(slim).materialize()
    if near_dup:
        losers = _near_dup_losers(
            ds, winners.select_columns(["doc_id"]))
        if losers:
            import ray as _ray

            losers_ref = _ray.put(losers)

            def drop(df: pd.DataFrame) -> pd.DataFrame:
                ls = _ray.get(losers_ref)
                return df[~df["doc_id"].isin(ls)]

            winners = winners.map_batches(
                drop, batch_format="pandas").materialize()
    # ws_tokens rides through the placement groupby (slim rows)
    return global_shuffle_split(winners, id_col="doc_id", seed=seed)


def train_bins(
    survivors: "ray.data.Dataset", *, window: int = _WINDOW_DEFAULT
) -> "ray.data.Dataset":
    """Pack the train split into context-window bins: exclusive prefix sum
    of token counts in shuffle order (pos is dense within the corpus, so
    the scan's equal-range buckets stay balanced), bin = cum // window."""
    import pyarrow as pa

    train = survivors.filter(expr="split == 'train'").select_columns(
        ["doc_id", "pos", "ws_tokens"]
    ).materialize()
    if train.count() == 0:
        # typed empty — the scan's min/max bounds are undefined on 0 rows
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "ws_tokens": pa.array([], pa.int64()),
            "cum_before": pa.array([], pa.int64()),
            "bin": pa.array([], pa.int64()),
        }))
    scanned = exclusive_prefix_sum(
        train, order_col="pos", value_col="ws_tokens"
    )

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        df["bin"] = (df["cum_before"] // window).astype("int64")
        return df

    return scanned.map_batches(binify, batch_format="pandas")


def export_training_set(
    sf_dir: str,
    out_dir: str,
    *,
    seed: str = "s0",
    window: int = _WINDOW_DEFAULT,
) -> dict:
    """Run the full export; returns the manifest. Re-runs skip splits the
    manifest already records (per-split resumability)."""
    manifest_path = os.path.join(out_dir, "manifest.json")
    done: dict = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prior = json.load(f)
        # the full config must match — a manifest from another corpus or
        # window must never satisfy this run's splits
        if (prior.get("seed") == seed and prior.get("window") == window
                and prior.get("sf_dir") == sf_dir):
            done = {
                k: v for k, v in prior.get("splits", {}).items()
                # a recorded split only counts if its partition survived
                if os.path.isdir(os.path.join(out_dir, f"split={k}"))
            }

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    survivors = training_survivors(ds, seed=seed).materialize()

    splits: dict = dict(done)
    for split in ("train", "val", "test"):
        if split in done:
            continue
        part = survivors.filter(expr=f"split == '{split}'")
        if split == "train":
            part = train_bins(survivors, window=window)
        # one execution: the write and both stat aggregates read the
        # pinned blocks instead of re-running the split's lineage
        part = part.materialize()
        n_rows = part.count()
        part_dir = os.path.join(out_dir, f"split={split}")
        # idempotent write: stage into a tmp dir, swap atomically — a
        # crash between write and manifest can never leave a double copy
        tmp_dir = part_dir + ".tmp"
        import shutil as _shutil

        _shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        part.write_parquet(tmp_dir)
        _shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp_dir, part_dir)
        stats = (part.aggregate(ray.data.aggregate.Sum("ws_tokens"))
                 if n_rows else None)
        entry = {
            "n_docs": int(n_rows),
            "n_tokens": int(stats["sum(ws_tokens)"] or 0) if stats else 0,
        }
        if split == "train":
            mx = (part.aggregate(ray.data.aggregate.Max("bin"))
                  if n_rows else None)
            entry["n_bins"] = (
                int(mx["max(bin)"]) + 1
                if mx is not None and mx.get("max(bin)") is not None
                else 0
            )
        splits[split] = entry
        manifest = {"seed": seed, "window": window, "sf_dir": sf_dir,
                    "splits": splits}
        os.makedirs(out_dir, exist_ok=True)
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, manifest_path)

    return {"seed": seed, "window": window, "sf_dir": sf_dir,
            "splits": splits}


def export_summary(
    sf_dir: str, *, seed: str = "s0", window: int = _WINDOW_DEFAULT
) -> pd.DataFrame:
    """Per-split summary (split, n_docs, n_tokens, n_bins) — the
    ★ ``q_training_export`` surface; n_bins counts train context windows,
    0 for val/test."""
    survivors = training_survivors(sf_dir_ds(sf_dir), seed=seed)
    survivors = survivors.materialize()
    # take_all, not to_pandas: the aggregate emits empty sidecar blocks
    # whose schema confuses to_pandas (it can return zero rows)
    base = pd.DataFrame(
        survivors.groupby("split")
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_docs"),
            ray.data.aggregate.Sum("ws_tokens", alias_name="n_tokens"),
        )
        .take_all()
    )
    if base.empty:  # no survivors at all — typed empty summary
        return pd.DataFrame({
            "split": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_tokens": pd.Series([], dtype="int64"),
            "n_bins": pd.Series([], dtype="int64"),
        })
    n_train = int(base.loc[base["split"] == "train", "n_docs"].sum())
    n_bins = 0
    if n_train:
        mx = train_bins(survivors, window=window).aggregate(
            ray.data.aggregate.Max("bin"))
        if mx is not None and mx.get("max(bin)") is not None:
            n_bins = int(mx["max(bin)"]) + 1
    base["n_docs"] = base["n_docs"].astype("int64")
    base["n_tokens"] = base["n_tokens"].astype("int64")
    base["n_bins"] = [
        n_bins if s == "train" else 0 for s in base["split"]
    ]
    base["n_bins"] = base["n_bins"].astype("int64")
    return base.sort_values("split").reset_index(drop=True)


def sf_dir_ds(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
