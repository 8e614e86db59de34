"""TF-IDF top-terms per document (Spärck Jones 1972; public textbook
formula) — the per-document feature-extraction complement to the
query-side ranking in ``stages/bm25.py``: for every document, its ``m``
most characteristic terms with exact tf / df and a fixed-point score.
A training-data pipeline uses this for topic labelling, near-duplicate
triage and per-domain vocabulary drift; the reference's keyword
extractor (``pkg/crawler/keywords.go``, see ``keywords.py``) ranks by
raw frequency only — idf weighting is the corpus-aware upgrade.

Pipeline shape (text is read ONCE; only slim rows shuffle):

1. **Count pass** — ``map_batches`` tokenizes each doc once
   (``stages/bm25.py`` tokenizer contract: lowercase whitespace split)
   and emits ONE slim row per doc: ``(id, terms list<string>,
   tfs list<int64>)`` with the doc's DISTINCT terms sorted ascending.
2. **DF** — explode (term) with a per-batch combiner, one
   ``groupby(term)`` sum → df. ``N`` = slim row count (one per doc,
   empty docs included — matching COUNT(*) in the twin).
3. **Score + top-m** — threshold-switched like ``stages/ngram_lm.py``:
   - df table ≤ ``broadcast_threshold`` rows: the (sorted-term, df) LUT
     ships once via the object store; one map over the per-doc list
     rows scores and takes the per-doc top-m in place — zero further
     shuffles.
   - above: df stays distributed — explode (id, term, tf), hash-join on
     term, ``groupby(id).map_groups`` top-m. Parity-tested.

**Fixed-point determinism** (the ``ngram_lm`` ln contract):
``score_q4 = floor(tf · ln(N/df) · 10⁴ + 0.5)`` with the double
expression tree written identically in numpy and the DuckDB twin
(``CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE)/CAST(df AS DOUBLE))``).
Per-doc rank ties break (score_q4 DESC, term ASC).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

SCALE = 10_000


def tfidf_top_terms(
    ds: "ray.data.Dataset",
    *,
    m: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Dataset with ``id_col`` + ``text_col`` → Dataset
    (id, term, tf, df, score_q4, rank): each doc's top-``m`` terms by
    (score_q4 DESC, term ASC), rank 1-based, sorted by (id, rank)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def count(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        terms: list[list[str]] = []
        tfs: list[list[int]] = []
        for text in texts:
            c = Counter((text or "").lower().split())
            ks = sorted(c)
            terms.append(ks)
            tfs.append([c[t] for t in ks])
        return pa.table({
            id_col: batch[id_col],
            "terms": pa.array(terms, pa.list_(pa.string())),
            "tfs": pa.array(tfs, pa.list_(pa.int64())),
        })

    slim = ds.select_columns([id_col, text_col]).map_batches(
        count, batch_format="pyarrow").materialize()
    n_docs = slim.count()
    if n_docs == 0:
        return ray.data.from_arrow(_empty_table(id_col))

    def df_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(pc.list_flatten(batch["terms"]))
        return pa.table({"term": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    df_ds = (slim.map_batches(df_partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("c", alias_name="df"))
             .materialize())

    if df_ds.count() <= broadcast_threshold:
        out = _score_broadcast(slim, df_ds, n_docs, m, id_col)
    else:
        out = _score_join(slim, df_ds, n_docs, m, id_col)
    return out.sort([id_col, "rank"])


def _empty_table(id_col: str) -> pa.Table:
    return pa.table({
        id_col: pa.array([], pa.int64()),
        "term": pa.array([], pa.string()),
        "tf": pa.array([], pa.int64()),
        "df": pa.array([], pa.int64()),
        "score_q4": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64())})


def _score_rows(tf: np.ndarray, df: np.ndarray, n_docs: int):
    """The pinned fixed-point expression, identical to the twin."""
    return np.floor(
        tf.astype(np.float64)
        * np.log(float(n_docs) / df.astype(np.float64))
        * SCALE + 0.5).astype(np.int64)


def _topm_frame(ids, terms, tfs, dfs, scores, m: int,
                id_col: str) -> pa.Table:
    """Per-doc top-m over already-aligned arrays (one doc at a time —
    callers pass per-doc slices)."""
    df_out = pd.DataFrame({id_col: ids, "term": terms, "tf": tfs,
                           "df": dfs, "score_q4": scores})
    df_out = df_out.sort_values(
        [id_col, "score_q4", "term"],
        ascending=[True, False, True], kind="mergesort")
    df_out["rank"] = df_out.groupby(id_col).cumcount() + 1
    df_out = df_out[df_out["rank"] <= m]
    df_out["rank"] = df_out["rank"].astype("int64")
    return pa.Table.from_pandas(df_out, preserve_index=False)


def _score_broadcast(slim, df_ds, n_docs: int, m: int, id_col: str):
    from ..ops.gutil import collect_tables

    parts = collect_tables(df_ds)
    if parts:
        allt = pa.concat_tables(parts)
        terms_arr = np.asarray(allt["term"].to_pylist(), dtype=object)
        df_arr = allt["df"].to_numpy(zero_copy_only=False)
        order = np.argsort(terms_arr)
        terms_arr, df_arr = terms_arr[order], df_arr[order]
    else:
        terms_arr = np.array([], dtype=object)
        df_arr = np.array([], dtype=np.int64)
    lut_ref = ray.put((terms_arr, df_arr.astype(np.int64)))

    def score(batch: pa.Table) -> pa.Table:
        tl, dl = ray.get(lut_ref)
        ids_c, terms_c, tfs_c, dfs_c, sc_c = [], [], [], [], []
        id_vals = batch[id_col].to_pylist()
        term_lists = batch["terms"].to_pylist()
        tf_lists = batch["tfs"].to_pylist()
        for did, ts, fs in zip(id_vals, term_lists, tf_lists):
            if not ts:
                continue
            t = np.asarray(ts, dtype=object)
            f = np.asarray(fs, dtype=np.int64)
            pos = np.searchsorted(tl, t)
            d = dl[pos]  # every term is in the global df table
            s = _score_rows(f, d, n_docs)
            ids_c.extend([did] * len(t))
            terms_c.extend(ts)
            tfs_c.extend(f.tolist())
            dfs_c.extend(d.tolist())
            sc_c.extend(s.tolist())
        if not ids_c:
            return _empty_table(id_col)
        return _topm_frame(ids_c, terms_c, tfs_c, dfs_c, sc_c, m,
                           id_col)

    return slim.map_batches(score, batch_format="pyarrow")


def _score_join(slim, df_ds, n_docs: int, m: int, id_col: str):
    from .ngram_lm import _join_partitions

    nparts = _join_partitions()

    def explode(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for did, ts, fs in zip(batch[id_col].to_pylist(),
                               batch["terms"].to_pylist(),
                               batch["tfs"].to_pylist()):
            ids.extend([did] * len(ts))
            terms.extend(ts)
            tfs.extend(fs)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "term": pa.array(terms, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    rows = slim.map_batches(explode, batch_format="pyarrow")
    joined = rows.join(df_ds, join_type="inner",
                       num_partitions=nparts, on=("term",))

    def topm(g: pd.DataFrame) -> pd.DataFrame:
        s = _score_rows(g["tf"].to_numpy(np.int64),
                        g["df"].to_numpy(np.int64), n_docs)
        t = _topm_frame(g[id_col].tolist(), g["term"].tolist(),
                        g["tf"].tolist(), g["df"].tolist(),
                        s.tolist(), m, id_col)
        return t.to_pandas()

    from ..ops.gutil import group_by_key_shards

    # _topm_frame ranks per doc internally — shard the doc id so one
    # map_groups call covers a whole shard, not one call per document
    return group_by_key_shards(joined, id_col, topm)
