"""Benchmark decontamination: flag corpus documents that share word
n-grams with a (small) benchmark/eval set.

The standard pre-training hygiene pass: the benchmark side is tiny (eval
suites are KBs–MBs), so the 100 TB design is broadcast-once — the distinct
benchmark n-gram set goes into the object store via ``ray.put`` exactly
once and every ``map_batches`` task reads it zero-copy; the corpus side
streams, nothing shuffles. Tokenization (lowercase, whitespace split) and
gram construction match ``q_dup_ngrams``'s SQL form so the DuckDB twin can
rebuild both sides from the raw text.
"""

from __future__ import annotations

import pandas as pd
import ray
import ray.data


def _doc_grams(text: str, n: int) -> list[str]:
    ws = [w for w in text.lower().split() if w]
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def benchmark_ngram_set(
    bench_ds: "ray.data.Dataset", *, n: int = 5, text_col: str = "text"
) -> "ray.ObjectRef":
    """Distinct n-gram set of the benchmark docs, as one ``ray.put`` ref.

    The per-batch partial set union keeps driver traffic at
    O(distinct grams) — fine by the operator's premise (benchmarks are
    small); a benchmark too large to hold as one set shouldn't use this
    operator, it should use the hash-shard dup pipeline in
    ``stages/dedup.py``.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        grams: set[str] = set()
        for t in df[text_col].fillna(""):
            grams.update(_doc_grams(t, n))
        return pd.DataFrame({"ng": sorted(grams)})

    parts = bench_ds.map_batches(partial, batch_format="pandas").to_pandas()
    return ray.put(frozenset(parts["ng"].tolist()))


def decontaminate_stage(bench_ref: "ray.ObjectRef", *, n: int = 5,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Returns a map_batches fn: per doc, total gram positions, DISTINCT
    benchmark grams present, and a 0/1 contaminated flag."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        bench: frozenset = ray.get(bench_ref)
        n_grams, n_hits = [], []
        for t in df[text_col].fillna(""):
            gs = _doc_grams(t, n)
            n_grams.append(len(gs))
            n_hits.append(len(set(gs) & bench))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_grams": pd.array(n_grams, dtype="int64"),
            "n_hits": pd.array(n_hits, dtype="int64"),
            "contaminated": pd.array(
                [1 if h else 0 for h in n_hits], dtype="int64"),
        })

    return fn
