"""Bigram language-model scoring (CCNet-style perplexity quality filter).

CCNet (Wenzek et al. 2020, arXiv:1911.00359 — public method) filters
crawl text by its perplexity under a language model trained on a
target-domain corpus; documents that "look like" the target score low
perplexity and are kept. The reference engine has no LM plane (its
quality signals are whole-content hashes and keyword tables,
crawler.go:1504-1543) — this is one of the training-data operators this
engine adds as a first-class citizen, alongside DSIR
(``stages/importance.py``) whose two-pass shape it shares.

Pipeline shape (two streaming passes; heavy text never shuffles):

1. **Count pass** — ``map_batches`` computes per-batch ``Counter``
   partials of unigram and bigram occurrences over the *target* subset
   (``target_col == target_value``), emitting only nonzero
   ``(kind, w0, w1, c)`` rows; one ``groupby`` sum lands the model.
   The model is the only thing that shuffles — counts, not text.
2. **Score pass** — threshold switch (the ``q_nation_revenue`` /
   correlation-backfill pattern):

   - model rows ≤ ``broadcast_threshold``: the count LUT is pulled once,
     broadcast via ``ray.put`` and read in each scoring actor's
     ``__init__``; per-batch scoring is vectorized (pandas ``Series.map``
     against the dicts, one ``np.log`` over all positions,
     ``np.add.reduceat`` segment sums per doc).
   - above the threshold the model never reaches the driver: per-position
     bigram rows left-join the materialized count table on ``(w0, w1)``
     then ``(w0,)`` (native ``Dataset.join``), and a per-doc ``groupby``
     sums the terms. Both paths are parity-tested.

Smoothing is add-1 over the target vocabulary: for each bigram position
``(w0, w1)``, ``P = (c2(w0,w1) + 1) / (c1(w0) + V)`` with ``c1`` the
target unigram occurrence count and ``V`` the distinct target vocabulary
size — unseen contexts degrade to ``1/V``-ish mass instead of dividing
by zero.

**Fixed-point determinism** (what makes the DuckDB twin hash-exact):
each position contributes ``term = floor(ln(num/den) * 10^4 + 0.5)`` as
int64, where ``num = c2+1`` and ``den = c1+V`` are exact integers. The
IEEE division of two exactly-representable ints and the platform ``ln``
reproduce bit-for-bit between numpy and DuckDB (verified 0/20k mismatch
probe), ``floor(x+0.5)`` avoids the half-to-even vs half-away rounding
split, and the per-doc *sum of int64 terms* is order-free — unlike a
float log-prob sum, whose last-ulp order dependence can round apart at
a decimal boundary. The conventional float perplexity is derived:
``ppl ≈ exp(-logprob_q4 / (n_bigrams * 10^4))`` (pytest path).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

# Unit separator: Python str.split() treats \x1f as whitespace, so it can
# never appear inside a token. (NUL would also qualify semantically, but
# numpy's fixed-width unicode representation strips trailing NULs, so a
# "\x00" separator silently vanishes inside pandas string ops.)
_SEP = "\x1f"


def _tokens(text: str | None) -> list[str]:
    """Tokenization shared with the DSIR / MinHash family: lowercase,
    split on whitespace (== DuckDB ``string_split_regex(lower(text),
    '\\s+')`` with empties filtered, on the ASCII corpus)."""
    return (text or "").lower().split()


def bigram_model_counts(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
) -> "ray.data.Dataset":
    """Streaming count pass → model Dataset with columns
    ``(kind, w0, w1, c)`` where kind 0 = unigram (``w1 = ''``) and
    kind 1 = bigram; ``c`` is the occurrence count over target docs.
    Per-batch Counter partials combine before the one small shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        is_t = pa.compute.equal(batch[target_col], target_value).to_pylist()
        uni: Counter = Counter()
        bi: Counter = Counter()
        for text, tgt in zip(texts, is_t):
            if not tgt:
                continue
            toks = _tokens(text)
            uni.update(toks)
            bi.update(zip(toks[:-1], toks[1:]))
        kinds, w0s, w1s, cs = [], [], [], []
        for w, c in uni.items():
            kinds.append(0)
            w0s.append(w)
            w1s.append("")
            cs.append(c)
        for (a, b), c in bi.items():
            kinds.append(1)
            w0s.append(a)
            w1s.append(b)
            cs.append(c)
        return pa.table(
            {
                "kind": pa.array(kinds, pa.int32()),
                "w0": pa.array(w0s, pa.string()),
                "w1": pa.array(w1s, pa.string()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "w0", "w1"])
        .aggregate(Sum("c", alias_name="c"))
    )


class _BigramScoreStage:
    """Actor-pool score pass (broadcast path): LUT fetched once per actor."""

    def __init__(self, lut_ref, id_col: str, text_col: str, scale: int):
        self.c1, self.c2, self.v = ray.get(lut_ref)
        self.id_col = id_col
        self.text_col = text_col
        self.scale = scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        w0s: list[str] = []
        w1s: list[str] = []
        starts: list[int] = []
        out_ids = []
        for doc_id, text in zip(ids, texts):
            toks = _tokens(text)
            if len(toks) < 2:
                continue  # no bigrams → no row (SQL twin drops them too)
            starts.append(len(w0s))
            w0s.extend(toks[:-1])
            w1s.extend(toks[1:])
            out_ids.append(doc_id)
        id_type = batch[self.id_col].type
        if not out_ids:
            return pa.table(
                {
                    self.id_col: pa.array([], id_type),
                    "n_bigrams": pa.array([], pa.int64()),
                    "oov_bigrams": pa.array([], pa.int64()),
                    "logprob_q4": pa.array([], pa.int64()),
                }
            )
        s0 = pd.Series(w0s, dtype="object")
        keys = s0.str.cat(pd.Series(w1s, dtype="object"), sep=_SEP)
        hit2 = keys.map(self.c2).fillna(0).to_numpy(np.int64)
        hit1 = s0.map(self.c1).fillna(0).to_numpy(np.int64)
        num = (hit2 + 1).astype(np.float64)
        den = (hit1 + self.v).astype(np.float64)
        terms = np.floor(np.log(num / den) * self.scale + 0.5).astype(np.int64)
        bounds = np.asarray(starts, dtype=np.int64)
        logprob = np.add.reduceat(terms, bounds)
        oov = np.add.reduceat((hit2 == 0).astype(np.int64), bounds)
        n_bi = np.diff(np.append(bounds, len(terms)))
        return pa.table(
            {
                self.id_col: pa.array(out_ids, id_type),
                "n_bigrams": pa.array(n_bi, pa.int64()),
                "oov_bigrams": pa.array(oov, pa.int64()),
                "logprob_q4": pa.array(logprob, pa.int64()),
            }
        )


def bigram_lm_scores(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
    scale: int = 10_000,
    broadcast_threshold: int = 2_000_000,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Per-document bigram-LM fit: ``(id, n_bigrams, oov_bigrams,
    logprob_q4)`` where ``logprob_q4`` is the fixed-point (1e-4) sum of
    per-position smoothed log-probabilities. Docs with < 2 tokens emit
    no row. ``ppl = exp(-logprob_q4 / (n_bigrams * scale))``."""
    counts = bigram_model_counts(
        ds, text_col=text_col, target_col=target_col, target_value=target_value
    ).materialize()  # the model (counts, not text) — read twice below
    n_model = counts.count()
    if n_model == 0:
        raise ValueError(
            f"bigram_lm_scores: no target rows ({target_col}={target_value!r})"
        )
    if n_model <= broadcast_threshold:
        c1: dict = {}
        c2: dict = {}
        # columnar pull (iter_rows' dict-per-row costs ~10× at the 2M
        # threshold ceiling)
        for b in counts.iter_batches(batch_format="pyarrow"):
            for k, a, w1, c in zip(
                b["kind"].to_pylist(), b["w0"].to_pylist(),
                b["w1"].to_pylist(), b["c"].to_pylist(),
            ):
                if k == 0:
                    c1[a] = c
                else:
                    c2[a + _SEP + w1] = c
        lut_ref = ray.put((c1, c2, len(c1)))
        if concurrency is None:
            # leave CPUs for co-scheduled upstream ops (a fixed pool of 4
            # deadlocks a 4-CPU cluster whose plan also has an AllToAll)
            cpus = int(ray.cluster_resources().get("CPU", 8))
            concurrency = max(2, min(4, cpus - 2))
        return ds.map_batches(
            _BigramScoreStage,
            fn_constructor_args=(lut_ref, id_col, text_col, scale),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    return _bigram_scores_join(
        ds, counts, id_col=id_col, text_col=text_col, scale=scale
    )


def _join_partitions() -> int:
    """Per-join hash-partition count for the two chained joins below.

    Each ``Dataset.join`` spins up a hash-shuffle aggregator pool sized
    with ``num_partitions``; two joins in one streaming plan therefore
    run two pools concurrently, and on a small cluster two pools of 16
    deadlock waiting for CPUs (observed on 4 CPUs, Ray 2.49). Sizing
    each pool to ~half the cluster keeps both schedulable at any size
    while still spreading hot-token skew on big clusters."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    return max(2, min(64, cpus // 2))


def _bigram_scores_join(ds, counts, *, id_col: str, text_col: str,
                        scale: int) -> "ray.data.Dataset":
    """Distributed score path: the model never reaches the driver.
    Per-position rows ⟕ bigram counts on (w0, w1) ⟕ unigram counts on
    (w0,), then a per-doc groupby sum. Join keys are uniform token
    strings; hot tokens ("the") skew the unigram join — num_partitions
    spreads them and the per-row payload is slim (ints + two tokens)."""
    from ray.data.aggregate import Sum

    def split_kind(kind: int, cols: list[str], renamed: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pa.compute.equal(t["kind"], kind))
            return t.select(cols).rename_columns(renamed)

        return fn

    uni = counts.map_batches(
        split_kind(0, ["w0", "c"], ["w0", "c1"]), batch_format="pyarrow"
    )
    bi = counts.map_batches(
        split_kind(1, ["w0", "w1", "c"], ["w0", "w1", "c2"]),
        batch_format="pyarrow",
    )
    v = uni.count()

    def positions(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, w0s, w1s = [], [], []
        for doc_id, text in zip(ids, texts):
            toks = _tokens(text)
            if len(toks) < 2:
                continue
            out_id.extend([doc_id] * (len(toks) - 1))
            w0s.extend(toks[:-1])
            w1s.extend(toks[1:])
        return pa.table(
            {
                id_col: pa.array(out_id, batch[id_col].type),
                "w0": pa.array(w0s, pa.string()),
                "w1": pa.array(w1s, pa.string()),
            }
        )

    rows = ds.map_batches(positions, batch_format="pyarrow")
    nparts = _join_partitions()
    joined = rows.join(
        bi, join_type="left_outer", num_partitions=nparts, on=("w0", "w1")
    ).join(uni, join_type="left_outer", num_partitions=nparts, on=("w0",))

    def term(batch: pa.Table) -> pa.Table:
        hit2 = np.nan_to_num(
            batch["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        hit1 = np.nan_to_num(
            batch["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        num = (hit2 + 1).astype(np.float64)
        den = (hit1 + v).astype(np.float64)
        terms = np.floor(np.log(num / den) * scale + 0.5).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
                "is_oov": pa.array((hit2 == 0).astype(np.int64)),
                "term": pa.array(terms),
            }
        )

    return (
        joined.map_batches(term, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Sum("one", alias_name="n_bigrams"),
            Sum("is_oov", alias_name="oov_bigrams"),
            Sum("term", alias_name="logprob_q4"),
        )
    )


def bigram_lm_select(
    ds: "ray.data.Dataset",
    *,
    k: int,
    min_bigrams: int = 1,
    **kwargs,
) -> "ray.data.Dataset":
    """CCNet-style selection: top-``k`` documents by mean log-prob
    (best model fit ≅ lowest perplexity). The sort key is the float64
    quotient ``logprob_q4 / n_bigrams`` with an (id ASC) tie-break —
    deterministic (same doubles everywhere), though docs whose exact
    rationals differ only past double precision collapse into the
    tie-break; per-batch partial head bounds the sort input
    (``search_pages`` combiner shape)."""
    scored = bigram_lm_scores(ds, **kwargs)
    id_col = kwargs.get("id_col", "doc_id")

    def with_key(df: pd.DataFrame) -> pa.Table:
        df = df[df["n_bigrams"] >= min_bigrams].copy()
        df["fit"] = df["logprob_q4"] / df["n_bigrams"]
        out = df.sort_values(["fit", id_col], ascending=[False, True],
                             kind="mergesort").head(k)
        # arrow out: this partial head feeds the global sort exchange
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        scored.map_batches(with_key, batch_format="pandas")
        .sort(["fit", id_col], descending=[True, False])
        .limit(k)
        .drop_columns(["fit"])
    )


def pmi_collocations(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
    min_count: int = 5,
    k: int = 100,
    scale: int = 10_000,
) -> "ray.data.Dataset":
    """Top-``k`` collocations by pointwise mutual information (Church &
    Hanks 1990 — the phrase-mining signal behind word2vec-style phrase
    detection): reuses :func:`bigram_model_counts`' one-pass count model
    and scores each bigram ``pmi = ln((c2 · T) / (c1(w0) · c1(w1)))``
    where ``T`` is total bigram positions — fixed-point
    ``floor(pmi · scale + 0.5)`` over exact integers, so the SQL twin is
    hash-exact. Rare pairs are cut at ``min_count`` (PMI's classic
    low-frequency pathology). → (w0, w1, c2, pmi_q4), ordered
    (pmi_q4 DESC, w0 ASC, w1 ASC), top-k via per-batch partial head."""
    counts = bigram_model_counts(
        ds, text_col=text_col, target_col=target_col,
        target_value=target_value,
    ).materialize()

    from ray.data.aggregate import Sum

    # T = total bigram positions = Σ bigram counts (tiny aggregate)
    def only_bi(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.equal(t["kind"], 1))

    bi = counts.map_batches(only_bi, batch_format="pyarrow")
    total = bi.aggregate(Sum("c", alias_name="t"))["t"]
    if not total:
        raise ValueError("pmi_collocations: no target bigrams")

    # unigram LUT: vocab-sized, broadcast once (the model, not the text);
    # filter to kind==0 distributed so the driver never iterates the
    # (much larger) bigram half
    def only_uni(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.equal(t["kind"], 0))

    c1: dict = {}
    for b in counts.map_batches(
        only_uni, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        c1.update(zip(b["w0"].to_pylist(), b["c"].to_pylist()))
    lut_ref = ray.put(c1)

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lut = ray.get(lut_ref)
        m = pa.compute.greater_equal(batch["c"], min_count)
        batch = batch.filter(m)
        if batch.num_rows == 0:
            return pa.table({
                "w0": pa.array([], pa.string()),
                "w1": pa.array([], pa.string()),
                "c2": pa.array([], pa.int64()),
                "pmi_q4": pa.array([], pa.int64()),
            })
        w0 = batch["w0"].to_pylist()
        w1 = batch["w1"].to_pylist()
        c2 = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = pd.Series(w0).map(lut).to_numpy(np.int64)
        b = pd.Series(w1).map(lut).to_numpy(np.int64)
        # products as double×double (not int64 — c2·T wraps past 2^63 at
        # web scale); the SQL twin multiplies the same way, so the
        # expression trees stay identical AND overflow-free
        num = c2.astype(np.float64) * np.float64(total)
        den = a.astype(np.float64) * b.astype(np.float64)
        pmi = np.floor(np.log(num / den) * scale + 0.5).astype(np.int64)
        t = pa.table({
            "w0": pa.array(w0, pa.string()),
            "w1": pa.array(w1, pa.string()),
            "c2": pa.array(c2),
            "pmi_q4": pa.array(pmi),
        })
        if t.num_rows > k:  # partial head bounds the global sort
            order = pa.compute.sort_indices(
                t, sort_keys=[("pmi_q4", "descending"),
                              ("w0", "ascending"), ("w1", "ascending")])
            t = t.take(order.slice(0, k))
        return t

    return (
        bi.map_batches(score, batch_format="pyarrow")
        .sort(["pmi_q4", "w0", "w1"], descending=[True, False, False])
        .limit(k)
    )
