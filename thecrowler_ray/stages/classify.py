"""Multinomial Naive Bayes text classifier (fastText-analog quality /
language classifier, trained and scored distributed).

A 100 TB training-data pipeline filters documents with cheap linear text
classifiers (fastText: Joulin et al. 2016, arXiv:1607.01759 — public
method; CCNet and LLaMA's pipeline both use one). The reference engine
has no trained-classifier plane (its language signal is a rule map,
``pkg/crawler/crawler.go`` content heuristics) — this operator adds it
as a first-class citizen alongside the bigram LM (``ngram_lm.py``),
whose two-pass shape and fixed-point determinism contract it shares.

Shape (two streaming passes; heavy text never shuffles):

1. **Train pass** — per-batch ``Counter`` partials over the train split
   (``doc_id % 10 < split_mod`` — a pure function of the id, stable
   under corpus growth) emit ``(kind, label, tok, c)`` rows
   (kind 0 = per-label doc count, kind 1 = per-(label, token) occurrence
   count); one ``groupby`` sum lands the model. Only counts shuffle.
2. **Score pass** — threshold switch:

   - model ≤ ``broadcast_threshold`` rows: LUT via ``ray.put``, read in
     each scoring actor's ``__init__``; per-batch scoring is one token
     explode + L ``Series.map`` passes + ``np.add.reduceat`` segment
     sums (L = number of labels).
   - above: the model never reaches the driver. Doc-token rows
     inner-join the token-count table on ``tok`` (native
     ``Dataset.join``); per-(doc, label) deltas are summed distributed
     and left-join the exploded (doc × label) base scores. Only the
     O(L) label stats (doc counts, token totals) and the scalar V are
     ever pulled. Both paths are parity-tested.

**Fixed-point determinism** (same contract as ``ngram_lm.py``): each
token position contributes ``floor(ln((c+1)/(T_l+V)) * 10^4 + 0.5)`` as
int64 — num and den exact ints in double, IEEE division + platform
``ln`` bit-portable between numpy and DuckDB, int sums order-free. The
prediction is ``argmax`` over labels with ties broken label-ascending
(= SQL ``ROW_NUMBER() OVER (ORDER BY score DESC, label ASC)``).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

_SEP = "\x1f"  # see ngram_lm.py — str.split()-whitespace, numpy-safe
_SCALE = 10_000


def _tokens(text: str | None) -> list[str]:
    """lowercase whitespace tokens == DuckDB
    ``list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')``
    on the ASCII corpus (shared with ngram_lm / DSIR / MinHash)."""
    return (text or "").lower().split()


def nb_train_counts(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    split_mod: int = 8,
) -> "ray.data.Dataset":
    """Count pass → model Dataset ``(kind, label, tok, c)``: kind 0 rows
    carry per-label train-doc counts (``tok = ''``), kind 1 rows carry
    per-(label, token) occurrence counts over the train split."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        labels = batch[label_col].to_pylist()
        docs: Counter = Counter()
        toks: Counter = Counter()
        for i, text, lab in zip(ids, texts, labels):
            if i % 10 >= split_mod:
                continue
            docs[lab] += 1
            toks.update((lab, t) for t in _tokens(text))
        kinds, labs, ts, cs = [], [], [], []
        for lab, c in docs.items():
            kinds.append(0)
            labs.append(lab)
            ts.append("")
            cs.append(c)
        for (lab, t), c in toks.items():
            kinds.append(1)
            labs.append(lab)
            ts.append(t)
            cs.append(c)
        return pa.table({
            "kind": pa.array(kinds, pa.int32()),
            "label": pa.array(labs, pa.string()),
            "tok": pa.array(ts, pa.string()),
            "c": pa.array(cs, pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "label", "tok"])
        .aggregate(Sum("c", alias_name="c"))
    )


def _label_stats(model: "ray.data.Dataset"):
    """O(L) label stats + scalar V from the materialized model: per label
    (train-doc count, total token occurrences), and the distinct-token
    vocabulary size across all labels. Driver traffic is L rows + two
    scalars regardless of corpus size."""
    from ray.data.aggregate import Sum

    nd: dict[str, int] = {}
    for b in (model.filter(expr="kind == 0")
              .select_columns(["label", "c"])
              .iter_batches(batch_format="pyarrow")):
        for lab, c in zip(b["label"].to_pylist(), b["c"].to_pylist()):
            nd[lab] = nd.get(lab, 0) + c
    tl: dict[str, int] = {}
    tok_rows = model.filter(expr="kind == 1")
    for b in (tok_rows.groupby("label").aggregate(Sum("c", alias_name="t"))
              .iter_batches(batch_format="pyarrow")):
        for lab, t in zip(b["label"].to_pylist(), b["t"].to_pylist()):
            tl[lab] = t
    # distinct tokens across labels: one model-sized groupby, count rows
    v = tok_rows.groupby("tok").count().count()
    return nd, tl, int(v)


def _term_q4(c: np.ndarray | int, den: int) -> np.ndarray | int:
    """floor(ln((c+1)/den) * 1e4 + 0.5) — the shared fixed-point kernel."""
    num = (np.asarray(c, dtype=np.float64) + 1.0)
    out = np.floor(np.log(num / float(den)) * _SCALE + 0.5)
    if np.ndim(out) == 0:
        return int(out)
    return out.astype(np.int64)


class _NBScoreStage:
    """Broadcast-path scoring actor: model LUT fetched once per actor."""

    def __init__(self, lut_ref, id_col, text_col, label_col, split_mod):
        counts, nd, tl, v = ray.get(lut_ref)
        self.counts = counts            # {label\x1ftok: c}
        self.labels = sorted(nd)        # ascending → argmax ties to min
        self.id_col, self.text_col = id_col, text_col
        self.label_col, self.split_mod = label_col, split_mod
        n_total = sum(nd.values())
        self.prior = {l: _term_q4(nd[l] - 1, n_total) for l in self.labels}
        self.den = {l: tl[l] + v for l in self.labels}
        self.default = {l: _term_q4(0, self.den[l]) for l in self.labels}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        true_labs = batch[self.label_col].to_pylist()
        all_toks: list[str] = []
        starts: list[int] = []
        n_tok = np.empty(len(ids), dtype=np.int64)
        for i, text in enumerate(texts):
            toks = _tokens(text)
            starts.append(len(all_toks))
            all_toks.extend(toks)
            n_tok[i] = len(toks)
        scores = np.empty((len(ids), len(self.labels)), dtype=np.int64)
        s = pd.Series(all_toks, dtype="object")
        bounds = np.asarray(starts, dtype=np.int64)
        for j, lab in enumerate(self.labels):
            col = np.full(len(ids), self.prior[lab], dtype=np.int64)
            if len(all_toks):
                hit = (s.map(lambda t, lab=lab:
                             self.counts.get(lab + _SEP + t))
                       .fillna(0).to_numpy(np.int64))
                # sentinel 0 so bounds == len(terms) (trailing empty docs)
                # stay valid without cutting the previous doc's segment;
                # empty mid-batch segments return a garbage single term
                # and are masked via n_tok == 0
                terms = np.append(_term_q4(hit, self.den[lab]), 0)
                sums = np.add.reduceat(terms, bounds)
                col = col + np.where(n_tok > 0, sums, 0)
            scores[:, j] = col
        best = np.argmax(scores, axis=1)  # first max = label-asc tie-break
        pred = [self.labels[j] for j in best]
        best_q4 = scores[np.arange(len(ids)), best]
        return pa.table({
            self.id_col: batch[self.id_col],
            "pred_lang": pa.array(pred, pa.string()),
            "score_q4": pa.array(best_q4, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "is_train": pa.array(
                [1 if i % 10 < self.split_mod else 0 for i in ids],
                pa.int64()),
            "correct": pa.array(
                [1 if p == t else 0 for p, t in zip(pred, true_labs)],
                pa.int64()),
        })


def nb_classify(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    split_mod: int = 8,
    broadcast_threshold: int = 2_000_000,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Train on the ``doc_id % 10 < split_mod`` split, score every doc:
    ``(id, pred_lang, score_q4, n_tokens, is_train, correct)``."""
    model = nb_train_counts(
        ds, id_col=id_col, text_col=text_col, label_col=label_col,
        split_mod=split_mod,
    ).materialize()
    n_model = model.count()
    if n_model == 0:
        raise ValueError("nb_classify: empty train split")
    nd, tl, v = _label_stats(model)

    if n_model <= broadcast_threshold:
        counts: dict[str, int] = {}
        for b in model.iter_batches(batch_format="pyarrow"):
            for k, lab, tok, c in zip(
                b["kind"].to_pylist(), b["label"].to_pylist(),
                b["tok"].to_pylist(), b["c"].to_pylist(),
            ):
                if k == 1:
                    counts[lab + _SEP + tok] = c
        lut_ref = ray.put((counts, nd, tl, v))
        if concurrency is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            concurrency = max(2, min(4, cpus - 2))
        return ds.map_batches(
            _NBScoreStage,
            fn_constructor_args=(lut_ref, id_col, text_col, label_col,
                                 split_mod),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    return _nb_classify_join(
        ds, model, nd, tl, v,
        id_col=id_col, text_col=text_col, label_col=label_col,
        split_mod=split_mod,
    )


def _nb_classify_join(ds, model, nd, tl, v, *, id_col, text_col,
                      label_col, split_mod):
    """Join path: the model never reaches the driver. Doc-token rows meet
    the token-count table once (inner join on ``tok``); per-(doc, label)
    deltas relative to the per-label OOV default are summed distributed
    and left-join the exploded (doc × L) base scores."""
    labels = sorted(nd)
    n_total = sum(nd.values())
    prior = {l: _term_q4(nd[l] - 1, n_total) for l in labels}
    den = {l: tl[l] + v for l in labels}
    default = {l: _term_q4(0, den[l]) for l in labels}

    def tok_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_i, out_t, out_k = [], [], []
        for i, text in zip(ids, texts):
            for t, k in Counter(_tokens(text)).items():
                out_i.append(i)
                out_t.append(t)
                out_k.append(k)
        return pa.table({
            id_col: pa.array(out_i, batch[id_col].type),
            "tok": pa.array(out_t, pa.string()),
            "k": pa.array(out_k, pa.int64()),
        })

    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(2, min(64, cpus // 2))
    tok_counts = (model.filter(expr="kind == 1")
                  .select_columns(["label", "tok", "c"]))
    matched = (ds.map_batches(tok_rows, batch_format="pyarrow")
               .join(tok_counts, join_type="inner",
                     num_partitions=nparts, on=("tok",)))

    den_ref = ray.put((den, default))

    def delta_rows(batch: pa.Table) -> pa.Table:
        dd, df = ray.get(den_ref)
        labs = batch["label"].to_pylist()
        c = np.asarray(batch["c"], dtype=np.int64)
        k = np.asarray(batch["k"], dtype=np.int64)
        dens = np.fromiter((dd[l] for l in labs), np.int64, len(labs))
        defaults = np.fromiter((df[l] for l in labs), np.int64, len(labs))
        terms = np.floor(
            np.log((c + 1.0) / dens.astype(np.float64)) * _SCALE + 0.5
        ).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "label": batch["label"],
            "delta": pa.array(k * (terms - defaults), pa.int64()),
        })

    from ray.data.aggregate import Sum

    deltas = (matched.map_batches(delta_rows, batch_format="pyarrow")
              .groupby([id_col, "label"])
              .aggregate(Sum("delta", alias_name="delta")))

    base_ref = ray.put((labels, prior, default))

    def base_rows(batch: pa.Table) -> pa.Table:
        labs, pr, df = ray.get(base_ref)
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        trues = batch[label_col].to_pylist()
        out = {id_col: [], "label": [], "base_q4": [], "n_tokens": [],
               "true_lang": []}
        for i, text, tr in zip(ids, texts, trues):
            nt = len(_tokens(text))
            for l in labs:
                out[id_col].append(i)
                out["label"].append(l)
                out["base_q4"].append(pr[l] + nt * df[l])
                out["n_tokens"].append(nt)
                out["true_lang"].append(tr)
        return pa.table({
            id_col: pa.array(out[id_col], batch[id_col].type),
            "label": pa.array(out["label"], pa.string()),
            "base_q4": pa.array(out["base_q4"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "true_lang": pa.array(out["true_lang"], pa.string()),
        })

    scored = (ds.map_batches(base_rows, batch_format="pyarrow")
              .join(deltas, join_type="left_outer",
                    num_partitions=nparts, on=(id_col, "label")))

    # argmax-per-doc hash-shards the doc id and resolves EVERY doc in the
    # shard with one vectorized sort pass — never one map_groups call per
    # doc (the per-tiny-group scheduler tax) — Arrow blocks throughout
    n_shards = max(16, nparts * 2)

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "shard", pa.array((ids * 2654435761 % n_shards)
                              .astype(np.int64)))

    def pick_shard(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        score = (g["base_q4"].to_numpy(zero_copy_only=False)
                 + pc.fill_null(g["delta"], 0).to_numpy(
                     zero_copy_only=False).astype(np.int64))
        tmp = pa.table({
            "i": pa.array(ids),
            "ns": pa.array(-score),
            "label": g["label"],
        })
        order = pc.sort_indices(
            tmp, sort_keys=[("i", "ascending"), ("ns", "ascending"),
                            ("label", "ascending")]
        ).to_numpy(zero_copy_only=False)
        first = np.r_[True, ids[order][1:] != ids[order][:-1]]
        sel = order[first]
        win = g.take(pa.array(sel))
        wid = ids[sel]
        return pa.table({
            id_col: win[id_col],
            "pred_lang": win["label"],
            "score_q4": pa.array(score[sel].astype(np.int64)),
            "n_tokens": win["n_tokens"],
            "is_train": pa.array((wid % 10 < split_mod).astype(np.int64)),
            "correct": pc.cast(
                pc.equal(win["label"], win["true_lang"]), pa.int64()),
        })

    return (scored.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(pick_shard, batch_format="pyarrow"))
