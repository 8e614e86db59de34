"""Byte-level BPE tokenizer — trained and applied as Ray Data passes.

From-scratch implementation of byte-pair encoding (Sennrich et al. 2016,
arXiv:1508.07909; byte-level base alphabet as in the public GPT-2
tokenizer description) — the learned-tokenizer half of the token-shard
plane (``pipelines/token_shards.py`` ships the FNV hash vocabulary and
declares this seam). The reference engine has no tokenizer plane; this
is a first-class training-data operator.

Scale shape:

1. **Word-count pass** (distributed) — ``map_batches`` Counter partials
   over whitespace-split lowercase words, one ``groupby("word")`` sum.
   Only (word, count) rows shuffle; the corpus text never does. BPE
   training classically operates on word *types* × counts, so this one
   pass is the entire corpus contact.
2. **Top-M prune** (distributed sort + limit) — the trainer consumes the
   ``max_words`` most frequent types (count DESC, word ASC — fully
   deterministic). Standard BPE-trainer practice: rare types contribute
   negligible pair mass; the prune is what bounds the driver pull at
   web scale (documented driver contact: ``max_words`` slim rows).
3. **Merge loop** (driver) — greedy highest-count pair merge with a
   total-order tie-break (count DESC, pair bytes ASC), incremental
   recount touching only words that contain the merged pair. Runs over
   the bounded type table, never the corpus.
4. **Encode pass** (distributed) — the merge ranks are broadcast once
   via ``ray.put``; an actor-pool ``map_batches`` stage applies the
   merges per word with a per-actor word→ids cache.

Byte-level base alphabet = ids 0..255, merge *i* mints id ``256+i`` —
every string is encodable with no <unk>, so decode(encode(x)) == x
byte-exactly, over the whitespace-normalized text (tokenization splits
on whitespace; words rejoin with a single space). That lossless
roundtrip is the SQL-checkable invariant: ★ ``q_bpe_roundtrip`` md5s
the decoded text per doc and DuckDB md5s the normalized source.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_INF = float("inf")


def _words(text: str | None) -> list[str]:
    """Pre-tokenization shared with the ngram/DSIR family: lowercase,
    whitespace split."""
    return (text or "").lower().split()


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def word_count_table(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, int]]:
    """Distributed word-type frequency table, pruned to the ``max_words``
    most frequent (count DESC, word ASC), pulled to the driver — the
    *only* driver contact of training, bounded by construction."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch[text_col].to_pylist():
            c.update(_words(text))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    top = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c", alias_name="c"))
        .sort(["c", "word"], descending=[True, False])
        .limit(max_words)
    )
    return [(r["word"], int(r["c"])) for r in top.iter_rows()]


def train_bpe_from_counts(
    word_counts: list[tuple[str, int]], n_merges: int, *, min_count: int = 2
) -> list[tuple[bytes, bytes]]:
    """Driver-side merge loop over the (bounded) word-type table.
    Deterministic: ties on pair count break toward the byte-wise
    smallest pair. Incremental recount — a merge touches only the words
    that contain the merged pair. Stops early when the best remaining
    pair's count drops below ``min_count``."""
    words: list[list[bytes]] = []
    counts: list[int] = []
    for w, c in word_counts:
        b = w.encode("utf-8")
        if len(b) < 2:
            continue  # no pairs to contribute
        words.append([b[i:i + 1] for i in range(len(b))])
        counts.append(c)

    pair_counts: Counter = Counter()
    pair_where: dict[tuple[bytes, bytes], set[int]] = {}
    for i, syms in enumerate(words):
        c = counts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_where.setdefault(p, set()).add(i)

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best_count = max(pair_counts.values())
        if best_count < min_count:
            break
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in list(pair_where.get(best, ())):
            syms = words[i]
            c = counts[i]
            # remove this word's old pair contributions
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_where.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del pair_where[p]
            # merge all occurrences left-to-right
            out: list[bytes] = []
            j = 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == best[0]
                    and syms[j + 1] == best[1]
                ):
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_where.setdefault(p, set()).add(i)
    return merges


class BpeModel:
    """Learned merges + the derived vocab. ids 0..255 are the raw bytes;
    merge *i* mints id ``256 + i``. Total vocab = 256 + len(merges)."""

    def __init__(self, merges: list[tuple[bytes, bytes]]):
        self.merges = merges
        self.ranks: dict[tuple[bytes, bytes], int] = {
            p: i for i, p in enumerate(merges)
        }
        self.token_to_id: dict[bytes, int] = {
            bytes([b]): b for b in range(256)
        }
        for i, (a, b) in enumerate(merges):
            self.token_to_id[a + b] = 256 + i
        self.id_to_token: list[bytes] = [b""] * len(self.token_to_id)
        for tok, tid in self.token_to_id.items():
            self.id_to_token[tid] = tok

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def encode_word(self, word: str, cache: dict | None = None) -> list[int]:
        if cache is not None and word in cache:
            return cache[word]
        b = word.encode("utf-8")
        syms = [b[i:i + 1] for i in range(len(b))]
        while len(syms) > 1:
            best, best_rank = None, _INF
            for p in zip(syms, syms[1:]):
                r = self.ranks.get(p, _INF)
                if r < best_rank:
                    best, best_rank = p, r
            if best is None or best_rank == _INF:
                break
            merged = best[0] + best[1]
            out: list[bytes] = []
            j = 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == best[0]
                    and syms[j + 1] == best[1]
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        ids = [self.token_to_id[s] for s in syms]
        if cache is not None:
            cache[word] = ids
        return ids

def encode_doc(model: BpeModel, text: str | None, cache: dict | None = None
               ) -> np.ndarray:
    """Whole-document encoding with an explicit space token between
    words (id of the single byte 0x20 — always in the base vocab), so
    the id stream is losslessly decodable to the whitespace-normalized
    text by plain concatenation."""
    parts: list[int] = []
    first = True
    for w in _words(text):
        if not first:
            parts.append(0x20)
        parts.extend(model.encode_word(w, cache))
        first = False
    return np.asarray(parts, dtype=np.uint32)


def decode_doc(model: BpeModel, ids) -> str:
    return b"".join(
        model.id_to_token[int(i)] for i in ids
    ).decode("utf-8")


def train_bpe(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    n_merges: int = 512,
    max_words: int = 100_000,
    min_count: int = 2,
) -> BpeModel:
    """End-to-end training: one distributed word-count pass, bounded
    driver merge loop."""
    wc = word_count_table(ds, text_col=text_col, max_words=max_words)
    return BpeModel(train_bpe_from_counts(wc, n_merges,
                                          min_count=min_count))


# ---------------------------------------------------------------------------
# distributed encode
# ---------------------------------------------------------------------------


class _BpeEncodeStage:
    """Actor-pool encode: model fetched once per actor from the object
    store, per-actor word→ids cache (Zipf makes the hit rate high)."""

    def __init__(self, model_ref, id_col: str, text_col: str):
        self.model: BpeModel = ray.get(model_ref)
        self.id_col = id_col
        self.text_col = text_col
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        ids_out, n_tokens, n_bytes, md5s = [], [], [], []
        for text in batch[self.text_col].to_pylist():
            ids = encode_doc(self.model, text, self.cache)
            decoded = decode_doc(self.model, ids)
            ids_out.append(ids)
            n_tokens.append(len(ids))
            n_bytes.append(len(decoded.encode("utf-8")))
            md5s.append(hashlib.md5(decoded.encode("utf-8")).hexdigest())
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "ids": pa.array(
                    [a.tolist() for a in ids_out], pa.list_(pa.uint32())
                ),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "roundtrip_md5": pa.array(md5s, pa.string()),
            }
        )


def bpe_encode_ds(
    ds: "ray.data.Dataset",
    model: BpeModel,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Distributed encode → (id, ids, n_tokens, n_bytes, roundtrip_md5).
    ``roundtrip_md5`` is md5 of decode(encode(text)) — equal to md5 of
    the whitespace-normalized source text iff the tokenizer is lossless
    (the ★ oracle invariant)."""
    model_ref = ray.put(model)
    if concurrency is None:
        # cluster-aware pool: a fixed pool of 4 starves co-scheduled
        # upstream ops on a 4-CPU cluster
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, min(4, cpus - 2))
    return ds.map_batches(
        _BpeEncodeStage,
        fn_constructor_args=(model_ref, id_col, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def bpe_roundtrip_records(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 256,
    max_words: int = 50_000,
) -> "ray.data.Dataset":
    """Train on ``ds``, encode ``ds``, return the SQL-checkable columns
    (id, n_tokens, n_bytes, roundtrip_md5). ``n_tokens`` is checkable
    too: with compression it is ≤ n_bytes, and for the twin's purposes
    it is engine-derived — the oracle pins (n_bytes, roundtrip_md5)."""
    model = train_bpe(ds, text_col=text_col, n_merges=n_merges,
                      max_words=max_words)
    return bpe_encode_ds(
        ds, model, id_col=id_col, text_col=text_col
    ).drop_columns(["ids"])


def model_to_json(model: BpeModel) -> dict:
    """Serializable form (latin-1 round-trips arbitrary bytes ↔ str
    losslessly): the merge list IS the model — ranks/vocab re-derive."""
    return {
        "format": "bpe-merges-v1",
        "merges": [
            [a.decode("latin-1"), b.decode("latin-1")]
            for a, b in model.merges
        ],
    }


def model_from_json(obj: dict) -> BpeModel:
    if obj.get("format") != "bpe-merges-v1":
        raise ValueError(f"unknown BPE model format: {obj.get('format')!r}")
    return BpeModel(
        [(a.encode("latin-1"), b.encode("latin-1"))
         for a, b in obj["merges"]]
    )
