"""Tokenized binary shards — the pretraining-consumable output format.

Downstream of the training export (``pipelines/training_export.py``):
each train-split context-window bin becomes one binary shard of uint32
token ids (documents concatenated in shuffle order, the public
Megatron-LM ``.bin`` + index layout re-derived from its format docs),
plus a JSON index carrying per-shard doc boundaries and token counts —
the random-access metadata a data loader needs.

Tokenization is the deterministic hash vocabulary: id = FNV-1a(token)
mod ``vocab_size`` (the same token hashing family as MinHash/DSIR), so
the whole artifact is a pure function of the corpus and every byte is
SQL-replayable (★ ``q_token_shards`` hashes each shard's id sequence).
A learned byte-level BPE (``stages/bpe.py``) swaps in via
``bpe_model=``: the model is broadcast once and each shard task encodes
its docs with a per-task word cache (pytest-pinned; the FNV path stays
the SQL-replayable default).

Scale shape: bin assignment arrives from the export's prefix scan (slim
rows); texts attach through one hash join on doc_id (only train docs
move); one ``groupby(bin)`` co-locates each shard's docs — a shard is
a context-window budget (~``window`` tokens), so groups are small and
uniform by construction. Writes are one file per shard under
``split=train/`` — resumable, never one giant file.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.dedup import _fnv_token_hashes
from .training_export import train_bins, training_survivors

VOCAB_DEFAULT = 50_000


def ids_for_tokens(toks: list[str], vocab_size: int = VOCAB_DEFAULT,
                   cache: dict | None = None) -> np.ndarray:
    """token strings → uint32 ids (FNV-1a mod vocab)."""
    if not toks:
        return np.empty(0, dtype=np.uint32)
    th = _fnv_token_hashes(toks, cache if cache is not None else {})
    return (th % np.uint64(vocab_size)).astype(np.uint32)


def _canon_bins(df: pd.DataFrame) -> pa.Table:
    """Typed-arrow canonicalization (empty pandas blocks have no columns,
    which the hash join rejects)."""
    if "doc_id" not in df.columns:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "bin": pa.array([], pa.int64())})
    return pa.table({
        "doc_id": pa.array(df["doc_id"].astype("int64")),
        "pos": pa.array(df["pos"].astype("int64")),
        "bin": pa.array(df["bin"].astype("int64")),
    })


def token_shard_records(
    sf_dir: str,
    *,
    vocab_size: int = VOCAB_DEFAULT,
    seed: str = "s0",
    window: int = 2048,
    out_dir: str | None = None,
    bpe_model=None,
) -> "ray.data.Dataset":
    """→ one metadata row per train shard: (bin, n_docs, n_tokens,
    ids_md5) with ids_md5 = md5 of the ids rendered as comma-joined
    decimals (the SQL-replayable content hash). With ``out_dir``, each
    group task ALSO writes its shard's raw little-endian uint32 ``.bin``
    file from the worker (tmp + atomic rename) — the bytes never visit
    the driver; only the index metadata does."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # train_bins is the only consumer and materializes its own slim
    # projection — no need to pin the full survivors here
    survivors = training_survivors(docs, seed=seed)
    bins = (
        train_bins(survivors, window=window)
        .map_batches(_canon_bins, batch_format="pandas")
        .materialize()
    )
    # attach text: broadcast the slim (doc_id → pos, bin) map below the
    # cap (the engine's threshold-switch pattern — 24 B/row, so 500k rows
    # ≈ 12 MB of driver traffic), native hash join above it
    n_bin_rows = bins.count()
    if n_bin_rows <= 500_000:
        bin_map = {
            int(r["doc_id"]): (int(r["pos"]), int(r["bin"]))
            for r in bins.iter_rows()
        }
        map_ref = ray.put(bin_map)

        def tag(df: pd.DataFrame) -> pd.DataFrame:
            bm = ray.get(map_ref)
            m = df["doc_id"].isin(bm)
            out = df.loc[m, ["doc_id", "text"]].copy()
            out["pos"] = [bm[int(d)][0] for d in out["doc_id"]]
            out["bin"] = [bm[int(d)][1] for d in out["doc_id"]]
            return out

        tagged = docs.map_batches(tag, batch_format="pandas")
    else:
        tagged = bins.join(docs, join_type="inner", num_partitions=8,
                           on=("doc_id",))

    bpe_ref = ray.put(bpe_model) if bpe_model is not None else None

    def shardify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("pos", kind="mergesort")
        cache: dict = {}
        if bpe_ref is not None:
            from ..stages.bpe import encode_doc

            model = ray.get(bpe_ref)
            parts = [encode_doc(model, t, cache) for t in g["text"]]
        else:
            parts = [
                ids_for_tokens((t or "").lower().split(), vocab_size, cache)
                for t in g["text"]
            ]
        ids = (np.concatenate(parts) if parts
               else np.empty(0, dtype=np.uint32))
        text_repr = ",".join(str(i) for i in ids.tolist())
        b = int(g["bin"].iloc[0])
        if out_dir is not None:
            path = os.path.join(out_dir, f"bin_{b:06d}.bin")
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(ids.astype("<u4").tobytes())
            os.replace(tmp, path)
        return pd.DataFrame({
            "bin": [b],
            "n_docs": np.array([len(g)], dtype="int64"),
            "n_tokens": np.array([len(ids)], dtype="int64"),
            "ids_md5": [hashlib.md5(text_repr.encode()).hexdigest()],
        })

    # coalesce before the per-bin groupby: its input is slim tagged rows
    # spread over many near-empty blocks — pure sort-shuffle fixed cost at
    # small scale; partition count grows with the data so shard builds
    # stay parallel at corpus scale
    n_parts = max(4, min(64, n_bin_rows // 1000 + 4))
    return (tagged.repartition(n_parts)
            .groupby("bin").map_groups(shardify, batch_format="pandas"))


def write_token_shards(
    sf_dir: str,
    out_dir: str,
    *,
    vocab_size: int = VOCAB_DEFAULT,
    seed: str = "s0",
    window: int = 2048,
    bpe_model=None,
) -> dict:
    """Write one ``bin_<N>.bin`` (raw little-endian uint32 ids) per train
    shard plus ``index.json`` (per-shard doc/token counts, content md5,
    config echo). Shard bytes are deterministic and writes are atomic
    renames, so re-runs converge to identical files regardless of what a
    crash left behind."""
    os.makedirs(out_dir, exist_ok=True)
    index_path = os.path.join(out_dir, "index.json")

    # workers write the shard bytes; the driver only collects the
    # KB-scale index rows
    rows = token_shard_records(
        sf_dir, vocab_size=vocab_size, seed=seed, window=window,
        out_dir=out_dir, bpe_model=bpe_model,
    ).take_all()

    shards: dict = {}
    for row in sorted(rows, key=lambda r: r["bin"]):
        name = f"bin_{row['bin']:06d}.bin"
        shards[name] = {"n_docs": int(row["n_docs"]),
                        "n_tokens": int(row["n_tokens"]),
                        "ids_md5": row["ids_md5"]}

    index = {"vocab_size": (bpe_model.vocab_size if bpe_model is not None
                            else vocab_size),
             "tokenizer": "bpe" if bpe_model is not None else "fnv",
             "seed": seed, "window": window,
             "sf_dir": sf_dir, "dtype": "uint32le", "shards": shards}
    if bpe_model is not None:
        # persist the model next to the shards — ids are meaningless to a
        # loader without the merge table
        from ..stages.bpe import model_to_json

        mp = os.path.join(out_dir, "bpe_model.json")
        tmp_m = mp + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump(model_to_json(bpe_model), f)
        os.replace(tmp_m, mp)
        index["bpe_model"] = "bpe_model.json"
    tmp = index_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(index, f, indent=1, sort_keys=True)
    os.replace(tmp, index_path)
    return index


def read_token_shards(out_dir: str) -> "ray.data.Dataset":
    """Loader-side read path: the shard directory back as a Dataset of
    (bin, ids) rows — ``read_binary_files`` streams the `.bin` blobs,
    a zero-copy-ish decode maps bytes → uint32 arrays. Index metadata is
    verified against the decoded lengths (a truncated shard fails loudly
    instead of training on garbage)."""
    with open(os.path.join(out_dir, "index.json")) as f:
        index = json.load(f)
    shards = index["shards"]

    ds = ray.data.read_binary_files(
        [os.path.join(out_dir, name) for name in sorted(shards)],
        include_paths=True,
    )

    def decode(batch: pd.DataFrame) -> pd.DataFrame:
        bins, ids_col = [], []
        for path, raw in zip(batch["path"], batch["bytes"]):
            name = os.path.basename(path)
            ids = np.frombuffer(raw, dtype="<u4")
            want = shards[name]["n_tokens"]
            if len(ids) != want:
                raise ValueError(
                    f"shard {name}: {len(ids)} tokens on disk, index says "
                    f"{want} — refusing to serve a corrupt shard")
            bins.append(int(name[len("bin_"):-len(".bin")]))
            ids_col.append(ids)
        return pd.DataFrame({"bin": pd.array(bins, dtype="int64"),
                             "ids": ids_col})

    return ds.map_batches(decode, batch_format="pandas")


def iter_training_sequences(out_dir: str, seq_len: int,
                            drop_last: bool = True):
    """Yield fixed-length uint32 sequences for a training loop, crossing
    shard boundaries in bin order (the documents were already packed into
    ~window-token bins upstream; this is the final exact-length slicer).
    Driver-side generator — each shard is held only while being sliced."""
    carry = np.empty(0, dtype=np.uint32)
    rows = sorted(
        read_token_shards(out_dir).iter_rows(), key=lambda r: r["bin"]
    )
    for row in rows:
        buf = np.concatenate([carry, np.asarray(row["ids"],
                                                dtype=np.uint32)])
        n_full = len(buf) // seq_len
        for i in range(n_full):
            yield buf[i * seq_len:(i + 1) * seq_len]
        carry = buf[n_full * seq_len:]
    if len(carry) and not drop_last:
        yield carry
