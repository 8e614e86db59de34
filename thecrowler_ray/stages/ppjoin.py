"""Exact set-similarity join via prefix filtering (Chaudhuri et al.
2006 SSJoin / Xiao et al. 2008 PPJoin — public algorithms): every doc
pair with token-set Jaccard ≥ t, with NO false negatives — the exact
counterpart to MinHash-LSH's probabilistic recall.

Principle: order every doc's distinct tokens by one GLOBAL total order
(document frequency ascending, rarest first — any consistent order is
correct, rare-first minimizes candidates). If |A∩B|/|A∪B| ≥ t, the two
ordered sets must share a token within their PREFIXES of length
n − ⌈t·n⌉ + 1 — so only docs co-occurring under a prefix token are
candidates, and the candidate count is bounded by the df of RARE
tokens, not by |corpus|².

Distribution shape:
  1. (doc, token) distinct rows stream out of one ``map_batches``
     (text read once, never shuffled).
  2. token df = one slim groupby; the (df, token-hash) order LUT
     broadcasts sorted (callers enforce the vocab threshold — beyond
     it, rank by (df, hash) needs a distributed sort-rank pass).
  3. prefix rows group by a uniform token-hash shard; per shard ONE
     run-length pair explosion across all tokens (no per-token
     scheduler round-trip).
  4. candidates dedupe through a slim (a, b) groupby and verify with
     integer counts — ``den·inter ≥ num·union`` exactly (the
     threshold is the rational num/den, so both engines compare
     integers), via one batch-vectorized duplicate-count merge.
  5. the verify token sets are built ONLY for docs that appear in a
     candidate pair (the near-dup doc fraction). Below a doc-count
     threshold they broadcast once as a ragged (keys, offsets, flat)
     table; above it they SHIP TO THEIR PAIRS through two distributed
     hash joins on doc id as binary columns — the driver never holds
     the set table at scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..ops.gutil import append_key_shard, default_n_shards


def _tok_hash(tokens: list[str]) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(t.encode()).hexdigest()[:16], 16) >> 1
         for t in tokens),
        dtype=np.int64, count=len(tokens))


def _doc_tokens(text: str, k: int = 1) -> list[str]:
    ws = [w for w in (text or "").lower().split() if w]
    if k <= 1:
        return sorted(set(ws))
    return sorted({" ".join(ws[i:i + k])
                   for i in range(len(ws) - k + 1)})


def ppjoin_pairs(
    ds,
    *,
    threshold_num: int = 7,
    threshold_den: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 1,
    max_docs_per_token: int | None = None,
    cap_mode: str = "raise",
    broadcast_doc_threshold: int = 200_000,
) -> "ray.data.Dataset":
    """→ Dataset (doc_a, doc_b, inter, uni): every unordered doc pair
    with den·|A∩B| ≥ num·|A∪B| (Jaccard ≥ num/den, exact), doc_a <
    doc_b, sorted (doc_a, doc_b). Tokens: distinct lowercase
    whitespace words (``shingle_k=1``) or k-word shingles — shingles
    are the near-dup semantics (MinHash's set definition): on a
    small-vocab corpus unigram sets make almost EVERY pair similar
    (the exact answer is inherently quadratic), while shingle vocab
    grows with the corpus and keeps the output at true near-dups.
    Docs shorter than ``shingle_k`` words have no set and never pair.

    ``max_docs_per_token`` (default None = exact, the DuckDB-twin
    contract) is an explicit exactness ESCAPE HATCH for adversarial
    prefix-token skew: with ``cap_mode="raise"`` (default) an exceeded
    cap raises instead of silently dropping pairs; ``cap_mode="drop"``
    opts into false negatives for oversize prefix groups.

    Verification switches on the candidate-doc count:
    ≤ ``broadcast_doc_threshold`` docs broadcast one (keys, offsets,
    flat-tokens) table via ``ray.put`` (covers only the near-dup doc
    fraction); above it, per-doc token sets ship to their pairs as
    slim binary columns through two distributed hash joins on doc id
    — nothing pair-shaped ever materializes on the driver. Both paths
    verify with the same batch-vectorized duplicate-count merge (one
    lexsort per batch, no per-pair Python loop)."""

    # 1. (doc, token-hash) distinct rows + per-doc sizes
    def tok_rows(t: pa.Table) -> pa.Table:
        ids, hs, ns = [], [], []
        for did, text in zip(t[id_col].to_pylist(),
                             t[text_col].to_pylist()):
            toks = _doc_tokens(text, shingle_k)
            h = _tok_hash(toks)
            ids.extend([did] * len(h))
            hs.append(h)
            ns.extend([len(h)] * len(h))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "th": pa.array(np.concatenate(hs) if hs else
                           np.array([], dtype=np.int64)),
            "n": pa.array(ns, pa.int64())})

    rows = ds.select_columns([id_col, text_col]).map_batches(
        tok_rows, batch_format="pyarrow").materialize()

    # 2. global order: df ascending, token-hash tiebreak — one slim
    # groupby, then the order LUT broadcasts as two sorted arrays
    from ray.data.aggregate import Count

    df_tbl = rows.groupby("th").aggregate(Count(alias_name="df"))
    from ..ops.gutil import collect_tables

    ths, dfs = [], []
    for t in collect_tables(df_tbl):
        ths.append(t["th"].to_numpy(zero_copy_only=False).astype(np.int64))
        dfs.append(t["df"].to_numpy(zero_copy_only=False).astype(np.int64))
    th_all = np.concatenate(ths) if ths else np.array([], dtype=np.int64)
    df_all = np.concatenate(dfs) if dfs else np.array([], dtype=np.int64)
    order = np.lexsort((th_all, df_all))  # (df asc, hash asc)
    rank_of = np.empty(len(order), dtype=np.int64)
    rank_of[order] = np.arange(len(order))
    key_sorted = np.sort(th_all)
    rank_by_key = rank_of[np.argsort(th_all)]
    rank_ref = ray.put((key_sorted, rank_by_key))

    # 3. per-doc prefix rows: keep the n − ⌈t·n⌉ + 1 globally-rarest
    # tokens of each doc (complete for Jaccard ≥ num/den)
    def prefix_rows(t: pa.Table) -> pa.Table:
        k, r = ray.get(rank_ref)
        did = t[id_col].to_numpy(zero_copy_only=False)
        th = t["th"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        rk = r[np.searchsorted(k, th)]
        # per-doc: sort rows by (doc, rank); keep positions < p(doc)
        o = np.lexsort((rk, did))
        did, th, n, rk = did[o], th[o], n[o], rk[o]
        starts = np.flatnonzero(np.r_[True, did[1:] != did[:-1]]) \
            if len(did) else np.array([], dtype=np.int64)
        sizes = np.diff(np.r_[starts, len(did)])
        pos = np.arange(len(did)) - np.repeat(starts, sizes)
        ceil_tn = -((-threshold_num * n) // threshold_den)
        p = n - ceil_tn + 1
        keep = pos < p
        return pa.table({"th": pa.array(th[keep]),
                         id_col: pa.array(did[keep]),
                         "n": pa.array(n[keep])})

    pref = rows.map_batches(prefix_rows, batch_format="pyarrow")

    # 4. candidate pairs: one run-length explosion per token-hash shard
    n_shards = default_n_shards(4)

    def shard_pairs(g: pa.Table) -> pa.Table:
        from .basket import _pair_explode

        th = g["th"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((did, th))
        b, v, nv = th[order], did[order], nn[order]
        if len(b) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        sizes = np.diff(np.r_[starts, len(b)])
        if max_docs_per_token is not None:
            big = sizes > max_docs_per_token
            if big.any():
                if cap_mode != "drop":
                    raise RuntimeError(
                        f"ppjoin: {int(big.sum())} prefix tokens exceed "
                        f"max_docs_per_token={max_docs_per_token} (max "
                        f"{int(sizes.max())} docs); pass cap_mode='drop' "
                        "to accept false negatives for those tokens")
                keepm = ~np.repeat(big, sizes)
                b, v, nv = b[keepm], v[keepm], nv[keepm]
        # the two explosions pair the SAME row positions (the pairing is
        # a pure function of the run array b), so (xn, yn) are the
        # exploded docs' set sizes
        x, y = _pair_explode(b, v)
        if len(x) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        xn, yn = _pair_explode(b, nv)
        # LENGTH FILTER (PPJoin): Jaccard ≤ min(n)/max(n) — a pair whose
        # size ratio is already below t can never verify; this is the
        # pruning that tames template-heavy corpora where rare template
        # tokens put thousands of near-identical docs in one prefix group
        lo = np.minimum(xn, yn)
        hi = np.maximum(xn, yn)
        keep = threshold_den * lo >= threshold_num * hi
        x, y = x[keep], y[keep]
        if len(x) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        u = np.unique(np.stack([x, y], axis=1), axis=0)
        return pa.table({"a": pa.array(u[:, 0]), "b": pa.array(u[:, 1])})

    cand = (pref.map_batches(
                lambda t: append_key_shard(t, "th", n_shards, "_pshard"),
                batch_format="pyarrow")
            .groupby("_pshard")
            .map_groups(shard_pairs, batch_format="pyarrow")
            .groupby(["a", "b"]).count().drop_columns(["count()"]))

    # 5. verify — candidate doc ids (slim int64, the near-dup doc
    # fraction) filter the token rows on either path
    cand = cand.materialize()
    cd_parts = [
        np.unique(np.concatenate([
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False)]))
        for t in collect_tables(cand)
    ]
    cand_ids = (np.unique(np.concatenate(cd_parts)) if cd_parts
                else np.array([], dtype=np.int64))
    if len(cand_ids) == 0:
        return ray.data.from_arrow(_empty_result())
    cand_ref = ray.put(cand_ids)

    def only_candidates(t: pa.Table) -> pa.Table:
        cids = ray.get(cand_ref)
        did = t[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cids, did)
        hit = (pos < len(cids)) & (
            cids[np.minimum(pos, max(len(cids) - 1, 0))] == did) \
            if len(cids) else np.zeros(len(did), dtype=bool)
        return t.filter(pa.array(hit))

    cand_rows = rows.map_batches(only_candidates, batch_format="pyarrow")

    if len(cand_ids) <= broadcast_doc_threshold:
        verified = _verify_broadcast(cand, cand_rows, id_col,
                                     threshold_num, threshold_den)
    else:
        verified = _verify_join(cand, cand_rows, id_col,
                                threshold_num, threshold_den, n_shards)
    return verified.sort(["doc_a", "doc_b"])


def _empty_result() -> pa.Table:
    return pa.table({c: pa.array([], pa.int64())
                     for c in ("doc_a", "doc_b", "inter", "uni")})


def _inter_union(a, b, A, la, B, lb, num: int, den: int) -> pa.Table:
    """Batch-vectorized exact verify: rows' token arrays arrive FLAT
    (A = concat of row i's set-A tokens, lengths la; likewise B/lb).
    Tokens are distinct within each per-doc set, so a (row, token)
    value occurring twice in A+B means token ∈ Aᵢ∩Bᵢ — one lexsort +
    adjacent-duplicate bincount gives every row's intersection."""
    n = len(a)
    ia = np.repeat(np.arange(n, dtype=np.int64), la)
    ib = np.repeat(np.arange(n, dtype=np.int64), lb)
    rid = np.concatenate([ia, ib])
    tok = np.concatenate([A, B])
    o = np.lexsort((tok, rid))
    rid, tok = rid[o], tok[o]
    dup = (rid[1:] == rid[:-1]) & (tok[1:] == tok[:-1])
    inter = np.bincount(rid[1:][dup], minlength=n).astype(np.int64)
    uni = la + lb - inter
    ok = den * inter >= num * uni
    return pa.table({"doc_a": pa.array(a[ok]),
                     "doc_b": pa.array(b[ok]),
                     "inter": pa.array(inter[ok]),
                     "uni": pa.array(uni[ok])})


def _verify_broadcast(cand, cand_rows, id_col: str, num: int, den: int):
    """Small-candidate path: ONE ragged (keys, offsets, flat-tokens)
    table broadcast via ray.put. All collected (doc, token) fragments
    concatenate BEFORE the global (doc, token) sort, so a doc whose
    rows span Ray block boundaries reunites instead of the last
    fragment overwriting earlier ones (r4 advice finding)."""
    from ..ops.gutil import collect_tables

    dids, ths = [], []
    for t in collect_tables(cand_rows):
        dids.append(t[id_col].to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        ths.append(t["th"].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
    did = np.concatenate(dids) if dids else np.array([], dtype=np.int64)
    th = np.concatenate(ths) if ths else np.array([], dtype=np.int64)
    o = np.lexsort((th, did))
    did, th = did[o], th[o]
    starts = np.flatnonzero(np.r_[True, did[1:] != did[:-1]]) \
        if len(did) else np.array([], dtype=np.int64)
    sizes = np.diff(np.r_[starts, len(did)])
    keys = did[starts]
    offs = np.r_[0, np.cumsum(sizes)]
    tab_ref = ray.put((keys, offs, th))

    def gather(flat, offs, idx):
        s = offs[idx]
        ln = offs[idx + 1] - s
        total = int(ln.sum())
        if total == 0:
            return np.array([], dtype=np.int64), ln
        base = np.repeat(s, ln)
        local = np.arange(total) - np.repeat(np.cumsum(ln) - ln, ln)
        return flat[base + local], ln

    def verify(t: pa.Table) -> pa.Table:
        keys, offs, flat = ray.get(tab_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        A, la = gather(flat, offs, np.searchsorted(keys, a))
        B, lb = gather(flat, offs, np.searchsorted(keys, b))
        return _inter_union(a, b, A, la, B, lb, num, den)

    return cand.map_batches(verify, batch_format="pyarrow")


def _verify_join(cand, cand_rows, id_col: str, num: int, den: int,
                 n_shards: int):
    """Scale path: per-doc token sets ship to their candidate pairs as
    slim binary columns through two distributed hash joins on doc id —
    no driver-side set table, payload proportional to candidate pairs.
    Per-doc sets assemble in a doc-hash-shard groupby (fragments of one
    doc co-locate by construction). Acero rejects list-typed join
    payloads, so each sorted int64 token set rides as its raw
    little-endian bytes (large_binary) and decodes zero-parse with
    ``np.frombuffer`` on the far side."""
    import ray as _ray

    def set_blobs(g: pa.Table) -> pa.Table:
        did = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        th = g["th"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((th, did))
        did, th = did[o], th[o]
        starts = np.flatnonzero(np.r_[True, did[1:] != did[:-1]]) \
            if len(did) else np.array([], dtype=np.int64)
        ends = np.r_[starts[1:], len(did)]
        raw = th.tobytes()
        blobs = [raw[s * 8:e * 8] for s, e in zip(starts, ends)]
        return pa.table({
            "doc": pa.array(did[starts] if len(did) else
                            np.array([], dtype=np.int64)),
            "ths": pa.array(blobs, pa.large_binary())})

    sets_ds = (cand_rows.map_batches(
                   lambda t: append_key_shard(t, id_col, n_shards,
                                              "_dshard"),
                   batch_format="pyarrow")
               .groupby("_dshard")
               .map_groups(set_blobs, batch_format="pyarrow"))

    nparts = max(8, int(_ray.cluster_resources().get("CPU", 8)))

    def rename(t: pa.Table, doc: str, ths: str) -> pa.Table:
        return t.select(["doc", "ths"]).rename_columns([doc, ths])

    j = cand.join(
        sets_ds.map_batches(lambda t: rename(t, "a", "ths_a"),
                            batch_format="pyarrow"),
        join_type="inner", num_partitions=nparts, on=("a",))
    j = j.join(
        sets_ds.map_batches(lambda t: rename(t, "b", "ths_b"),
                            batch_format="pyarrow"),
        join_type="inner", num_partitions=nparts, on=("b",))

    def flat_tokens(col) -> tuple[np.ndarray, np.ndarray]:
        """large_binary column → (flat int64 tokens, per-row counts)
        without a per-row decode loop: one buffer-level reinterpret."""
        arr = col.combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset: arr.offset + len(arr) + 1]
        vals = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        flat = np.frombuffer(
            vals[offs[0]:offs[-1]].tobytes(), dtype=np.int64)
        return flat, (offs[1:] - offs[:-1]) // 8

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_result()
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        A, la = flat_tokens(t["ths_a"])
        B, lb = flat_tokens(t["ths_b"])
        return _inter_union(a, b, A, la, B, lb, num, den)

    return j.map_batches(verify, batch_format="pyarrow")
