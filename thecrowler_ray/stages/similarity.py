"""Similarity search over an embedding column (list<float>).

- ``topk_cosine``: brute-force cosine top-k against a broadcast query matrix
  (``ray.put`` once; numpy matmul per batch; per-batch partial top-k merged
  in a tiny final reduce — the Dataset is streamed, never materialized).
- ``lsh_topk_cosine``: random-hyperplane LSH buckets restrict the scan to
  candidate buckets (probing the query's bucket and its single-bit
  neighbors), then exact rerank.
- ``ivf_topk_cosine``: IVF-Flat — deterministic spherical-k-means coarse
  quantizer trained on a bounded sample, ``nprobe`` inverted lists scanned
  with exact rerank; nprobe = n_centroids degrades to the exact scan
  (which is how the oracle gate checks it).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _PartialTopK:
    """map_batches fn: batch of embeddings → per-(query, batch) top-k rows."""

    def __init__(self, query_ref, k: int, id_col: str, emb_col: str,
                 dtype=np.float32):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _unit(np.asarray(q, dtype=dtype))
        self.dtype = dtype
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _unit(np.asarray(batch[self.emb_col].to_pylist(), dtype=self.dtype))
        ids = np.asarray(batch[self.id_col].to_pylist())
        sims = emb @ self.q.T  # (N, Q)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            idx = np.argpartition(-sims[:, qi], k - 1)[:k]
            out_q.extend([qi] * k)
            out_id.extend(ids[idx].tolist())
            out_sim.extend(sims[idx, qi].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_id, batch[self.id_col].type),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )


def topk_cosine(ds, query: np.ndarray, k: int = 10, id_col: str = "vec_id",
                emb_col: str = "embedding", dtype=np.float32) -> pd.DataFrame:
    """Exact top-k by cosine for each row of ``query`` (Q × dim).
    → DataFrame (query_id, id_col, cosine, rank) — small, driver-side."""
    query = np.atleast_2d(np.asarray(query, dtype=dtype))
    qref = ray.put(query)
    partials = ds.map_batches(
        _PartialTopK,
        fn_constructor_args=(qref, k, id_col, emb_col, dtype),
        batch_format="pyarrow",
        concurrency=2,
    )
    # final merge: ≤ k rows per (query, block) — tiny
    heaps: dict[int, list] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for qi, vid, sim in zip(
            b["query_id"].to_pylist(), b[id_col].to_pylist(), b["cosine"].to_pylist()
        ):
            h = heaps.setdefault(qi, [])
            # break cosine ties by smallest id (deterministic)
            item = (sim, -vid if isinstance(vid, (int, np.integer)) else vid, vid)
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    rows = []
    for qi in sorted(heaps):
        ranked = sorted(heaps[qi], key=lambda t: (-t[0], t[2]))
        for rank, (sim, _, vid) in enumerate(ranked):
            rows.append((qi, vid, round(sim, 6), rank + 1))
    return pd.DataFrame(rows, columns=["query_id", id_col, "cosine", "rank"])


def train_ivf_centroids(ds, n_centroids: int = 64, sample_rows: int = 20_000,
                        iters: int = 10, seed: int = 13,
                        emb_col: str = "embedding") -> np.ndarray:
    """Deterministic spherical k-means on a bounded sample → (C, dim)
    unit-norm centroids. The sample is `limit(sample_rows)` — a bounded
    driver-side pull by design (training reads a fixed slice regardless of
    corpus size); assignment and search stay fully distributed."""
    sample = np.asarray(
        ds.limit(sample_rows).to_pandas()[emb_col].to_list(), dtype=np.float32
    )
    x = _unit(sample)
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        for k in range(len(c)):
            members = x[assign == k]
            if len(members):
                c[k] = members.mean(axis=0)
        c = _unit(c)
    return c


def ivf_assign_stage(centroids_ref, emb_col: str = "embedding"):
    """map_batches fn factory: append the nearest-centroid list id per row
    (the IVF partition key — at scale, write the corpus partitioned by
    ``ivf_list`` so queries read only the probed partitions)."""

    def fn(batch: pa.Table) -> pa.Table:
        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        emb = _unit(np.asarray(batch[emb_col].to_pylist(), dtype=np.float32))
        lists = (emb @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists))

    return fn


def ivf_topk_cosine(ds, query: np.ndarray, k: int = 10, n_centroids: int = 64,
                    nprobe: int = 8, id_col: str = "vec_id",
                    emb_col: str = "embedding",
                    centroids: np.ndarray | None = None,
                    dtype=np.float32) -> pd.DataFrame:
    """IVF approximate top-k: spherical-k-means coarse quantizer, scan only
    the ``nprobe`` inverted lists nearest each query, exact cosine rerank
    within (classic IVF-Flat — the scale path when the corpus is written
    partitioned by ``ivf_list``: a query touches nprobe/n_centroids of the
    data)."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, n_centroids, emb_col=emb_col)
    query = np.atleast_2d(np.asarray(query, dtype=np.float32))
    qunit = _unit(query)
    probe_lists = set(
        np.argsort(-(qunit @ centroids.T), axis=1)[:, :nprobe].reshape(-1).tolist()
    )
    cref = ray.put(centroids)
    assigned = ds.map_batches(ivf_assign_stage(cref, emb_col),
                              batch_format="pyarrow")
    cand = assigned.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["ivf_list"],
                             value_set=pa.array(sorted(probe_lists), pa.int32()))
        ),
        batch_format="pyarrow",
    )
    return topk_cosine(cand, query, k, id_col, emb_col, dtype=dtype)


def lsh_buckets_stage(dim: int, n_planes: int = 8, seed: int = 11):
    """map_batches fn factory: append an LSH bucket id per row."""
    planes = np.random.default_rng(seed).normal(size=(dim, n_planes)).astype(np.float32)

    def fn(batch: pa.Table, emb_col: str = "embedding") -> pa.Table:
        emb = np.asarray(batch[emb_col].to_pylist(), dtype=np.float32)
        bits = (emb @ planes > 0).astype(np.int64)
        bucket = bits @ (1 << np.arange(n_planes, dtype=np.int64))
        return batch.append_column("lsh_bucket", pa.array(bucket, pa.int64()))

    return fn, planes


def lsh_topk_cosine(ds, query: np.ndarray, k: int = 10, dim: int = 64,
                    n_planes: int = 8, id_col: str = "vec_id",
                    emb_col: str = "embedding") -> pd.DataFrame:
    """Approximate top-k: scan only the query's LSH bucket and its 1-bit
    neighbor buckets, exact rerank within. Scale path for 10^9+ vectors
    (bucket column doubles as a partition key for pruned reads)."""
    stage, planes = lsh_buckets_stage(dim, n_planes)
    query = np.atleast_2d(np.asarray(query, dtype=np.float32))
    qbits = (query @ planes > 0).astype(np.int64)
    qbuckets = qbits @ (1 << np.arange(n_planes, dtype=np.int64))
    candidates: set[int] = set()
    for qb in qbuckets:
        candidates.add(int(qb))
        for bit in range(n_planes):
            candidates.add(int(qb) ^ (1 << bit))
    bucketed = ds.map_batches(stage, batch_format="pyarrow")
    cand_list = list(candidates)
    filtered = bucketed.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["lsh_bucket"], value_set=pa.array(cand_list))),
        batch_format="pyarrow",
    )
    return topk_cosine(filtered, query, k, id_col, emb_col)


def _knn_rows(ids, emb_unit: np.ndarray, full_ids, full_unit: np.ndarray,
              k: int, id_type, round_digits: int) -> pa.Table:
    """Rows (src, dst, cosine) = top-k neighbors of each row of
    ``emb_unit`` within ``full_unit`` (self excluded), float64 matmul,
    ties broken by dst ASC."""
    sims = emb_unit @ full_unit.T  # (B, N) float64
    src_out, dst_out, cos_out = [], [], []
    full_ids_arr = np.asarray(full_ids)
    for i in range(len(ids)):
        row = sims[i]
        mask = full_ids_arr != ids[i]
        cand_idx = np.nonzero(mask)[0]
        kk = min(k, len(cand_idx))
        if kk == 0:
            continue
        part = cand_idx[np.argpartition(-row[cand_idx], kk - 1)[:kk]]
        # cosine ties at the k-boundary: argpartition picks an arbitrary
        # member of the tied set, but the ordering contract (and the SQL
        # twin's row_number) keeps the smallest dst — widen to every
        # candidate tied with the boundary value before the final sort
        boundary = row[part].min()
        tied = cand_idx[row[cand_idx] >= boundary]
        order = sorted(tied.tolist(),
                       key=lambda j: (-row[j], full_ids_arr[j]))[:kk]
        src_out.extend([ids[i]] * kk)
        dst_out.extend(full_ids_arr[order].tolist())
        cos_out.extend(np.round(row[order], round_digits).tolist())
    return pa.table({
        "src": pa.array(src_out, id_type),
        "dst": pa.array(dst_out, id_type),
        "cosine": pa.array(cos_out, pa.float64()),
    })


def knn_graph(ds, k: int = 5, id_col: str = "vec_id",
              emb_col: str = "embedding", max_rows: int = 200_000,
              round_digits: int = 4):
    """Exact k-nearest-neighbor graph by cosine → Dataset (src, dst,
    cosine): for every vector, its k closest others (the input to
    SemDeDup-style semantic dedup and graph-based curation).

    Brute-force path: the full unit matrix is pulled once (bounded by
    ``max_rows`` — a documented driver pull, like ``train_ivf_centroids``'s
    sample) and broadcast via ``ray.put``; each batch then matmuls
    against it in float64 — O(n·B·d) per batch, streamed, output stays
    distributed. Above ``max_rows`` use :func:`knn_graph_ivf`, which
    never materializes a global matrix."""
    import pandas as _pd

    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"knn_graph: {n} rows > max_rows={max_rows}; use "
            "knn_graph_ivf for the bucketed scale path")
    ids_all: list = []
    mats: list = []
    for b in ds.select_columns([id_col, emb_col]).iter_batches(
            batch_format="pyarrow"):
        ids_all.extend(b[id_col].to_pylist())
        mats.append(np.asarray(b[emb_col].to_pylist(), dtype=np.float64))
    full_unit = _unit(np.concatenate(mats)) if mats else np.empty((0, 0))
    ref = ray.put((ids_all, full_unit))

    def fn(batch: pa.Table) -> pa.Table:
        fids, funit = ray.get(ref)
        emb = _unit(np.asarray(batch[emb_col].to_pylist(), dtype=np.float64))
        return _knn_rows(batch[id_col].to_pylist(), emb, fids, funit, k,
                         batch[id_col].type, round_digits)

    return ds.map_batches(fn, batch_format="pyarrow")


def knn_graph_ivf(ds, k: int = 5, n_centroids: int = 64,
                  id_col: str = "vec_id", emb_col: str = "embedding",
                  round_digits: int = 4, centroids: np.ndarray | None = None):
    """Approximate kNN graph at scale: IVF-bucket the corpus (bounded-
    sample spherical k-means), then exact within-bucket kNN per group —
    no global matrix, each group bounded by its list size; the classic
    SemDeDup construction. ``n_centroids=1`` degrades to the exact
    graph (the parity gate)."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, n_centroids, emb_col=emb_col)
    cref = ray.put(centroids)
    assigned = ds.map_batches(ivf_assign_stage(cref, emb_col),
                              batch_format="pyarrow")

    def group_knn(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].tolist()
        emb = _unit(np.asarray(g[emb_col].to_list(), dtype=np.float64))
        t = _knn_rows(ids, emb, ids, emb, k,
                      pa.array(ids).type, round_digits)
        return t.to_pandas()

    return assigned.groupby("ivf_list").map_groups(
        group_knn, batch_format="pandas")


def cosine_edges(ds, tau: float, *, id_col: str = "vec_id",
                 emb_col: str = "embedding", max_rows: int = 200_000,
                 round_digits: int = 4):
    """All pairs (a < b) with ROUND(cosine, digits) ≥ tau → Dataset
    (doc_a, doc_b). Exact path: bounded broadcast unit matrix (the
    ``knn_graph`` budget), per-batch float64 matmul, threshold filter —
    only the (sparse) edge rows leave a task. The rounding makes the
    edge SET identical to the SQL twin's despite last-ulp dot-product
    differences."""
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"cosine_edges: {n} rows > max_rows={max_rows}; bucket with "
            "knn_graph_ivf/ivf_assign_stage for the scale path")
    ids_all: list = []
    mats: list = []
    for b in ds.select_columns([id_col, emb_col]).iter_batches(
            batch_format="pyarrow"):
        ids_all.extend(b[id_col].to_pylist())
        mats.append(np.asarray(b[emb_col].to_pylist(), dtype=np.float64))
    full_unit = _unit(np.concatenate(mats)) if mats else np.empty((0, 0))
    ref = ray.put((np.asarray(ids_all, dtype=np.int64), full_unit))

    def edges(batch: pa.Table) -> pa.Table:
        fids, funit = ray.get(ref)
        bids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        emb = _unit(np.asarray(batch[emb_col].to_pylist(),
                               dtype=np.float64))
        sims = np.round(emb @ funit.T, round_digits)
        # a < b halves the pairs and drops self-edges in one mask
        mask = (sims >= tau) & (bids[:, None] < fids[None, :])
        ai, bj = np.nonzero(mask)
        return pa.table({
            "doc_a": pa.array(bids[ai]),
            "doc_b": pa.array(fids[bj]),
        })

    return ds.map_batches(edges, batch_format="pyarrow")


def semantic_dedup(ds, tau: float = 0.4, *, id_col: str = "vec_id",
                   emb_col: str = "embedding", max_rows: int = 200_000):
    """SemDeDup (Abbas et al. 2023, public method): embedding-similarity
    edges → connected components → keep the minimum id per component.
    → Dataset (vec_id, cluster_id, keep) covering EVERY input row
    (singletons are their own cluster). Composition of
    :func:`cosine_edges` + ``stages.cluster.connected_components`` —
    all the scale reasoning lives in those two operators."""
    from .cluster import connected_components

    labels = connected_components(
        cosine_edges(ds, tau, id_col=id_col, emb_col=emb_col,
                     max_rows=max_rows)
    ).materialize()  # node-sized (only nodes that appear in an edge)

    lab: dict = {}
    for b in labels.iter_batches(batch_format="pyarrow"):
        lab.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
    lab_ref = ray.put(lab)

    def attach(batch: pa.Table) -> pa.Table:
        lab = ray.get(lab_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cluster = np.asarray([lab.get(int(i), int(i)) for i in ids],
                             dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids),
            "cluster_id": pa.array(cluster),
            "keep": pa.array(ids == cluster),
        })

    return ds.map_batches(attach, batch_format="pyarrow")
