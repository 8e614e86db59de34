"""DBSCAN over an embedding column (Ester et al. 1996, public method)
with cosine similarity as the neighborhood predicate — the
density-aware complement to ``stages/similarity.py:semantic_dedup``:
SemDeDup treats every threshold component as one cluster; DBSCAN
additionally separates dense CORES from BORDER points and labels
sparse points NOISE, which is what a curation pipeline wants when
"near-dup cluster" and "topical blob" must not be conflated.

Deterministic pins (the twin replays each):

- neighbor predicate: ``ROUND(cosine, 4) ≥ tau`` (the
  ``cosine_edges`` contract — rounding makes the edge SET bit-equal);
  SELF is excluded.
- core ⇔ neighbor count ≥ ``min_samples``.
- clusters = connected components of the CORE-CORE edge subgraph;
  label = MIN core id (the ``stages/cluster.py`` convention).
- border = non-core with ≥1 core neighbor; attaches to the MIN label
  among adjacent cores (sklearn attaches to the first-visited — a
  traversal-order artifact; MIN is the order-free pin).
- everything else = noise, ``cluster_id = -1``.

Scale shape: edge generation rides ``cosine_edges``' exact path
(bounded broadcast unit matrix, ``max_rows`` guard — the IVF-bucketed
variant is the documented scale route, as for SemDeDup); components
ride ``connected_components`` (large-star/small-star). Both label
pulls are node-sized, inside the same ``max_rows`` budget the edge
path already enforces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def dbscan_embeddings(
    ds,
    *,
    tau: float = 0.35,
    min_samples: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_rows: int = 200_000,
) -> "ray.data.Dataset":
    """→ Dataset (vec_id, cluster_id, role) covering EVERY input row:
    role ∈ {core, border, noise}; noise has cluster_id = -1."""
    from ray.data.aggregate import Min, Sum

    from .cluster import connected_components
    from .similarity import cosine_edges

    e = cosine_edges(ds, tau, id_col=id_col, emb_col=emb_col,
                     max_rows=max_rows).materialize()

    def both(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([a, b]).astype(np.int64)),
            "v": pa.array(np.concatenate([b, a]).astype(np.int64))})

    adj = e.map_batches(both, batch_format="pyarrow").materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch["u"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"u": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    deg = (adj.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("u").aggregate(Sum("c", alias_name="deg"))
           .materialize())

    # node-sized pulls — inside the max_rows budget cosine_edges enforces
    from ..ops.gutil import collect_tables

    core: set[int] = set()
    for t in collect_tables(deg):
        u = t["u"].to_numpy(zero_copy_only=False)
        d = t["deg"].to_numpy(zero_copy_only=False)
        core.update(int(x) for x in u[d >= min_samples])
    core_ref = ray.put(frozenset(core))

    def core_core(batch: pa.Table) -> pa.Table:
        cs = ray.get(core_ref)
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(((int(x) in cs and int(y) in cs)
                            for x, y in zip(a, b)),
                           dtype=bool, count=len(a))
        return batch.filter(pa.array(keep))

    core_labels: dict[int, int] = {c: c for c in core}  # singletons
    cc = connected_components(
        e.map_batches(core_core, batch_format="pyarrow")).materialize()
    for t in collect_tables(cc):
        core_labels.update(zip(
            (int(x) for x in t["node"].to_pylist()),
            (int(x) for x in t["label"].to_pylist())))
    lab_ref = ray.put(core_labels)

    # border candidates: non-core u adjacent to core v → min core label
    def border_cand(batch: pa.Table) -> pa.Table:
        lab = ray.get(lab_ref)
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        out_u, out_l = [], []
        for x, y in zip(u, v):
            ly = lab.get(int(y))
            if ly is not None and int(x) not in lab:
                out_u.append(int(x))
                out_l.append(ly)
        return pa.table({"node": pa.array(out_u, pa.int64()),
                         "lab": pa.array(out_l, pa.int64())})

    border_ds = (adj.map_batches(border_cand, batch_format="pyarrow")
                 .groupby("node").aggregate(Min("lab",
                                                alias_name="lab"))
                 .materialize())
    border_labels: dict[int, int] = {}
    for t in collect_tables(border_ds):
        border_labels.update(zip(
            (int(x) for x in t["node"].to_pylist()),
            (int(x) for x in t["lab"].to_pylist())))
    bord_ref = ray.put(border_labels)

    def attach(batch: pa.Table) -> pa.Table:
        lab = ray.get(lab_ref)
        bord = ray.get(bord_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        cl = np.empty(len(ids), dtype=np.int64)
        role = []
        for i, x in enumerate(ids):
            x = int(x)
            if x in lab:
                cl[i] = lab[x]
                role.append("core")
            elif x in bord:
                cl[i] = bord[x]
                role.append("border")
            else:
                cl[i] = -1
                role.append("noise")
        return pa.table({
            id_col: pa.array(ids),
            "cluster_id": pa.array(cl),
            "role": pa.array(role, pa.string())})

    return ds.select_columns([id_col]).map_batches(
        attach, batch_format="pyarrow")
