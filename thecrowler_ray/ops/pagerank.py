"""PageRank (Brin & Page 1998) as deterministic fixed-point power
iteration over a Ray Data edge list.

A link-graph centrality operator for the crawl/curation plane (URL
importance for frontier prioritization and corpus quality weighting —
the role harmonic/PageRank centrality plays in public CommonCrawl
ranking). The reference engine scores links per page
(``pkg/crawler/keywords.go`` link heuristics, mirrored in
``ops/rank.py``); this adds the whole-graph iterative rank.

**Integer fixed-point — what makes 5 distributed iterations
hash-exact in SQL**: ranks live in q12 micro-units (init ``UNIT =
10^12``), damping 0.85 is the exact rational 17/20, and each edge
contribution is ``(r * 17) // (20 * outdeg)`` — pure int64 floor
division, so per-node sums are order-free and DuckDB replays every
iteration with chained CTEs, bit for bit. No float enters the
computation. (int64 headroom: max total mass ≈ N·UNIT, so N up to
~10^6 fits q12; at larger N pass a smaller ``unit`` — q6 clears 10^12
nodes.)

Iteration shape (Pregel-style, threshold-switched like
``stages/ngram_lm.py``):

- **broadcast path** (node table ≤ threshold): outdeg + ranks dicts are
  ``ray.put`` once per iteration; ``map_batches`` over the (never
  re-shuffled) edge list emits (dst, contrib); one ``groupby(dst)``
  sum; the node-sized result returns to the driver for the base-add.
  Per iteration: one shuffle of slim int rows.
- **join path** (above threshold): ranks stay distributed — edges ⋈
  ranks on src, groupby(dst) sum, nodes ⟕ sums; materialized per
  iteration (iterative algorithms are barrier-per-step by nature).

Dangling nodes (outdeg 0) simply emit nothing — their mass evaporates
(the simplest standard variant; both the engine and the SQL twin do
the same).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

UNIT = 10**12
DAMP_NUM = 17
DAMP_DEN = 20


def _node_tables(edges):
    """(nodes_ds (node, outdeg≥0), outdeg only for nodes with out-edges).
    One shuffle over slim id rows."""
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pa.Table:
        # per-batch combine: the shuffle moves ≤ distinct-nodes rows per
        # block instead of 2 rows per edge
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        s_u, s_c = np.unique(src, return_counts=True)
        d_u = np.unique(dst)
        return pa.concat_tables(
            [
                pa.table({"node": pa.array(s_u),
                          "od": pa.array(s_c.astype(np.int64))}),
                pa.table({"node": pa.array(d_u),
                          "od": pa.array(
                              np.zeros(len(d_u), dtype=np.int64))}),
            ]
        )

    return (
        edges.map_batches(explode, batch_format="pyarrow",
                          batch_size=None)
        .groupby("node")
        .aggregate(Sum("od", alias_name="outdeg"))
    )


def personalized_pagerank(
    edges,
    seeds,
    *,
    iterations: int = 5,
    unit: int = UNIT,
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Personalized PageRank (random walk with restart to ``seeds`` —
    Haveliwala 2002 topic-sensitive PageRank, public method): identical
    integer recurrence, but the teleport base (0.15·unit) and the
    initial rank (unit) go ONLY to seed nodes; everything else starts
    at 0 and earns rank through in-links. The crawl seed-expansion /
    related-page signal. Seeds outside the graph's node set are
    ignored (the node table defines the universe). Seed lists are
    human-curated and small — they broadcast whole on both paths."""
    if isinstance(seeds, ray.data.Dataset):
        from .gutil import collect_tables

        seed_ids = np.unique(np.concatenate(
            [t["node"].to_numpy(zero_copy_only=False)
             for t in collect_tables(seeds)]
            or [np.array([], dtype=np.int64)]).astype(np.int64))
    else:
        seed_ids = np.unique(np.asarray(sorted(seeds), dtype=np.int64))
    return pagerank(edges, iterations=iterations, unit=unit,
                    broadcast_threshold=broadcast_threshold,
                    _seed_ids=seed_ids)


def pagerank(
    edges,
    *,
    iterations: int = 5,
    unit: int = UNIT,
    broadcast_threshold: int = 2_000_000,
    _seed_ids: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """Edge-list Dataset (src, dst int64; parallel edges count as
    multiplicity) → Dataset (node, rank_q) after ``iterations`` rounds,
    ``rank_q`` the q-scaled integer rank. Base = 0.15·unit per node
    (seed nodes only when ``_seed_ids`` is given — see
    :func:`personalized_pagerank`)."""
    base = (unit * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    # block count scaled to the cluster, not the upstream layout: the
    # node-table combine emits ~distinct-nodes rows per block, and each
    # iteration schedules one task per block — dozens of near-empty
    # blocks would pay task round-trips for trivial compute. Slim int
    # rows → millions of edges per block are fine.
    edges = edges.select_columns(["src", "dst"]).materialize()
    n_edges = edges.count()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = max(min(cpus, 8), min(64, int(n_edges // 2_000_000) + 1))
    edges = edges.repartition(n_blocks).materialize()
    nodes = _node_tables(edges).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.drop_columns(["outdeg"])
    if n_nodes <= broadcast_threshold:
        return _pagerank_broadcast(edges, nodes, iterations, unit,
                                   base, _seed_ids)
    return _pagerank_join(edges, nodes, iterations, unit, base,
                          _seed_ids)


def _pagerank_broadcast(edges, nodes, iterations: int, unit: int,
                        base: int,
                        seed_ids: np.ndarray | None = None,
                        ) -> "ray.data.Dataset":
    """Small-node-table path: zero shuffles per iteration. Nodes get
    dense int32 indices (one broadcast dict), the edge list is re-keyed
    to (src_idx, dst_idx) ONCE and materialized; each iteration is one
    streaming map over it — per batch an exact int64 ``np.add.at``
    scatter into a node-dense partial, returned sparse (idx, val) — and
    a driver-side add of the ≤node-sized partials. No groupby, no
    per-edge dict lookups after the re-key."""
    from .gutil import collect_tables, dense_rekey

    id_parts: list = []
    od_parts: list = []
    for b in collect_tables(nodes):
        id_parts.append(b["node"].to_numpy(zero_copy_only=False))
        od_parts.append(b["outdeg"].to_numpy(zero_copy_only=False))
    node_ids = np.concatenate(id_parts).astype(np.int64)
    outdeg = np.concatenate(od_parts).astype(np.int64)
    sort_order = np.argsort(node_ids)
    node_ids = node_ids[sort_order]
    outdeg = outdeg[sort_order]
    n = len(node_ids)

    dense_edges = dense_rekey(edges, node_ids)
    if seed_ids is None:
        base_vec = np.full(n, base, dtype=np.int64)
        ranks = np.full(n, unit, dtype=np.int64)
    else:
        mask = np.isin(node_ids, seed_ids)
        base_vec = np.where(mask, base, 0).astype(np.int64)
        ranks = np.where(mask, unit, 0).astype(np.int64)
    # outdeg ≥ 1 for every src by construction; shipped through the
    # object store ONCE (a closure capture would re-serialize the
    # node-sized array with every task submission, every iteration)
    denom_ref = ray.put(DAMP_DEN * outdeg)

    for _ in range(iterations):
        ref = ray.put(ranks)

        def partial(batch: pa.Table) -> pa.Table:
            rk = ray.get(ref)
            denom = ray.get(denom_ref)
            s = batch["s"].to_numpy(zero_copy_only=False)
            d = batch["d"].to_numpy(zero_copy_only=False)
            c = (rk[s] * DAMP_NUM) // denom[s]
            acc = np.zeros(n, dtype=np.int64)
            np.add.at(acc, d, c)
            nz = np.nonzero(acc)[0]
            return pa.table(
                {
                    "i": pa.array(nz.astype(np.int64)),
                    "v": pa.array(acc[nz]),
                }
            )

        acc = base_vec.copy()
        # batch_size=None → whole blocks: the node-dense partial is
        # allocated per block, not per 1024-row micro-batch
        for b in collect_tables(dense_edges.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )):
            # collected blocks may repeat an index across tables —
            # fancy-index += would drop the duplicates; add.at is the
            # unbuffered scatter-add
            np.add.at(
                acc,
                b["i"].to_numpy(zero_copy_only=False),
                b["v"].to_numpy(zero_copy_only=False),
            )
        ranks = acc

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(node_ids, pa.int64()),
                "rank_q": pa.array(ranks, pa.int64()),
            }
        )
    )


def _pagerank_join(edges, nodes, iterations: int, unit: int,
                   base: int,
                   seed_ids: np.ndarray | None = None,
                   ) -> "ray.data.Dataset":
    """Fully-distributed path: ranks never visit the driver. The state
    table (node, outdeg, rank_q) carries outdeg along so each iteration
    needs exactly one edges⋈state join + one groupby + one state⟕sums
    join, with a materialize between the two plans (the per-step
    barrier every power iteration has anyway) so no two hash-shuffle
    pools compete for the same CPUs."""
    from ray.data.aggregate import Sum

    from ..stages.ngram_lm import _join_partitions

    nparts = _join_partitions()

    seed_ref = (None if seed_ids is None
                else ray.put(frozenset(int(x) for x in seed_ids)))

    def init(batch: pa.Table) -> pa.Table:
        if seed_ref is None:
            bq = np.full(batch.num_rows, base, dtype=np.int64)
            rq = np.full(batch.num_rows, unit, dtype=np.int64)
        else:
            sset = ray.get(seed_ref)
            node = batch["node"].to_numpy(zero_copy_only=False)
            m = np.fromiter((int(v) in sset for v in node),
                            dtype=bool, count=len(node))
            bq = np.where(m, base, 0).astype(np.int64)
            rq = np.where(m, unit, 0).astype(np.int64)
        return pa.table(
            {
                "node": batch["node"],
                "outdeg": batch["outdeg"],
                "bq": pa.array(bq),
                "rank_q": pa.array(rq),
            }
        )

    state = nodes.map_batches(init, batch_format="pyarrow").materialize()

    def as_src(batch: pa.Table) -> pa.Table:
        return batch.select(["node", "outdeg", "rank_q"]).rename_columns(
            ["src", "outdeg", "rank_q"])

    def contrib(batch: pa.Table) -> pa.Table:
        r = batch["rank_q"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = batch["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": batch["dst"],
                "m": pa.array((r * DAMP_NUM) // (DAMP_DEN * od)),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        m = batch["m"].to_numpy(zero_copy_only=False)
        m = np.nan_to_num(m.astype(np.float64)).astype(np.int64)
        bq = batch["bq"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": batch["node"],
                "outdeg": batch["outdeg"],
                "bq": pa.array(bq),
                "rank_q": pa.array(bq + m),
            }
        )

    for _ in range(iterations):
        sums = (
            edges.join(
                state.map_batches(as_src, batch_format="pyarrow"),
                join_type="inner",
                num_partitions=nparts,
                on=("src",),
            )
            .map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("m", alias_name="m"))
            .materialize()  # plan barrier: one join pool at a time
        )
        state = (
            state.select_columns(["node", "outdeg", "bq"])
            .join(sums, join_type="left_outer", num_partitions=nparts,
                  on=("node",))
            .map_batches(finish, batch_format="pyarrow")
            .materialize()
        )

    return state.select_columns(["node", "rank_q"])
