"""Sharded URL-seen membership: cuckoo-filter actors + batch anti-join stage.

Replaces the reference's per-source ``visitedLinks`` map
(``pkg/crawler/process.go:60``) and the cross-engine SQL probe ``IsURLKnown``
(``pkg/database/queries.go:73-88``) with N detached-scope actors, each owning
one cuckoo filter over ``hash(host_key) % n_shards`` of the key space.

The anti-join (SURVEY.md J3) is **shuffle-free**: the client stage runs as
``map_batches`` tasks; each batch splits its keys by owning shard, issues the
per-shard ``check_and_insert`` RPCs in parallel, and reassembles the boolean
mask. Keys are the low 64 bits of the SHA-1 url_key (ENGINE_SPEC.md).

Within-wave correctness: callers dedup the wave first (one row per key), so
concurrent batches never race on the same key; across waves the wave barrier
orders inserts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.bloom import BloomFilter
from ..state.cuckoo import CuckooFilter
from ..urls import host_hash


class SeenShard:
    """One shard of the global URL-seen set. Runs as a Ray actor.

    ``filter_kind``: "cuckoo" (default — with ``exact=True`` it carries the
    exact sidecar the oracle-pinned engine requires) or "bloom" (the north
    rule's approximate alternative: fixed memory, bounded false-positive
    rate, no false negatives — a deployment choice, never the oracle
    path)."""

    def __init__(self, shard_id: int, log2_buckets: int = 14, exact: bool = True,
                 spill_dir: str | None = None, spill_threshold: int = 4_000_000,
                 filter_kind: str = "cuckoo"):
        self.shard_id = shard_id
        self.filter_kind = filter_kind
        if filter_kind == "bloom":
            # a cuckoo bucket holds 4 fingerprints; give the bloom the
            # same key capacity: bits = buckets*4*8 → log2_bits += 5
            self.filter = BloomFilter(
                log2_bits=min(40, log2_buckets + 5), seed=shard_id)
        elif filter_kind == "cuckoo":
            self.filter = CuckooFilter(
                log2_buckets=log2_buckets, exact=exact, seed=shard_id,
                spill_dir=(f"{spill_dir}/shard{shard_id}" if spill_dir else None),
                spill_threshold=spill_threshold,
            )
        else:
            raise ValueError(f"unknown filter_kind {filter_kind!r}")

    def check_and_insert(self, keys: np.ndarray) -> np.ndarray:
        """→ bool mask: True = new (was not seen; now inserted)."""
        seen = self.filter.contains_many(keys)
        new = ~seen
        self.filter.insert_many(keys[new])
        return new

    def insert(self, keys: np.ndarray) -> int:
        mask = ~self.filter.contains_many(keys)
        self.filter.insert_many(keys[mask])
        return int(mask.sum())

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self.filter.contains_many(keys)

    def stats(self) -> dict:
        if self.filter_kind == "bloom":
            return {"shard": self.shard_id, "count": self.filter.n_inserted,
                    "fp_rate": self.filter.fp_rate_estimate()}
        return {"shard": self.shard_id, "count": self.filter.count,
                "buckets": self.filter.n_buckets}

    def snapshot(self) -> bytes:
        return self.filter.dumps()

    def restore(self, data: bytes) -> None:
        cls = BloomFilter if self.filter_kind == "bloom" else CuckooFilter
        self.filter = cls.loads(data)


def key_u64(key_hex_col) -> np.ndarray:
    """hex url_key column (pyarrow or numpy of str) → uint64 keys.
    One C-level hex decode for the whole batch (bytes.fromhex on the joined
    prefixes) instead of a Python int() per key."""
    arr = key_hex_col.to_pylist() if hasattr(key_hex_col, "to_pylist") else list(key_hex_col)
    if not arr:
        return np.empty(0, dtype=np.uint64)
    raw = bytes.fromhex("".join(k[:16] for k in arr))
    return np.frombuffer(raw, dtype=">u8").astype(np.uint64)


class SeenShardPool:
    """Driver-side handle for the shard actors + the anti-join stage."""

    def __init__(self, n_shards: int = 8, log2_buckets: int = 14, exact: bool = True,
                 spill_dir: str | None = None, spill_threshold: int = 4_000_000,
                 filter_kind: str = "cuckoo"):
        self.n_shards = n_shards
        cls = ray.remote(num_cpus=0.05)(SeenShard)
        self.actors = [
            cls.remote(i, log2_buckets=log2_buckets, exact=exact,
                       spill_dir=spill_dir, spill_threshold=spill_threshold,
                       filter_kind=filter_kind)
            for i in range(n_shards)
        ]

    def _shard_of(self, keys: np.ndarray, hosts=None) -> np.ndarray:
        """Owning shard per key. North-star partitioning is host-hash (keys
        of one host live in one shard, so a host's membership state can be
        checkpointed/moved together); falls back to key bits without hosts."""
        if hosts is not None:
            return np.array(
                [host_hash(h, self.n_shards) for h in hosts], dtype=np.int64
            )
        return (keys % np.uint64(self.n_shards)).astype(np.int64)

    def check_and_insert_batch(self, keys: np.ndarray, hosts=None) -> np.ndarray:
        """Split by shard, parallel RPCs, reassembled 'is new' mask."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        shards = self._shard_of(keys, hosts)
        mask = np.zeros(len(keys), dtype=bool)
        futures = []
        idxs = []
        for s in range(self.n_shards):
            idx = np.nonzero(shards == s)[0]
            if len(idx):
                futures.append(self.actors[s].check_and_insert.remote(keys[idx]))
                idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futures)):
            mask[idx] = res
        return mask

    def insert_batch(self, keys: np.ndarray, hosts=None) -> None:
        shards = self._shard_of(keys, hosts)
        futures = [
            self.actors[s].insert.remote(keys[shards == s])
            for s in range(self.n_shards)
            if (shards == s).any()
        ]
        ray.get(futures)

    def contains_batch(self, keys: np.ndarray, hosts=None) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        shards = self._shard_of(keys, hosts)
        mask = np.zeros(len(keys), dtype=bool)
        futures, idxs = [], []
        for s in range(self.n_shards):
            idx = np.nonzero(shards == s)[0]
            if len(idx):
                futures.append(self.actors[s].contains.remote(keys[idx]))
                idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futures)):
            mask[idx] = res
        return mask

    def filter_new_stage(self, key_col: str = "key", host_col: str = "host"):
        """map_batches fn: keep only rows whose url_key is NOT yet seen.
        Pure read — inserts happen later via ``insert_stage`` on the rows
        that survive ordering + truncation (ENGINE_SPEC.md step 8; the
        reference never marks truncated links as visited)."""
        pool = self

        def fn(batch: pa.Table) -> pa.Table:
            keys = key_u64(batch[key_col])
            hosts = batch[host_col].to_pylist() if host_col in batch.column_names else None
            mask = pool.contains_batch(keys, hosts)
            return batch.filter(pa.array(~mask))

        return fn

    def insert_stage(self, key_col: str = "key", host_col: str = "host"):
        """map_batches fn: mark every row's url_key as seen (side effect —
        run exactly once: materialize immediately downstream)."""
        pool = self

        def fn(batch: pa.Table) -> pa.Table:
            keys = key_u64(batch[key_col])
            hosts = batch[host_col].to_pylist() if host_col in batch.column_names else None
            pool.insert_batch(keys, hosts)
            return batch

        return fn

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.actors])

    def snapshot_all(self) -> list[bytes]:
        return ray.get([a.snapshot.remote() for a in self.actors])

    def restore_all(self, blobs: list[bytes]) -> None:
        ray.get([a.restore.remote(b) for a, b in zip(self.actors, blobs)])

    def total_count(self) -> int:
        return sum(s["count"] for s in self.stats())
