"""Bucketed cuckoo filter (numpy), with an optional exact-key sidecar.

The reference keeps the URL-seen set as an in-memory Go map per source
(``pkg/crawler/process.go:60``) plus a SQL existence probe for the global set
(``pkg/database/queries.go:73-88``). At 10^10-URL-frontier scale neither
works; BASELINE.json's north star mandates sharded cuckoo/bloom membership
over SHA-1 URL keys instead.

Design (standard cuckoo-filter construction, Fan et al., CoNEXT'14 —
public-knowledge algorithm):

- ``2^log2_buckets`` buckets × 4 slots of uint16 fingerprints (0 ⇒ empty)
- key = low 64 bits of the SHA-1 URL key; fingerprint from the high bits so
  fp and bucket index are independent
- partner bucket ``i2 = i1 XOR h(fp)`` (partial-key cuckoo hashing)
- vectorized batch ``contains`` / fast-path batch insert; per-key kick loop
  only on bucket overflow

Exact-parity mode: the north rule requires matching the reference's exact
URL-seen set. A cuckoo filter alone has a bounded false-positive rate, which
would *drop* URLs that were never actually seen. With ``exact=True`` each
shard also keeps the exact uint64 keys and uses them to veto filter false
positives, so membership is exact while the filter serves the fast path.

The sidecar is a **sorted uint64 array + small pending set** (merged when
the pending set exceeds ``merge_threshold``): 8 B/key, vectorized
``searchsorted`` veto — at 10^10 keys over 256 shards that is ~320 MB/shard,
versus ~70 B/key for a Python set. Veto lookups only run for filter HITS
(~true positives + the tiny fp rate), so the array probe is off the hot
path for fresh URLs. Disable ``exact`` to accept ~2·SLOTS/2^16 fp-rate URL
loss instead (measured in tests against the theoretical bound).

Spill tier: with ``spill_dir`` set, whenever the in-RAM sorted array exceeds
``spill_threshold`` keys it is written as a sorted ``.npy`` run and the RAM
array reset; probes binary-search each run through ``np.load(mmap_mode='r')``
(searchsorted touches O(log n) pages per key — lazy page-in, no full read).
Runs compact 8→1 to bound probe fan-out. Memory bound per shard:
``spill_threshold × 8 B`` resident + the filter table + a transient
compaction buffer; disk holds the remainder. ``.npy`` rather than parquet
because the probe needs random access into the sorted run — parquet would
decode whole row groups per probe; the run files are still one-per-shard
resumable artifacts alongside the parquet checkpoints.
"""

from __future__ import annotations

import io
import os

import numpy as np

_FP_MIX = np.uint64(0x5BD1E995)


class CuckooFilter:
    SLOTS = 4
    MAX_KICKS = 500

    MAX_RUNS = 8

    def __init__(self, log2_buckets: int = 16, exact: bool = True, seed: int = 0,
                 merge_threshold: int = 65536, spill_dir: str | None = None,
                 spill_threshold: int = 4_000_000):
        self.log2_buckets = log2_buckets
        self.n_buckets = 1 << log2_buckets
        self.mask = np.uint64(self.n_buckets - 1)
        self.table = np.zeros((self.n_buckets, self.SLOTS), dtype=np.uint16)
        self.exact = exact
        self._exact_sorted = np.empty(0, dtype=np.uint64) if exact else None
        self._exact_pending: list[np.ndarray] = [] if exact else None
        self._pending_rows = 0
        self._merge_threshold = merge_threshold
        self._spill_dir = spill_dir
        self._spill_threshold = spill_threshold
        self._runs: list[str] = []        # sorted .npy run paths, disjoint
        self._run_maps: list[np.ndarray] = []  # cached memmaps, same order
        self._run_seq = 0
        self.count = 0
        self._rng = np.random.default_rng(seed)

    # -- exact sidecar -----------------------------------------------------
    def _exact_merge(self) -> None:
        if self._exact_pending:
            self._exact_sorted = np.unique(
                np.concatenate([self._exact_sorted] + self._exact_pending)
            )
            self._exact_pending = []
            self._pending_rows = 0
        if (
            self._spill_dir is not None
            and len(self._exact_sorted) >= self._spill_threshold
        ):
            self._spill_run()

    def _spill_run(self) -> None:
        os.makedirs(self._spill_dir, exist_ok=True)
        path = os.path.join(self._spill_dir, f"run{self._run_seq:06d}.npy")
        self._run_seq += 1
        np.save(path, self._exact_sorted)
        self._runs.append(path)
        self._run_maps.append(np.load(path, mmap_mode="r"))
        self._exact_sorted = np.empty(0, dtype=np.uint64)
        if len(self._runs) > self.MAX_RUNS:
            self._compact_runs()

    def _compact_runs(self) -> None:
        """Merge all runs into one (transient buffer = total spilled keys;
        size ``spill_threshold`` and ``MAX_RUNS`` so this fits the worker)."""
        merged = np.unique(
            np.concatenate([np.asarray(m) for m in self._run_maps])
        )
        old = list(self._runs)
        self._runs, self._run_maps = [], []
        path = os.path.join(self._spill_dir, f"run{self._run_seq:06d}.npy")
        self._run_seq += 1
        np.save(path, merged)
        self._runs.append(path)
        self._run_maps.append(np.load(path, mmap_mode="r"))
        for p in old:
            try:
                os.remove(p)
            except OSError:
                pass

    def _exact_add(self, keys: np.ndarray) -> None:
        self._exact_pending.append(np.asarray(keys, dtype=np.uint64).copy())
        self._pending_rows += len(keys)
        if self._pending_rows >= self._merge_threshold:
            self._exact_merge()

    @staticmethod
    def _sorted_probe(arr: np.ndarray, keys: np.ndarray, mask: np.ndarray) -> None:
        if len(arr) == 0:
            return
        pos = np.searchsorted(arr, keys)
        in_range = pos < len(arr)
        mask[in_range] |= arr[pos[in_range]] == keys[in_range]

    def _exact_contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership in the sidecar (RAM sorted array + pending
        chunks + mmap'd spilled runs)."""
        mask = np.zeros(len(keys), dtype=bool)
        self._sorted_probe(self._exact_sorted, keys, mask)
        for run in self._run_maps:
            self._sorted_probe(run, keys, mask)
        if self._exact_pending:
            pend = np.concatenate(self._exact_pending)
            mask |= np.isin(keys, pend)
        return mask

    def _exact_all(self) -> np.ndarray:
        """Full key set (RAM + spilled runs). With spilling on this is a
        transient merged view — used by grow-rebuild and checkpoint dumps;
        size log2_buckets so growth never fires at spill scale."""
        self._exact_merge()
        if not self._run_maps:
            return self._exact_sorted
        return np.unique(
            np.concatenate(
                [self._exact_sorted] + [np.asarray(m) for m in self._run_maps]
            )
        )

    # -- key derivation ----------------------------------------------------
    @staticmethod
    def keys_from_digests(digests: np.ndarray) -> np.ndarray:
        """(N, 20) uint8 SHA-1 digests → uint64 keys (first 8 bytes, BE)."""
        return digests[:, :8].astype(np.uint64).reshape(-1, 8) @ (
            np.uint64(256) ** np.arange(7, -1, -1, dtype=np.uint64)
        )

    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = ((keys >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 is the empty marker
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (keys & self.mask).astype(np.uint64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (i1 ^ (fp.astype(np.uint64) * _FP_MIX & self.mask)) & self.mask

    # -- queries -----------------------------------------------------------
    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership for uint64 keys → bool array."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._i2(i1, fp)
        b1 = self.table[i1.astype(np.int64)]  # (N, SLOTS)
        b2 = self.table[i2.astype(np.int64)]
        hit = (b1 == fp[:, None]).any(axis=1) | (b2 == fp[:, None]).any(axis=1)
        if self.exact:
            # veto false positives so membership is exact (vectorized probe
            # of the sorted sidecar, only for filter hits)
            idx = np.nonzero(hit)[0]
            if len(idx):
                hit[idx] = self._exact_contains(keys[idx])
        return hit

    def insert_many(self, keys: np.ndarray) -> None:
        """Insert uint64 keys (caller already deduped / filtered misses)."""
        if len(keys) == 0:
            return
        if self.exact:
            self._exact_add(keys)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._i2(i1, fp)
        # vectorized fast path: place keys whose primary bucket is unique in
        # this batch and has a free slot; the (rare) leftovers take the
        # per-key kick path. Repeated rounds shrink the leftover set.
        pending = np.arange(len(keys))
        for _ in range(self.SLOTS + 2):
            if len(pending) == 0:
                break
            b = i1[pending].astype(np.int64)
            order = np.argsort(b, kind="stable")
            b_sorted = b[order]
            _, first_pos = np.unique(b_sorted, return_index=True)
            chosen = order[first_pos]  # one key per distinct primary bucket
            cb = b[chosen]
            rows = self.table[cb]
            empty = rows == 0
            has_empty = empty.any(axis=1)
            place = chosen[has_empty]
            if len(place) == 0:
                break
            slots = empty[has_empty].argmax(axis=1)
            self.table[cb[has_empty], slots] = fp[pending[place]]
            placed_mask = np.zeros(len(pending), dtype=bool)
            placed_mask[place] = True
            # keys whose chosen-round bucket was FULL also leave the fast
            # path (their i1 is full → kick path)
            full = chosen[~has_empty]
            stuck_mask = np.zeros(len(pending), dtype=bool)
            stuck_mask[full] = True
            stuck = pending[stuck_mask]
            pending = pending[~(placed_mask | stuck_mask)]
            if len(stuck):
                for k in stuck:
                    if not self._insert_one(
                        int(i1[k]), int(i2[k]), np.uint16(fp[k])
                    ):
                        self.count += len(keys)
                        return
        for k in pending:
            if not self._insert_one(int(i1[k]), int(i2[k]), np.uint16(fp[k])):
                # table grew and was rebuilt from exact_keys, which already
                # contains this whole batch — nothing left to insert
                break
        self.count += len(keys)

    def _insert_one(self, i1: int, i2: int, fp: np.uint16) -> bool:
        """→ True on normal insert, False when the table had to grow (the
        rebuild re-inserted everything from exact_keys)."""
        for b in (i1, i2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # kick loop
        b = i1 if self._rng.integers(2) else i2
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(self.SLOTS))
            fp, self.table[b, slot] = self.table[b, slot], fp
            b = int(
                np.uint64(b)
                ^ (np.uint64(fp) * _FP_MIX & self.mask)
            ) & int(self.mask)
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        self._grow_and_rebuild()
        return False

    def _grow_and_rebuild(self) -> None:
        """Double the bucket count and rebuild the table from exact_keys
        (retry with further doubling if the rebuild itself overflows)."""
        if not self.exact:
            raise RuntimeError(
                "cuckoo filter overfull and no exact sidecar to rebuild from; "
                "size log2_buckets for the expected shard cardinality"
            )
        keys = self._exact_all()
        while True:
            self.log2_buckets += 1
            self.n_buckets <<= 1
            self.mask = np.uint64(self.n_buckets - 1)
            self.table = np.zeros((self.n_buckets, self.SLOTS), dtype=np.uint16)
            fp = self._fp(keys)
            i1 = self._i1(keys)
            i2 = self._i2(i1, fp)
            if all(
                self._raw_insert(int(i1[k]), int(i2[k]), np.uint16(fp[k]))
                for k in range(len(keys))
            ):
                return

    def _raw_insert(self, i1: int, i2: int, fp: np.uint16) -> bool:
        """Insert without growth; → False on overflow (caller re-grows)."""
        for b in (i1, i2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        b = i1 if self._rng.integers(2) else i2
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(self.SLOTS))
            fp, self.table[b, slot] = self.table[b, slot], fp
            b = int(
                np.uint64(b) ^ (np.uint64(fp) * _FP_MIX & self.mask)
            ) & int(self.mask)
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False

    # -- persistence (checkpointing) --------------------------------------
    def dumps(self) -> bytes:
        buf = io.BytesIO()
        exact_arr = (
            self._exact_all() if self.exact else np.zeros(0, dtype=np.uint64)
        )
        np.savez_compressed(
            buf,
            table=self.table,
            exact=exact_arr,
            meta=np.array([self.log2_buckets, int(self.exact), self.count], dtype=np.int64),
        )
        return buf.getvalue()

    @classmethod
    def loads(cls, data: bytes) -> "CuckooFilter":
        with np.load(io.BytesIO(data)) as z:
            log2b, exact, count = (int(x) for x in z["meta"])
            f = cls(log2_buckets=log2b, exact=bool(exact))
            f.table = z["table"].copy()
            if exact:
                f._exact_sorted = np.sort(z["exact"].astype(np.uint64))
            f.count = count
        return f
