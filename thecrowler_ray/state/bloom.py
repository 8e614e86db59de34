"""Sharded-seen Bloom filter — the 'bloom' half of the north rule's
"bloom/cuckoo URL-seen membership" (BASELINE.json north_rule).

The engine's oracle-pinned default stays the cuckoo + exact-sidecar
(`state/cuckoo.py`): the correctness gate demands an exact URL-seen set.
This Bloom filter is the *approximate* alternative for deployments that
trade a bounded false-positive rate (a re-crawl suppressed that shouldn't
be) for a fixed, smaller memory footprint and O(1) inserts with no
eviction path. Same `dumps`/`loads`/vectorized-batch contract as
`CuckooFilter`, so `stages/seen.py` shards can host either.

Construction (standard public Bloom math, no reference analog —
TheCROWler dedupes via DB uniqueness, crawler.go:1504-1543):
- ``m = 2^log2_bits`` bits in a packed uint64 array;
- ``k`` probe indices per key via Kirsch–Mitzenmacher double hashing
  (public construction: two splitmix64 mixes h1, h2; ``idx_i = h1 + i*h2``
  with h2 forced odd) — hashing cost is 2 mixes per key regardless of k,
  vectorized in numpy;
- no false negatives ever (property-tested); FP ≈ (1 - e^{-kn/m})^k.
"""

from __future__ import annotations

import struct

import numpy as np

_PHI = np.uint64(0x9E3779B97F4A7C15)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain construction), vectorized."""
    x = (x + _PHI) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    """Fixed-size bit-array membership over uint64 keys."""

    MAGIC = b"BLM1"

    def __init__(self, log2_bits: int = 20, k: int = 7, seed: int = 0):
        if not 3 <= log2_bits <= 40:
            raise ValueError("log2_bits out of range")
        if not 1 <= k <= 16:
            raise ValueError("k out of range")
        self.log2_bits = log2_bits
        self.k = k
        self.seed = seed
        self.n_inserted = 0
        self.bits = np.zeros(max(1, (1 << log2_bits) >> 6), dtype=np.uint64)
        # double-hash salts: seed-indexed remixes (array-shaped — numpy
        # scalar uint64 arithmetic warns on the intended wraparound)
        base = np.array([seed, seed], dtype=np.uint64)
        base *= np.array([0x9E3779B1, 0x85EBCA77], dtype=np.uint64)
        base += np.array([1, 2], dtype=np.uint64)
        salts = _mix(base)
        self._salt1, self._salt2 = salts[0], salts[1]

    # -- probe geometry ------------------------------------------------------

    def _positions(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(n, k) word indices + bit masks for every probe of every key."""
        keys = keys.astype(np.uint64, copy=False)
        h1 = _mix(keys ^ self._salt1)
        h2 = _mix(keys ^ self._salt2) | np.uint64(1)  # odd stride
        i = np.arange(self.k, dtype=np.uint64)
        pos = (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(
            (1 << self.log2_bits) - 1
        )
        return (pos >> np.uint64(6)).astype(np.int64), (
            np.uint64(1) << (pos & np.uint64(63))
        )

    # -- batch API (CuckooFilter-compatible) ----------------------------------

    def insert_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        words, masks = self._positions(keys)
        # unbuffered OR handles duplicate word indices correctly; with the
        # double-hash probe geometry it sustains multi-Mkeys/s (PERF.md)
        np.bitwise_or.at(self.bits, words.ravel(), masks.ravel())
        self.n_inserted += len(keys)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        words, masks = self._positions(keys)
        return ((self.bits[words] & masks) != 0).all(axis=1)

    def check_and_insert(self, keys: np.ndarray) -> np.ndarray:
        """→ boolean 'is NEW' per key (the SAME polarity as
        SeenShard.check_and_insert — same name, same answer); inserts the
        new ones. Duplicate keys WITHIN the batch report
        first-occurrence-new, the wave-local first-win the cuckoo shard
        implements."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        seen = self.contains_many(keys)
        # first occurrence of an in-batch duplicate must stay "new"
        _, first_idx = np.unique(keys, return_index=True)
        is_first = np.zeros(len(keys), dtype=bool)
        is_first[first_idx] = True
        new = ~seen & is_first
        self.insert_many(keys[new])
        return new

    def fp_rate_estimate(self) -> float:
        """Theoretical FP probability at the current fill."""
        m = float(1 << self.log2_bits)
        return float(
            (1.0 - np.exp(-self.k * self.n_inserted / m)) ** self.k
        )

    # -- checkpoint ------------------------------------------------------------

    def dumps(self) -> bytes:
        head = struct.pack(
            "<4sBBqq", self.MAGIC, self.log2_bits, self.k,
            self.seed, self.n_inserted,
        )
        return head + self.bits.tobytes()

    @classmethod
    def loads(cls, data: bytes) -> "BloomFilter":
        magic, log2_bits, k, seed, n = struct.unpack_from("<4sBBqq", data)
        if magic != cls.MAGIC:
            raise ValueError("not a BloomFilter snapshot")
        f = cls(log2_bits=log2_bits, k=k, seed=seed)
        f.n_inserted = n
        f.bits = np.frombuffer(
            data[struct.calcsize("<4sBBqq"):], dtype=np.uint64
        ).copy()
        return f
