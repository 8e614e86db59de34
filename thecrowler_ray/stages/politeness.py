"""Per-host politeness token buckets + robots caches (stateful actors).

The reference paces fetches with per-pipeline sleeps (interval/delay
expressions, 3 s minimum — ``pkg/crawler/web.go:1835-1990``) and a fetch
mutex (``web.go:1837``); robots checking is a config flag with no shipped
enforcement (``pkg/config/types.go:111``, default false). At cluster scale
pacing must be *admission control*, not sleeping workers: each host owns a
token bucket (``rate`` tokens per wave, capped at ``capacity``), and a wave
admits per host the first ``tokens`` frontier rows by ``(depth, ord)``;
the rest defer to later waves (ENGINE_SPEC.md step 2).

Hosts are sharded over ``n_shards`` actors by ``host_hash``; one actor call
per (wave, shard) sees that shard's full frontier group, so admission order
is global per host. Calls are memoized by wave id → idempotent under Ray
Data re-execution.

Robots rules are cached per host inside the same actor (north star: "per-host
politeness token buckets and robots.txt caches held in stateful actors").
The fetch of robots.txt is a pluggable callable; the sandbox uses the
deterministic synthweb rules.
"""

from __future__ import annotations

from urllib.parse import urlparse

import numpy as np
import ray


class PolitenessShard:
    """Token buckets + robots cache for one host-hash shard of hosts."""

    def __init__(
        self,
        shard_id: int,
        rate: int,
        capacity: int,
        check_robots: bool = False,
        robots_rules_fn=None,
    ):
        self.shard_id = shard_id
        self.rate = rate
        self.capacity = capacity
        self.check_robots = check_robots
        self.robots_rules_fn = robots_rules_fn
        self.tokens: dict[str, int] = {}
        self.robots: dict[str, list[str]] = {}
        self.last_tick = -1
        self._memo: dict[int, np.ndarray] = {}

    def _rules(self, host: str) -> list[str]:
        if host not in self.robots:
            self.robots[host] = (
                list(self.robots_rules_fn(host)) if self.robots_rules_fn else []
            )
        return self.robots[host]

    def admit(
        self,
        wave: int,
        hosts: list[str],
        urls: list[str],
        depths: np.ndarray,
        ords: np.ndarray,
    ) -> np.ndarray:
        """→ int8 verdict per row: 1 admit, 0 defer, -1 robots-drop.

        Rows are one shard's whole wave frontier. Memoized per wave so a
        re-executed Ray stage cannot double-spend tokens.
        """
        if wave in self._memo:
            return self._memo[wave]
        # tick: known hosts gain rate × elapsed waves (capped); a host seen
        # for the first time starts with `rate` tokens (ENGINE_SPEC.md)
        if wave != self.last_tick:
            elapsed = wave - self.last_tick if self.last_tick >= 0 else 1
            for h in self.tokens:
                self.tokens[h] = min(
                    self.tokens[h] + self.rate * elapsed, self.capacity
                )
            self.last_tick = wave
        for h in set(hosts):
            if h not in self.tokens:
                self.tokens[h] = min(self.rate, self.capacity)
        verdict = np.zeros(len(hosts), dtype=np.int8)
        by_host: dict[str, list[int]] = {}
        order = np.lexsort((ords, depths))
        for i in order:
            by_host.setdefault(hosts[i], []).append(int(i))
        for h, idxs in by_host.items():
            kept = []
            for i in idxs:
                if self.check_robots:
                    path = urlparse(urls[i]).path
                    if any(path.startswith(p) for p in self._rules(h)):
                        verdict[i] = -1
                        continue
                kept.append(i)
            grant = min(self.tokens.get(h, 0), len(kept))
            for i in kept[:grant]:
                verdict[i] = 1
            self.tokens[h] = self.tokens.get(h, 0) - grant
        self._memo = {wave: verdict}  # keep only the latest wave
        return verdict

    def grant_counts(self, wave: int, hosts: list[str], counts: list[int]) -> list[int]:
        """Shuffle-free admission, round A: per-host robots-ok row counts →
        per-host grants (tick + decrement, memoized per wave). The caller
        derives thresholds for constrained hosts in a separate pure pass."""
        memo_key = ("grants", wave)
        if memo_key in self._memo:
            cached = self._memo[memo_key]
            return [cached.get(h, 0) for h in hosts]
        if wave != self.last_tick:
            elapsed = wave - self.last_tick if self.last_tick >= 0 else 1
            for h in self.tokens:
                self.tokens[h] = min(
                    self.tokens[h] + self.rate * elapsed, self.capacity
                )
            self.last_tick = wave
        grants: dict[str, int] = {}
        for h, n in zip(hosts, counts):
            if h not in self.tokens:
                self.tokens[h] = min(self.rate, self.capacity)
            g = min(self.tokens[h], int(n))
            grants[h] = g
            self.tokens[h] -= g
        self._memo = {memo_key: grants}
        return [grants[h] for h in hosts]

    def admit_counts(self, wave: int) -> tuple[int, int, int]:
        """(admitted, deferred, robots_dropped) of this shard's memoized
        verdict for `wave` — lets the driver skip counting dataset passes."""
        v = self._memo.get(wave)
        if v is None:
            return (0, 0, 0)
        return (int((v == 1).sum()), int((v == 0).sum()), int((v == -1).sum()))

    def state(self) -> dict:
        return {"tokens": dict(self.tokens), "last_tick": self.last_tick}

    def restore(self, state: dict) -> None:
        self.tokens = dict(state["tokens"])
        self.last_tick = state["last_tick"]
        self._memo = {}


class PolitenessPool:
    def __init__(
        self,
        n_shards: int,
        rate: int,
        capacity: int,
        check_robots: bool = False,
        robots_rules_fn=None,
    ):
        self.n_shards = n_shards
        cls = ray.remote(num_cpus=0.05)(PolitenessShard)
        self.actors = [
            cls.remote(i, rate, capacity, check_robots, robots_rules_fn)
            for i in range(n_shards)
        ]

    def admit_group_fn(self, wave: int):
        """A ``groupby('pshard').map_groups`` fn (pandas): adds an ``admit``
        int8 column by consulting the owning shard actor with the full
        group."""
        actors = self.actors

        def fn(group):
            shard = int(group["pshard"].iloc[0])
            verdict = ray.get(
                actors[shard].admit.remote(
                    wave,
                    group["host"].tolist(),
                    group["url"].tolist(),
                    group["depth"].to_numpy(),
                    group["ord"].to_numpy(),
                )
            )
            group = group.copy()
            group["admit"] = verdict
            return group

        return fn

    def admit_counts(self, wave: int) -> tuple[int, int, int]:
        parts = ray.get([a.admit_counts.remote(wave) for a in self.actors])
        return tuple(sum(p[i] for p in parts) for i in range(3))

    def states(self) -> list[dict]:
        return ray.get([a.state.remote() for a in self.actors])

    def restore_all(self, states: list[dict]) -> None:
        ray.get([a.restore.remote(s) for a, s in zip(self.actors, states)])
