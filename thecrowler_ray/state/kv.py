"""Session KV store, counters, and leases (ST6) as a named Ray actor.

Reimplements (semantics only) the reference's in-process KV store
(``pkg/common/kvstore.go``): values with properties (persistent / static /
session-scoped / shared), counters with increment windows, ``try_acquire`` /
``release`` leases with TTL, and ``clean_session`` on pipeline close
(``pkg/crawler/crawler.go:690``). The reference's store lives in one engine
process; here it is a (optionally detached, named) actor so every stage of a
distributed pipeline shares it.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import ray


@dataclass
class _Entry:
    value: object
    session: str = ""
    persistent: bool = False
    static: bool = False
    shared: bool = False


@dataclass
class _Counter:
    value: int = 0
    window_start: float = 0.0
    window_seconds: float = 0.0


@dataclass
class _Lease:
    owner: str
    expires_at: float


class KVStore:
    """Actor body. Create with ``kv_actor(name=...)``."""

    def __init__(self):
        self._store: dict[str, _Entry] = {}
        self._counters: dict[str, _Counter] = {}
        self._leases: dict[str, _Lease] = {}

    # -- values ------------------------------------------------------------
    def set(self, key: str, value, session: str = "", persistent: bool = False,
            static: bool = False, shared: bool = False) -> bool:
        cur = self._store.get(key)
        if cur is not None and cur.static:
            return False  # static values cannot be overwritten
        self._store[key] = _Entry(value, session, persistent, static, shared)
        return True

    def get(self, key: str, default=None):
        e = self._store.get(key)
        return e.value if e is not None else default

    def delete(self, key: str) -> bool:
        return self._store.pop(key, None) is not None

    def keys(self, session: str | None = None) -> list[str]:
        if session is None:
            return sorted(self._store)
        return sorted(k for k, e in self._store.items() if e.session == session)

    def clean_session(self, session: str) -> int:
        """Drop all non-persistent values of a session (reference
        CleanSession on pipeline close)."""
        doomed = [
            k for k, e in self._store.items()
            if e.session == session and not e.persistent
        ]
        for k in doomed:
            del self._store[k]
        return len(doomed)

    # -- counters ----------------------------------------------------------
    def incr(self, name: str, by: int = 1, window_seconds: float = 0.0,
             now: float | None = None) -> int:
        now = time.time() if now is None else now
        c = self._counters.setdefault(name, _Counter(window_start=now,
                                                     window_seconds=window_seconds))
        if c.window_seconds and now - c.window_start >= c.window_seconds:
            c.value = 0
            c.window_start = now
        c.value += by
        return c.value

    def counter(self, name: str) -> int:
        c = self._counters.get(name)
        return c.value if c else 0

    def reset_counter(self, name: str) -> None:
        self._counters.pop(name, None)

    # -- leases ------------------------------------------------------------
    def try_acquire(self, name: str, owner: str, ttl_seconds: float,
                    now: float | None = None) -> bool:
        now = time.time() if now is None else now
        lease = self._leases.get(name)
        if lease is not None and lease.expires_at > now and lease.owner != owner:
            return False
        self._leases[name] = _Lease(owner, now + ttl_seconds)
        return True

    def release(self, name: str, owner: str) -> bool:
        lease = self._leases.get(name)
        if lease is None or lease.owner != owner:
            return False
        del self._leases[name]
        return True

    def lease_owner(self, name: str, now: float | None = None) -> str:
        now = time.time() if now is None else now
        lease = self._leases.get(name)
        if lease is None or lease.expires_at <= now:
            return ""
        return lease.owner


def kv_actor(name: str = "crowler_kv", detached: bool = False):
    """Get-or-create the named KV actor."""
    try:
        return ray.get_actor(name)
    except ValueError:
        pass
    opts = {"name": name, "num_cpus": 0.05}
    if detached:
        opts["lifetime"] = "detached"
    return ray.remote(KVStore).options(**opts).remote()
