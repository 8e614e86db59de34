"""Information-seed console (reference ``services/api/console.go``
information-seed endpoints, :54-267,409-560).

The reference's console persists operator-submitted *information seeds*
(research questions that the infoseed pipeline expands into sources)
with add/status/update/list semantics, validates the per-seed run
config against the provider allow-list, refuses request bodies that
smuggle credentials (they must be configured globally), and broadcasts
``information_seed.added``/``.updated`` on the websocket hub. Mirrored
here over a durable JSON registry (the repo's console dialect — the
reference's Postgres table is a small keyed store):

- add: seed text trimmed + required, ``usr_id`` falls back to
  ``user_id``, status defaults to ``new`` (:74-83);
- config validation: JSON object only, provider names non-empty,
  present in the allow-list and in the configured-provider map when
  either is set (:114-154);
- credential rejection walks the whole request body for the exact key
  list (:167-204);
- list filters: status/priority/disabled/category/user with the
  aliases the reference accepts, pagination default 100 / max 500
  (:474-533).
"""

from __future__ import annotations

import json
import os
import threading
import time

CREDENTIAL_KEYS = {
    "api_key", "api_id", "api_secret", "api_token", "token", "secret",
    "username", "password", "bearer_token", "access_token",
    "refresh_token", "client_secret",
}

DEFAULT_LIMIT = 100
MAX_LIMIT = 500


class InfoSeedError(ValueError):
    pass


def contains_credential_key(value):
    """containsCredentialKey (:181-199) → offending key or None."""
    if isinstance(value, dict):
        for key, nested in value.items():
            if key.strip().lower() in CREDENTIAL_KEYS:
                return key
            found = contains_credential_key(nested)
            if found:
                return found
    elif isinstance(value, list):
        for nested in value:
            found = contains_credential_key(nested)
            if found:
                return found
    return None


def validate_information_seed_config(config,
                                     allow_list: list[str] | None = None,
                                     configured: dict | None = None) -> None:
    """validateInformationSeedConfig (:114-154). ``config`` may be None
    (no config), a dict, or a JSON string."""
    if config is None:
        return
    if isinstance(config, str):
        try:
            config = json.loads(config)
        except ValueError as e:
            raise InfoSeedError(
                "information seed config must be valid JSON") from e
    if not isinstance(config, dict):
        raise InfoSeedError("information seed config must be a JSON object")
    allowed = {p.strip().lower() for p in (allow_list or []) if p.strip()}
    if not allowed and configured:
        allowed = {p.strip().lower() for p in configured}
    providers = config.get("providers") or []
    if not isinstance(providers, list):
        raise InfoSeedError(
            "information seed config does not match runner schema")
    for provider in providers:
        name = str(provider or "").strip().lower()
        if not name:
            raise InfoSeedError("information seed config providers must "
                                "not contain empty names")
        if allowed and name not in allowed:
            raise InfoSeedError(
                f"information seed provider {name!r} is not in the "
                "configured provider allow-list")
        if configured and name not in configured:
            raise InfoSeedError(
                f"information seed provider {name!r} is not configured")


class InfoSeedRegistry:
    """Durable console store; every mutation returns the stored row."""

    def __init__(self, path: str, allow_list: list[str] | None = None,
                 configured_providers: dict | None = None, ws_hub=None):
        self.path = path
        self.allow_list = allow_list
        self.configured_providers = configured_providers
        self.ws_hub = ws_hub
        self._lock = threading.Lock()
        self._seeds: dict[str, dict] = {}
        self._seq = 0
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            self._seeds = data.get("seeds", {})
            self._seq = data.get("seq", 0)

    def _persist(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"seeds": self._seeds, "seq": self._seq}, f)
        os.replace(tmp, self.path)

    def add(self, information_seed: str, category_id: int = 0,
            usr_id: int = 0, user_id: int = 0, status: str = "",
            priority: str = "", engine: str = "", disabled: bool = False,
            config=None, now: float | None = None) -> dict:
        """performAddInformationSeed (:54-110)."""
        if config is not None:
            body = config if isinstance(config, dict) else \
                json.loads(config)
            offending = contains_credential_key(body)
            if offending:
                raise InfoSeedError(
                    f"provider credential field {offending!r} must be "
                    "configured globally, not in request bodies")
        validate_information_seed_config(config, self.allow_list,
                                         self.configured_providers)
        information_seed = (information_seed or "").strip()
        if not information_seed:
            raise InfoSeedError("Information seed text is required")
        if usr_id == 0 and user_id != 0:
            usr_id = user_id
        with self._lock:
            self._seq += 1
            row = {
                "information_seed_id": self._seq,
                "category_id": int(category_id),
                "usr_id": int(usr_id),
                "information_seed": information_seed,
                "status": status or "new",
                "priority": priority,
                "engine": engine,
                "disabled": bool(disabled),
                "config": config if isinstance(config, dict) else (
                    json.loads(config) if config else None),
                "created_at": now if now is not None else time.time(),
                "last_updated_at": now if now is not None else time.time(),
                "discovered_source_count": 0,
            }
            self._seeds[str(self._seq)] = row
            self._persist()
        if self.ws_hub is not None:
            self.ws_hub.broadcast("information_seed.added", {
                "message": "Information seed added successfully",
                "item": row})
        return row

    def get(self, seed_id: int) -> dict:
        row = self._seeds.get(str(int(seed_id)))
        if row is None:
            raise InfoSeedError(f"information seed {seed_id} not found")
        return dict(row)

    def update(self, seed_id: int, now: float | None = None,
               **fields) -> dict:
        """performUpdateInformationSeed analog: status/priority/engine/
        disabled/config updates with the same validation."""
        with self._lock:
            row = self._seeds.get(str(int(seed_id)))
            if row is None:
                raise InfoSeedError(
                    f"information seed {seed_id} not found")
            if "config" in fields:
                validate_information_seed_config(
                    fields["config"], self.allow_list,
                    self.configured_providers)
            for key in ("status", "priority", "engine", "disabled",
                        "category_id", "config"):
                if key in fields:
                    row[key] = fields[key]
            row["last_updated_at"] = now if now is not None else time.time()
            self._persist()
            updated = dict(row)
        if self.ws_hub is not None:
            self.ws_hub.broadcast("information_seed.updated", {
                "message": "Information seed updated successfully",
                "item": updated})
        return updated

    def link_source(self, seed_id: int) -> None:
        """DiscoveredSourceCount bookkeeping (the pipeline links
        discovered sources back to their seed)."""
        with self._lock:
            row = self._seeds.get(str(int(seed_id)))
            if row is None:
                raise InfoSeedError(
                    f"information seed {seed_id} not found")
            row["discovered_source_count"] += 1
            self._persist()

    def list(self, status: str = "", priority: str = "",
             disabled: bool | None = None, category_id: int | None = None,
             usr_id: int | None = None, limit: int = 0,
             offset: int = 0) -> list[dict]:
        """performListInformationSeeds + filter semantics (:474-533)."""
        if limit < 0 or offset < 0:
            raise InfoSeedError("limit and offset must be non-negative")
        limit = min(limit or DEFAULT_LIMIT, MAX_LIMIT)
        rows = sorted(self._seeds.values(),
                      key=lambda r: r["information_seed_id"])
        out = []
        for row in rows:
            if status and row["status"] != status.strip():
                continue
            if priority and row["priority"] != priority.strip():
                continue
            if disabled is not None and row["disabled"] != disabled:
                continue
            if category_id is not None and \
                    row["category_id"] != category_id:
                continue
            if usr_id is not None and row["usr_id"] != usr_id:
                continue
            out.append(dict(row))
        return out[offset:offset + limit]
