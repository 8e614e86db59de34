"""User-agent database (reference ``pkg/common/user_agent.go``).

The reference loads ``support/user_agents.json`` — a map of
``type → [ {os, brg, ua: [{ua, pct}, ...]} ]`` groups — and picks agents
by (type), (type, os), (type, os, brg) with ``brg="random"`` resolving
through a random group, or (type, os, brg, pct) keeping only agents at or
above a market-share percentage (user_agent.go:60-281). Selection quirks
preserved:

- lookups take the FIRST matching group only (``break`` on match);
- a miss yields ``""`` (empty group), never an error;
- the pct filter is ``>=`` against each agent's ``pct`` field.

Randomness is injected (``rng``) so crawl configs can pin a seed — the
reference uses crypto/rand, which is exactly what a deterministic
pipeline must not do; default stays random.

The fetch stage (`stages/fetch.py`) takes a plain ``user_agent`` string;
``UserAgentsDB.get_*`` is how a per-source config resolves that string
when it specifies type/os/brg selectors instead of a literal UA.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field


@dataclass
class UserAgentGroup:
    os: str
    brg: str
    type: str
    user_agents: list[dict] = field(default_factory=list)  # {"ua", "pct"}


class UserAgentsDB:
    def __init__(self, groups: list[UserAgentGroup] | None = None,
                 rng: random.Random | None = None):
        self.groups = groups or []
        self.rng = rng or random.Random()

    @classmethod
    def from_json(cls, path_or_text: str, rng=None) -> "UserAgentsDB":
        """InitUserAgentsDB (user_agent.go:60-116): tolerant of malformed
        groups (skipped, like the reference's continue branches)."""
        if path_or_text.lstrip().startswith("{"):
            raw = json.loads(path_or_text)
        else:
            with open(path_or_text) as f:
                raw = json.load(f)
        groups = []
        for ua_type, group_list in raw.items():
            if not isinstance(group_list, list):
                raise ValueError(
                    f"unexpected format for groups in {ua_type}")
            for group in group_list:
                if not isinstance(group, dict):
                    raise ValueError("unexpected format for group data")
                ua_list = group.get("ua")
                if not isinstance(ua_list, list):
                    continue
                agents = [
                    {"ua": str(ua.get("ua", "")),
                     "pct": float(ua.get("pct", 0.0))}
                    for ua in ua_list if isinstance(ua, dict)]
                groups.append(UserAgentGroup(
                    os=str(group.get("os", "")),
                    brg=str(group.get("brg", "")),
                    type=ua_type, user_agents=agents))
        return cls(groups)

    def is_empty(self) -> bool:
        return not self.groups

    def get_any_user_agent(self) -> str:
        if self.is_empty():
            return ""
        group = self.rng.choice(self.groups)
        if not group.user_agents:
            return ""
        return self.rng.choice(group.user_agents)["ua"]

    def _first_group(self, **match) -> UserAgentGroup | None:
        for g in self.groups:
            if all(getattr(g, k) == v for k, v in match.items()):
                return g
        return None

    def get_agent_by_type_and_os(self, ua_type: str, os: str) -> str:
        if self.is_empty():
            return ""
        group = self._first_group(type=ua_type, os=os)
        if group is None or not group.user_agents:
            return ""
        return self.rng.choice(group.user_agents)["ua"]

    def get_agent_by_type_os_brg(self, ua_type: str, os: str,
                                 brg: str) -> str:
        if self.is_empty():
            return ""
        if brg == "random" or not brg.strip():
            brg_selected = self.rng.choice(self.groups).brg
        else:
            brg_selected = brg.strip().lower()
        group = self._first_group(type=ua_type, os=os, brg=brg_selected)
        if group is None or not group.user_agents:
            return ""
        return self.rng.choice(group.user_agents)["ua"]

    def get_agent_by_type_os_brg_pct(self, ua_type: str, os: str, brg: str,
                                     pct: float) -> str:
        if self.is_empty():
            return ""
        group = self._first_group(type=ua_type, os=os, brg=brg)
        if group is None or not group.user_agents:
            return ""
        eligible = [ua for ua in group.user_agents if ua["pct"] >= pct]
        if not eligible:
            return ""
        return self.rng.choice(eligible)["ua"]
