"""User-agent DB tests (pkg/common/user_agent.go): loader tolerance,
first-match group selection, random-brg resolution, pct filter — plus a
shape-compat check against the reference's own support/user_agents.json."""

import json
import os
import random

import pytest

from thecrowler_ray.user_agents import UserAgentsDB

DB_JSON = json.dumps({
    "desktop": [
        {"os": "linux", "brg": "chrome",
         "ua": [{"ua": "UA-linux-chrome-1", "pct": 40.0},
                {"ua": "UA-linux-chrome-2", "pct": 5.0}]},
        {"os": "linux", "brg": "chrome",   # duplicate key: first wins
         "ua": [{"ua": "UA-shadowed", "pct": 99.0}]},
        {"os": "windows", "brg": "firefox",
         "ua": [{"ua": "UA-win-ff", "pct": 10.0}]},
        {"os": "macos", "brg": "safari", "ua": "malformed"},  # skipped
    ],
    "mobile": [
        {"os": "android", "brg": "chrome",
         "ua": [{"ua": "UA-android", "pct": 70.0}]},
    ],
})


def _db(seed=1):
    return UserAgentsDB.from_json(DB_JSON, rng=None).__class__(
        UserAgentsDB.from_json(DB_JSON).groups, rng=random.Random(seed))


def test_loader_and_selection():
    db = _db()
    assert not db.is_empty()
    # malformed ua list skipped, 4 valid groups remain
    assert len(db.groups) == 4
    assert db.get_agent_by_type_and_os("desktop", "windows") == "UA-win-ff"
    # first matching group wins — the shadowed duplicate never surfaces
    for _ in range(20):
        ua = db.get_agent_by_type_os_brg("desktop", "linux", "Chrome ")
        assert ua in ("UA-linux-chrome-1", "UA-linux-chrome-2")
    # misses are empty strings, not errors
    assert db.get_agent_by_type_and_os("desktop", "plan9") == ""
    assert UserAgentsDB([]).get_any_user_agent() == ""


def test_pct_filter():
    db = _db()
    assert db.get_agent_by_type_os_brg_pct(
        "desktop", "linux", "chrome", 30.0) == "UA-linux-chrome-1"
    assert db.get_agent_by_type_os_brg_pct(
        "desktop", "linux", "chrome", 90.0) == ""
    for _ in range(10):
        assert db.get_agent_by_type_os_brg_pct(
            "desktop", "linux", "chrome", 1.0) in (
            "UA-linux-chrome-1", "UA-linux-chrome-2")


def test_random_brg_resolves_via_group():
    db = _db(seed=3)
    seen = {db.get_agent_by_type_os_brg("desktop", "linux", "random")
            for _ in range(50)}
    seen |= {db.get_agent_by_type_os_brg("desktop", "linux", "")
             for _ in range(50)}
    # random brg picks a group's brg; only chrome groups exist for
    # (desktop, linux) so hits are chrome UAs, misses are ""
    assert seen <= {"", "UA-linux-chrome-1", "UA-linux-chrome-2"}
    assert seen & {"UA-linux-chrome-1", "UA-linux-chrome-2"}


REF_DB = "/root/reference/support/user_agents.json"


@pytest.mark.skipif(not os.path.exists(REF_DB), reason="reference absent")
def test_reference_db_loads():
    db = UserAgentsDB.from_json(REF_DB)
    db.rng = random.Random(7)
    assert not db.is_empty()
    ua = db.get_any_user_agent()
    assert isinstance(ua, str) and ua
    types = {g.type for g in db.groups}
    assert types  # e.g. desktop/mobile in the shipped db
