"""Information-seed console tests (services/api/console.go:54-267,
409-560): add/update defaults, config + credential validation, list
filters with pagination caps, ws broadcast."""

import pytest

from thecrowler_ray.infoseed_console import (
    InfoSeedError,
    InfoSeedRegistry,
    contains_credential_key,
    validate_information_seed_config,
)


def test_config_validation():
    validate_information_seed_config(None)
    validate_information_seed_config({"providers": ["brave"]})
    with pytest.raises(InfoSeedError):
        validate_information_seed_config("[1,2]")
    with pytest.raises(InfoSeedError):
        validate_information_seed_config("{not json")
    with pytest.raises(InfoSeedError):
        validate_information_seed_config({"providers": [" "]})
    # allow-list and configured-provider gating
    with pytest.raises(InfoSeedError):
        validate_information_seed_config({"providers": ["bing"]},
                                         allow_list=["brave"])
    validate_information_seed_config({"providers": ["Brave "]},
                                     allow_list=["brave"])
    with pytest.raises(InfoSeedError):
        validate_information_seed_config({"providers": ["brave"]},
                                         configured={"bing": {}})


def test_credential_rejection():
    assert contains_credential_key({"a": {"nested": {"API_KEY": "x"}}}) \
        == "API_KEY"
    assert contains_credential_key([{"token": "x"}]) == "token"
    assert contains_credential_key({"providers": ["brave"]}) is None


def test_add_update_list(tmp_path):
    reg = InfoSeedRegistry(str(tmp_path / "seeds.json"),
                           allow_list=["brave", "bing"])
    with pytest.raises(InfoSeedError):
        reg.add("   ")  # seed text required
    with pytest.raises(InfoSeedError):
        reg.add("x", config={"api_key": "leak"})
    row = reg.add("  quantum computing startups ", user_id=7,
                  priority="high", config={"providers": ["brave"]},
                  now=100.0)
    assert row["information_seed"] == "quantum computing startups"
    assert row["usr_id"] == 7  # user_id fallback
    assert row["status"] == "new"  # default
    reg.add("fusion energy", status="active", category_id=3, now=101.0)
    reg.add("disabled one", disabled=True, now=102.0)

    # durable across reopen
    reg2 = InfoSeedRegistry(str(tmp_path / "seeds.json"))
    assert len(reg2.list()) == 3
    assert reg2.get(row["information_seed_id"])["priority"] == "high"

    # filters + aliases semantics
    assert [r["information_seed"] for r in reg2.list(status="active")] == \
        ["fusion energy"]
    assert len(reg2.list(disabled=False)) == 2
    assert reg2.list(usr_id=7)[0]["usr_id"] == 7
    assert reg2.list(category_id=3)[0]["category_id"] == 3
    assert len(reg2.list(limit=1)) == 1
    assert reg2.list(limit=1, offset=2)[0]["information_seed"] == \
        "disabled one"
    with pytest.raises(InfoSeedError):
        reg2.list(limit=-1)

    # update + link bookkeeping
    updated = reg2.update(row["information_seed_id"], status="processing",
                          now=200.0)
    assert updated["status"] == "processing"
    assert updated["last_updated_at"] == 200.0
    with pytest.raises(InfoSeedError):  # reg holds the allow-list
        reg.update(row["information_seed_id"],
                   config={"providers": ["astral"]})
    reg2.link_source(row["information_seed_id"])
    assert reg2.get(row["information_seed_id"])[
        "discovered_source_count"] == 1
    with pytest.raises(InfoSeedError):
        reg2.get(999)


def test_ws_broadcast(tmp_path):
    events = []

    class Hub:
        def broadcast(self, typ, payload):
            events.append((typ, payload["item"]["information_seed"]))

    reg = InfoSeedRegistry(str(tmp_path / "s.json"), ws_hub=Hub())
    row = reg.add("ai safety labs")
    reg.update(row["information_seed_id"], status="active")
    assert events == [("information_seed.added", "ai safety labs"),
                      ("information_seed.updated", "ai safety labs")]
