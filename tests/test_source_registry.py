"""Source-registry console semantics (reference cmd/addSource,
cmd/removeSource, cmd/updateSourceStatus, cmd/exportSources,
cmd/addCategory)."""

import hashlib
import json
import os

import pandas as pd
import pytest

from thecrowler_ray.source_registry import (
    SourceRegistry,
    calculate_source_uid,
    export_sources,
    normalize_source_url,
    prepare_url,
)

LONDON_NOON_2026_08_17 = 1786964400.0  # 2026-08-17 12:00 BST (+01:00)


def test_prepare_url_defang_and_squat():
    # cmd/addSource/main.go:285-320
    assert prepare_url(" hxxps://evil[.]example[.]com/path/ ") == \
        "https://evil.example.com/path"
    assert prepare_url("hxxp://a(.)b{.}c") == "http://a.b.c"
    assert prepare_url("fxp://files[.]x") == "ftp://files.x"
    assert prepare_url("https://ok.test/page/") == "https://ok.test/page"
    assert prepare_url("h(:)//weird") == "h://weird"


def test_normalize_source_url_query_only():
    # pkg/database/source.go:106-129: only %2F and %3A decode, query only
    assert normalize_source_url("http://a.test/?u=https%3A%2F%2Fb.test") \
        == "http://a.test/?u=https://b.test"
    assert normalize_source_url("http://a.test/p%2Fq") == \
        "http://a.test/p%2Fq"  # path escapes untouched
    assert normalize_source_url("http://a.test/?x=a%26b") == \
        "http://a.test/?x=a%26b"  # '&' stays escaped
    assert normalize_source_url("  http://a.test  ") == "http://a.test"
    assert normalize_source_url("") == ""


def test_calculate_source_uid_length_prefixed_sha256():
    # pkg/database/source.go:92-97: sha256("len:name" + "len:url")
    expect = hashlib.sha256(b"2:ab14:https://x.test").hexdigest()
    assert calculate_source_uid(" ab ", "https://x.test") == expect
    # uid is stable across query escaping variants (normalization first)
    assert calculate_source_uid("a", "http://x.test/?q=a%2Fb") == \
        calculate_source_uid("a", "http://x.test/?q=a/b")


def test_add_remove_and_claim_interop(tmp_path):
    reg = SourceRegistry(str(tmp_path / "sources.parquet"))
    sid1 = reg.add_source("https://a.test/", now_s=100.0)
    sid2 = reg.add_source("hxxps://b[.]test", priority="high",
                          config={"depth": 2}, now_s=200.0)
    assert (sid1, sid2) == (1, 2)
    assert list(reg.df.url) == ["https://a.test", "https://b.test"]
    assert reg.df.status.tolist() == ["pending", "pending"]
    assert json.loads(reg.df.config.iloc[1]) == {"depth": 2}
    reg.save()

    # reload round-trips; claim_sources runs directly off the registry
    reg2 = SourceRegistry(str(tmp_path / "sources.parquet"))
    from thecrowler_ray.scheduler import ClaimPolicy, claim_sources

    claimed = claim_sources(reg2.df, now_s=300.0,
                            policy=ClaimPolicy(limit=10))
    assert claimed.source_id.tolist() == [1, 2]  # created_at, source_id order
    assert set(claimed.status) == {"processing"}

    # removeSource: exact-URL delete with the ConsoleResponse messages
    assert reg2.remove_source("https://a.test").message == \
        "Source and related data removed successfully"
    assert reg2.remove_source("https://nope.test").message == \
        "Failed to remove the source"
    assert reg2.df.source_id.tolist() == [2]


def test_bulk_csv_defaults_and_force(tmp_path):
    reg = SourceRegistry(str(tmp_path / "s.parquet"))
    csv_text = ("https://a.test/,5,7,0,3,cfg.json\n"
                "https://b.test\n"
                ",,,\n")
    # config loader failure aborts without force, inserts without config
    # with force (cmd/addSource forceInsert)
    def boom(name):
        raise FileNotFoundError(name)

    with pytest.raises(FileNotFoundError):
        reg.add_bulk_csv(csv_text, config_loader=boom)
    reg = SourceRegistry(str(tmp_path / "s2.parquet"))
    ids = reg.add_bulk_csv(csv_text, config_loader=boom, force=True)
    assert ids == [1, 2]
    row = reg.df.iloc[0]
    assert (row["category_id"], row["usr_id"], row["restricted"],
            row["flags"]) == (5, 7, 0, 3)
    row2 = reg.df.iloc[1]
    assert (row2["category_id"], row2["usr_id"], row2["restricted"],
            row2["flags"]) == (0, 0, 1, 0)  # defaults: restricted=1, flags=0


def test_update_status_modes(tmp_path):
    reg = SourceRegistry(str(tmp_path / "s.parquet"))
    for i, t in enumerate([100.0, 200.0, 300.0]):
        reg.add_source(f"https://s{i}.test", now_s=t)
    assert reg.update_status("done", url="https://s1.test/") == 1
    assert reg.df.status.tolist() == ["pending", "done", "pending"]
    assert reg.update_status("x", source_id=3) == 1
    assert reg.update_status("bulk", bulk_csv="https://s0.test\nhttps://nope.test\n") == 1
    assert reg.update_status("all", all_sources=True) == 3
    with pytest.raises(ValueError):
        reg.update_status("")
    with pytest.raises(ValueError):
        reg.update_status("s")  # no selector


def test_update_status_time_windows(tmp_path):
    reg = SourceRegistry(str(tmp_path / "s.parquet"))
    day = 86400.0
    # one source updated "yesterday" (London), one today, one long ago
    reg.add_source("https://old.test", now_s=LONDON_NOON_2026_08_17 - 40 * day)
    reg.add_source("https://yday.test", now_s=LONDON_NOON_2026_08_17 - day)
    reg.add_source("https://today.test", now_s=LONDON_NOON_2026_08_17)
    n = reg.update_status("new", yesterday=True,
                          now_s=LONDON_NOON_2026_08_17)
    assert n == 1 and reg.df.status.tolist() == ["pending", "new", "pending"]
    # within 48h → [now-48h, now): yesterday matches; a row stamped
    # exactly "now" is excluded (reference SQL last_updated_at < end)
    assert reg.update_status("w", within="48h",
                             now_s=LONDON_NOON_2026_08_17) == 1
    reg.df.loc[reg.df.url == "https://today.test",
               "last_updated_at"] = LONDON_NOON_2026_08_17 - 1.0
    assert reg.update_status("w2", within="48h",
                             now_s=LONDON_NOON_2026_08_17) == 2
    # after/before RFC3339 [start, end)
    import datetime as dt

    after = dt.datetime.fromtimestamp(
        LONDON_NOON_2026_08_17 - 2 * day,
        tz=dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    assert reg.update_status("a", after=after) == 2
    with pytest.raises(ValueError):
        reg.update_status("b", after=after, before=after)
    with pytest.raises(ValueError):
        reg.update_status("b", before=after)  # before requires after


def test_categories_nested(tmp_path):
    reg = SourceRegistry(str(tmp_path / "s.parquet"))
    ids = reg.add_categories({"categories": [
        {"name": "News", "description": "d",
         "subcategories": [{"name": "Tech"}, {"name": "Sport"}]},
        {"name": "Blogs"},
    ]})
    assert ids == [1, 2, 3, 4]
    cats = reg.categories
    assert cats[cats.name == "Tech"].parent_id.iloc[0] == 1
    assert pd.isna(cats[cats.name == "Blogs"].parent_id.iloc[0])
    with pytest.raises(ValueError):
        reg.add_categories({"categories": [{"description": "no name"}]})
    reg.save()
    reg2 = SourceRegistry(str(tmp_path / "s.parquet"))
    assert len(reg2.categories) == 4


def test_export_sources_nested_shape(tmp_path):
    idx = tmp_path / "index"
    os.makedirs(idx / "search_index")
    os.makedirs(idx / "web_objects")
    os.makedirs(idx / "web_objects_index")
    pd.DataFrame({
        "doc_id": ["d1", "d2", "d3"],
        "url": ["https://a.test/", "https://a.test/p", "https://b.test/"],
    }).to_parquet(idx / "search_index" / "part.parquet")
    pd.DataFrame({"object_hash": ["h1"], "object_id": ["o1"],
                  "first_doc_id": ["d1"], "n_pages": [2]}).to_parquet(
        idx / "web_objects" / "part.parquet")
    pd.DataFrame({"object_hash": ["h1", "h1"],
                  "doc_id": ["d1", "d2"]}).to_parquet(
        idx / "web_objects_index" / "part.parquet")

    reg = SourceRegistry(str(tmp_path / "s.parquet"))
    reg.add_source("https://a.test")
    reg.add_source("https://b.test")
    reg.add_source("https://empty.test")
    out = export_sources(reg, str(idx), exported_at="2026-08-17T00:00:00Z")
    assert [s["source_id"] for s in out["sources"]] == [1, 2, 3]
    a = out["sources"][0]
    assert [p["page_url"] for p in a["pages"]] == \
        ["https://a.test/", "https://a.test/p"]
    assert a["pages"][0]["objects"] == [{"object_id": "o1",
                                        "object_hash": "h1"}]
    # LEFT-join semantics: page without objects still exports
    assert out["sources"][1]["pages"][0]["objects"] == []
    assert out["sources"][2]["pages"] == []


def test_cli_sources_roundtrip(tmp_path, capsys):
    from thecrowler_ray.__main__ import main

    regp = str(tmp_path / "reg.parquet")
    assert main(["sources", "add", "--registry", regp,
                 "--url", "hxxps://c[.]test/"]) == 0
    assert json.loads(capsys.readouterr().out)["source_id"] == 1
    assert main(["sources", "status", "--registry", regp,
                 "--url", "https://c.test", "--status", "completed"]) == 0
    assert json.loads(capsys.readouterr().out)["updated"] == 1
    assert main(["sources", "export", "--registry", regp]) == 0
    exported = json.loads(capsys.readouterr().out)
    assert exported["sources"][0]["source_url"] == "https://c.test"
    assert main(["sources", "remove", "--registry", regp,
                 "--url", "https://c.test"]) == 0
    assert "successfully" in json.loads(capsys.readouterr().out)["message"]
    reg = SourceRegistry(regp)
    assert len(reg.df) == 0
