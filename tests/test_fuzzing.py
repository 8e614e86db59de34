import pytest

from thecrowler_ray.fuzzing import (
    clear_hooks,
    fuzz_url,
    generate_links,
    register_hook,
    run_hooks,
)

RULE = {
    "rule_name": "fuzz1",
    "target_elements": [{"selector_type": "path", "selector": "v1"}],
    "fuzzing_parameters": [
        {"parameter_name": "query", "selector": "id",
         "fuzzing_type": "value_based", "values": ["1", "2"]},
        {"parameter_name": "path", "fuzzing_type": "value_based",
         "values": ["v2", "beta"]},
        {"parameter_name": "query", "selector": "debug",
         "fuzzing_type": "pattern_based", "pattern": "true"},
    ],
}


def test_query_fuzzing():
    got = fuzz_url("http://x.test/api/v1/items?id=9&page=2", RULE)
    # two values for id + one pattern for debug + two path substitutions
    assert "http://x.test/api/v1/items?id=1&page=2" in got
    assert "http://x.test/api/v1/items?id=2&page=2" in got
    assert any("debug=true" in u and "id=9" in u for u in got)
    assert "http://x.test/api/v2/items?id=9&page=2" in got
    assert "http://x.test/api/beta/items?id=9&page=2" in got
    assert len(got) == 5


def test_no_query_means_no_query_fuzzing():
    got = fuzz_url("http://x.test/api/v1/items", RULE)
    assert got == [
        "http://x.test/api/v2/items",
        "http://x.test/api/beta/items",
    ]


def test_hooks_lifecycle():
    clear_hooks()
    seen = []
    register_hook("per_fuzz_candidate", lambda u: (seen.append(u), u + "&h=1")[1])
    try:
        links = generate_links("http://x.test/a?q=1", [
            {"fuzzing_parameters": [{"parameter_name": "query", "selector": "q",
                                     "values": ["z"]}]}
        ])
        assert links == ["http://x.test/a?q=z&h=1"]
        assert seen == ["http://x.test/a?q=z"]
    finally:
        clear_hooks()
    with pytest.raises(ValueError):
        register_hook("bogus", lambda x: x)
    assert run_hooks("pre_crawl", "payload") == "payload"
