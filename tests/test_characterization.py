"""Characterization tests: extraction behavior pinned against committed
golden fixtures (reference: scraper_characterization_test.go + test_data/).

Any change to extraction semantics must consciously regenerate
``tests/fixtures/characterization.json`` — an unintended diff here means the
span-sequence invariant (BASELINE.json) drifted.
"""

import json
import os

from thecrowler_ray.htmlx import extract_page_info, page_spans

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "characterization.json")


def test_characterization_golden():
    with open(GOLDEN, encoding="utf-8") as f:
        golden = json.load(f)
    assert len(golden) >= 10
    for name, g in golden.items():
        info = extract_page_info(g["url"], g["html"])
        for field in ("title", "summary", "body_text", "lang"):
            assert info[field] == g[field], f"{name}: {field} drifted"
        assert info["meta_tags"] == g["meta_tags"], f"{name}: meta drifted"
        assert info["links"] == g["links"], f"{name}: links drifted"
        assert info["media"] == g["media"], f"{name}: media drifted"
        spans = page_spans(info)
        assert spans == g["spans"], f"{name}: span sequence drifted"


def test_known_quirks_pinned():
    """Reference-faithful quirks stay quirky."""
    with open(GOLDEN, encoding="utf-8") as f:
        golden = json.load(f)
    # scheme-less hrefs are validated with an implicit http:// prefix, so a
    # mailto: href survives link extraction (reference IsValidURL behavior)
    links = [ln["href"] for ln in golden["mailto_and_js_links"]["links"]]
    assert "mailto:a@b.c" in links and "ftp://files.test/x" in links
    # javascript: hrefs are dropped
    assert not any("javascript" in ln for ln in links)
