"""Anchor-text capture (htmlx) + aggregation (stages/anchors.py)."""

import pandas as pd
import ray.data as rd

from thecrowler_ray.htmlx import parse_html
from thecrowler_ray.stages.anchors import anchor_text_table


def test_parser_captures_anchor_text():
    page = parse_html(
        '<a href="/x">Hello <b>World</b></a>'
        '<a href="/y"></a>'
        '<a href="/z">  spaced   out  </a>'
    )
    by_href = {l["href"]: l["anchor"] for l in page.links}
    assert by_href == {"/x": "Hello World", "/y": "", "/z": "spaced out"}


def test_parser_anchor_hostile_inputs():
    # unclosed anchor, nested anchor restart, NULs — must not raise
    for h in ['<a href="/a">never closed',
              '<a href="/a">one<a href="/b">two</a>',
              '<a href="/a">\x00bad</a>', ""]:
        parse_html(h)


def test_aggregation_matches_brute_force(ray_session):
    pages = pd.DataFrame(
        {
            "html": [
                '<a href="t1">alpha beta</a><a href="t2">alpha</a>',
                '<a href="t1">beta</a><a href="t1">beta gamma</a>',
                '<a href="t2"></a>',
            ]
        }
    )
    got = (
        anchor_text_table(rd.from_pandas(pages))
        .to_pandas()
        .sort_values("target")
        .reset_index(drop=True)
    )
    # t1 terms: alpha, beta | beta, beta gamma → beta×3 alpha×1 gamma×1
    t1 = got[got["target"] == "t1"].iloc[0]
    assert (t1["n_terms"], t1["n_unique_terms"]) == (5, 3)
    assert (t1["top_term"], t1["top_cnt"]) == ("beta", 3)
    # t2: 'alpha' once + one empty-anchor marker
    t2 = got[got["target"] == "t2"].iloc[0]
    assert (t2["n_terms"], t2["n_unique_terms"]) == (2, 2)
    # tie at 1: lexicographic — '' < 'alpha'
    assert (t2["top_term"], t2["top_cnt"]) == ("", 1)
