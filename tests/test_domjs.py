"""vdi_plugin DOM seam: reference plugins mutate the parsed page DOM
(reference pkg/plugin/plugins.go:751-795 execVDIPlugin → browser
ExecuteScript; here minijs + htmldom via domjs)."""

import os

import pytest

from thecrowler_ray.domjs import apply_dom_plugins, run_dom_plugin
from thecrowler_ray.minijs import MiniJsError
from thecrowler_ray.plugins import PluginRegistry

PAGE = """
<html><head><title>Post</title></head><body>
<div id="nav" class="menu dark">nav stuff</div>
<div class="article-content"><p>KEEP-OUT secret body</p></div>
<main><p>real content</p><a href="/next" id="next">next</a></main>
</body></html>
"""


def test_reference_remove_article_content_plugin_runs_verbatim():
    """plugins/RemoveArticleContent.js — one querySelector().remove() —
    runs UNMODIFIED and its data effect (the node is gone from the HTML
    that scraping sees next) is observable."""
    path = "/root/reference/plugins/RemoveArticleContent.js"
    if not os.path.exists(path):
        pytest.skip("reference absent")
    src = open(path).read()
    _, mutated = run_dom_plugin(src, PAGE)
    assert "KEEP-OUT" not in mutated
    assert "real content" in mutated and "nav stuff" in mutated


def test_dom_read_surface():
    src = """
        var el = document.querySelector('div.article-content p');
        var nav = document.getElementById('nav');
        var links = document.querySelectorAll('a');
        var result = {
            text: el.textContent,
            tag: el.tagName,
            navClasses: nav.className,
            hasDark: nav.classList.contains('dark'),
            nLinks: links.length,
            href: links[0].getAttribute('href'),
            missing: document.querySelector('#nope') === null,
            parentTag: el.parentElement.tagName,
            nBodyChildren: document.body.children.length,
            title: document.title,
            sameNode: document.getElementById('next') === links[0]
        };
    """
    out, _ = run_dom_plugin(src, PAGE)
    assert out == {
        "text": "KEEP-OUT secret body",
        "tag": "P",
        "navClasses": "menu dark",
        "hasDark": True,
        "nLinks": 1,
        "href": "/next",
        "missing": True,
        "parentTag": "DIV",
        "nBodyChildren": 3,
        "title": "Post",
        "sameNode": True,
    }


def test_dom_mutation_surface():
    src = """
        var nav = document.getElementById('nav');
        nav.classList.remove('dark');
        nav.classList.add('light');
        nav.setAttribute('data-x', '1');
        var a = document.querySelector('a');
        a.textContent = 'NEXT';
        document.querySelector('main p').innerHTML = 'rewritten <b>bold</b>';
        document.querySelector('.article-content').remove();
        var result = {cls: nav.className, toggledOn: nav.classList.toggle('t'),
                      toggledOff: nav.classList.toggle('t')};
    """
    out, mutated = run_dom_plugin(src, PAGE)
    assert out == {"cls": "menu light", "toggledOn": True,
                   "toggledOff": False}
    assert 'data-x="1"' in mutated
    assert ">NEXT</a>" in mutated
    assert "rewritten <b>bold</b>" in mutated
    assert "KEEP-OUT" not in mutated
    # unknown browser APIs read as undefined → calling one fails loudly
    with pytest.raises(MiniJsError):
        run_dom_plugin("document.cookie.split(';');", PAGE)


def test_apply_dom_plugins_sequence_feeds_extraction():
    from thecrowler_ray.htmlx import extract_page_info

    cleaned = apply_dom_plugins(PAGE, [
        "document.querySelector('div.article-content').remove();",
        "document.getElementById('nav').remove();",
    ])
    info = extract_page_info("https://x.test/", cleaned)
    assert "KEEP-OUT" not in info["body_text"]
    assert "nav stuff" not in info["body_text"]
    assert "real content" in info["body_text"]
    assert [ln["href"] for ln in info["links"]] == ["/next"]


def test_registry_vdi_plugin_mutates_ctx_html():
    reg = PluginRegistry().register_vdi_plugin(
        "strip", "document.querySelector('.article-content').remove(); true;")
    ctx = {"url": "https://x.test/", "html": PAGE}
    out = reg.run_plugin("strip", ctx)
    assert out == [True]
    assert "KEEP-OUT" not in ctx["html"]
    assert "real content" in ctx["html"]
