"""Search providers (pkg/infoseed/searchproviders): generic JSON / Brave /
Bing adapters against a fixture HTTP server, RSS/Atom parsing, and the
provider → candidate pipeline handoff."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from thecrowler_ray.infoseed import normalize_candidates
from thecrowler_ray.infoseed_providers import (
    parse_feed,
    reciprocal_rank,
    results_to_candidates,
    search_bing,
    search_brave,
    search_json,
)


class _FixtureSearchServer:
    def __init__(self):
        srv = self
        self.requests = []

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                u = urlparse(self.path)
                qs = {k: v[0] for k, v in parse_qs(u.query).items()}
                srv.requests.append((u.path, qs, dict(self.headers)))
                page = int(qs.get("page", "1"))
                offset = int(qs.get("offset", "0"))
                if u.path == "/search":  # generic JSON, 2 pages
                    items = ([{"url": f"https://g{page}-{i}.test/",
                               "title": f"G {page}-{i}",
                               "snippet": "s"} for i in range(2)]
                             if page <= 2 else [])
                    body = {"results": items}
                elif u.path == "/res/v1/web/search":
                    body = {"web": {"results": [
                        {"url": "https://brave1.test/", "title": "B1",
                         "description": "d1"},
                        {"url": "", "title": "dropped"},
                        {"url": "https://brave2.test/", "title": "B2",
                         "description": "d2"},
                    ]}} if page == 1 else {"web": {"results": []}}
                elif u.path == "/v7.0/search":
                    vals = ([{"url": f"https://bing{offset + i}.test/",
                              "name": f"N{offset + i}", "snippet": "sn"}
                             for i in range(2)] if offset < 4 else [])
                    body = {"webPages": {"value": vals}}
                else:
                    body = {"error": u.path}
                data = json.dumps(body).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.httpd.server_address[1]
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_generic_json_provider_paginates():
    srv = _FixtureSearchServer()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        got = search_json(base, "crawler", page_size=2, max_pages=3,
                          token="tok-9")
        # pages 1+2 deliver 2 each; page 3 empty stops the loop
        assert [r["url"] for r in got] == [
            "https://g1-0.test/", "https://g1-1.test/",
            "https://g2-0.test/", "https://g2-1.test/",
        ]
        assert [r["rank"] for r in got] == [1, 2, 3, 4]
        assert got[3]["score"] == reciprocal_rank(4) == 0.25
        # q + page_size params and bearer header reached the server
        path, qs, headers = srv.requests[0]
        assert qs["q"] == "crawler" and qs["page_size"] == "2"
        assert headers["Authorization"] == "Bearer tok-9"
        assert "page" not in qs  # page 1 unpaginated
        assert srv.requests[1][1]["page"] == "2"
    finally:
        srv.close()


def test_brave_and_bing_adapters():
    srv = _FixtureSearchServer()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        brave = search_brave(base, "x", page_size=5, max_pages=2)
        # empty-url result dropped, ranks stay 1-based over kept results
        assert [r["title"] for r in brave] == ["B1", "B2"]
        assert srv.requests[0][1]["count"] == "5"  # brave uses count

        srv.requests.clear()
        bing = search_bing(base, "x", page_size=2, max_pages=3,
                           api_key="KEY1")
        assert [r["url"] for r in bing] == [
            "https://bing0.test/", "https://bing1.test/",
            "https://bing2.test/", "https://bing3.test/",
        ]
        # bing paginates by offset and sends the subscription header
        assert srv.requests[1][1]["offset"] == "2"
        assert srv.requests[0][2]["Ocp-Apim-Subscription-Key"] == "KEY1"
    finally:
        srv.close()


def test_rss_and_atom_parsing():
    rss = """<?xml version="1.0"?>
    <rss version="2.0"><channel><title>Feed</title>
      <item><title>One</title><link>https://r1.test/</link>
            <description>d1</description></item>
      <item><title>Two</title><link>https://r2.test/</link></item>
      <item><title>No link</title></item>
    </channel></rss>"""
    got = parse_feed(rss)
    assert [r["url"] for r in got] == ["https://r1.test/", "https://r2.test/"]
    assert got[0]["score"] == 1.0 and got[1]["rank"] == 2

    atom = """<?xml version="1.0"?>
    <feed xmlns="http://www.w3.org/2005/Atom">
      <entry><title>A1</title><link rel="alternate" href="https://a1.test/"/>
             <summary>s1</summary></entry>
      <entry><title>A2</title><link href="https://a2.test/"/></entry>
    </feed>"""
    got2 = parse_feed(atom)
    assert [r["url"] for r in got2] == ["https://a1.test/", "https://a2.test/"]

    with pytest.raises(ValueError, match="RSS/Atom"):
        parse_feed("<html></html>")


def test_provider_results_feed_candidate_pipeline():
    results = [
        {"url": "HTTPS://News.Test:443/a?utm_source=x", "title": "t",
         "snippet": "", "rank": 1, "score": 1.0},
        {"url": "https://news.test/a", "title": "dup", "snippet": "",
         "rank": 2, "score": 0.5},
    ]
    cands, rejected = normalize_candidates(results_to_candidates(results))
    assert len(cands) == 1  # second is a duplicate after normalization
    assert cands[0]["url"] == "https://news.test/a"
    assert cands[0]["score"] == 1.0
    assert rejected == {"duplicate_url": 1}


def test_common_crawl_index_adapter():
    import json as _json
    import threading as _t
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    seen = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            qs = {k: v for k, v in parse_qs(u.query).items()}
            seen.append(qs)
            page = int(qs["page"][0])
            if page == 0:  # NDJSON page
                lines = [
                    _json.dumps({"url": "https://cc1.test/", "timestamp":
                                 "20240101000000", "mime": "text/html",
                                 "status": "200", "digest": "D1"}),
                    _json.dumps({"url": "https://cc2.test/",
                                 "status": "200"}),
                ]
                data = "\n".join(lines).encode()
            elif page == 1:  # JSON-array page
                data = _json.dumps(
                    [{"url": "https://cc3.test/", "timestamp": "2024"}]
                ).encode()
            else:
                data = b""
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
    _t.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        from thecrowler_ray.infoseed_providers import search_common_crawl

        got = search_common_crawl(
            f"http://127.0.0.1:{httpd.server_address[1]}/cdx",
            "example.com", page_size=3, max_pages=3,
            url_template="*.{query}/*", mime="text/html",
        )
        assert [r["url"] for r in got] == [
            "https://cc1.test/", "https://cc2.test/", "https://cc3.test/"]
        assert got[0]["title"] == "Common Crawl capture 20240101000000"
        assert got[1]["title"] == "Common Crawl capture"
        assert got[0]["digest"] == "D1" and got[0]["score"] == 1.0
        # query construction: rendered template + output=json + mime filter
        q0 = seen[0]
        assert q0["url"] == ["*.example.com/*"]
        assert q0["output"] == ["json"]
        assert q0["filter"] == ["mime:text/html"]
    finally:
        httpd.shutdown()
        httpd.server_close()
