"""Full-page screenshot plane (pkg/crawler/web.go:308-706): scroll-slice
capture, stitch (incl. the last-slice bottom-crop quirk), alert retry,
max-height clamp, and the file/HTTP/S3 storage dispatch."""

import hashlib
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from thecrowler_ray.codecs import png_decode, png_encode
from thecrowler_ray.screenshot import (
    SCROLL_SCRIPT,
    FileStorageAPI,
    ScreenshotError,
    SyntheticDriver,
    capture_screenshots,
    save_screenshot,
    stitch_screenshots,
    take_screenshot,
    write_data_to_s3,
)

HTML = "\n".join(f"<p>line {i} with some text body</p>" for i in range(60))


def test_stitch_reconstructs_page_exactly(tmp_path):
    # page taller than the viewport and NOT a multiple of it → the last
    # slice is clamped by the browser and bottom-cropped by the stitch
    drv = SyntheticDriver(HTML, viewport=(120, 256))
    page_h = drv.page.shape[0]
    assert page_h > 120 and page_h % 120 != 0
    ss = take_screenshot(drv, "page.png",
                         storage=FileStorageAPI(path=str(tmp_path)))
    out = png_decode(open(ss.screenshot_link, "rb").read())
    assert out.shape[:2] == (page_h, 256)
    # stitched RGB equals the original page pixel-for-pixel
    np.testing.assert_array_equal(out[:, :, :3], drv.page)
    assert ss.width == 256 and ss.height == page_h
    assert ss.byte_size == len(open(ss.screenshot_link, "rb").read())
    assert ss.content_hash == hashlib.sha256(
        open(ss.screenshot_link, "rb").read()).hexdigest()
    assert ss.location_hash == hashlib.sha256(
        ss.screenshot_link.encode()).hexdigest()
    # scroll offsets were the reference's exact script strings
    scrolls = [s for s in drv.scripts if s.startswith("window.scrollTo")]
    assert scrolls == [SCROLL_SCRIPT % y for y in range(0, page_h, 120)]


def test_stitch_last_slice_bottom_crop_quirk():
    # build two viewport slices by hand: page 0..150 with viewport 100 —
    # the second screenshot is taken at the CLAMPED scroll (50) so its
    # bottom 50 rows are the true page tail (web.go:440-452)
    page = np.arange(150 * 8 * 3, dtype=np.uint8).reshape(150, 8, 3)
    s1 = png_encode(page[0:100])
    s2 = png_encode(page[50:150])  # clamped scroll: overlaps rows 50..100
    out = stitch_screenshots([s1, s2], 8, 150)
    np.testing.assert_array_equal(out[:, :, :3], page)


def test_max_height_clamp(tmp_path):
    drv = SyntheticDriver(HTML, viewport=(120, 256))
    ss = take_screenshot(drv, "clamped.png", max_height=130,
                         storage=FileStorageAPI(path=str(tmp_path)))
    assert ss.height == 130
    assert png_decode(open(ss.screenshot_link, "rb").read()).shape[0] == 130
    # only two scrolls needed (0, 120)
    scrolls = [s for s in drv.scripts if s.startswith("window.scrollTo")]
    assert len(scrolls) == 2


def test_alert_accept_and_retry():
    drv = SyntheticDriver(HTML, viewport=(120, 256), alert_on_slice=1)
    shots = capture_screenshots(drv, drv.page.shape[0], 120)
    assert len(shots) == (drv.page.shape[0] + 119) // 120
    assert not drv.alert_pending  # alert was accepted, capture retried


def test_local_storage_default_and_unsupported_type(tmp_path):
    loc = save_screenshot("a.png", b"data", FileStorageAPI(path=str(tmp_path)))
    assert open(loc, "rb").read() == b"data"
    with pytest.raises(ScreenshotError, match="unsupported storage type"):
        save_screenshot("a.png", b"d",
                        FileStorageAPI(host="h.test", port=9, type="ftp"))
    with pytest.raises(ScreenshotError, match="host and port"):
        save_screenshot("a.png", b"d",
                        FileStorageAPI(host="h.test", type="http"))


class _Store(BaseHTTPRequestHandler):
    saved: dict = {}

    def log_message(self, *a):
        pass

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        name = self.headers.get("Filename", "")
        auth = self.headers.get("Authorization", "")
        if self.path == "/store/noloc":
            self.send_response(200)
            self.end_headers()
            return
        if auth != "Bearer tok":
            self.send_response(403)
            self.end_headers()
            return
        _Store.saved[name] = body
        self.send_response(200)
        self.send_header("Location", f"https://cdn.test/{name}")
        self.end_headers()


@pytest.fixture(scope="module")
def store():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Store)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_port
    httpd.shutdown()


def _loopback_transport(port):
    # production refuses private IPs (cmn.IsDisallowedIP), so the fixture
    # rides the injectable transport with a real socket underneath
    import http.client

    def t(url, headers, body):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
        path = "/" + url.split("/", 3)[3]
        conn.request("POST", path, body=body, headers=headers)
        resp = conn.getresponse()
        out = resp.status, dict(resp.getheaders())
        resp.read()
        conn.close()
        return out

    return t


def test_http_storage_roundtrip(store):
    cfg = FileStorageAPI(host="127.0.0.1", port=store, path="store",
                         token="tok", type="http")
    loc = save_screenshot("shot.png", b"\x89PNGdata", cfg,
                          transport=_loopback_transport(store))
    assert loc == "https://cdn.test/shot.png"
    assert _Store.saved["shot.png"] == b"\x89PNGdata"
    # non-200 → error with the status code
    bad = FileStorageAPI(host="127.0.0.1", port=store, path="store",
                         token="wrong", type="http")
    with pytest.raises(ScreenshotError, match="status code: 403"):
        save_screenshot("x.png", b"d", bad,
                        transport=_loopback_transport(store))
    # missing Location header is an error (web.go:567-571)
    noloc = FileStorageAPI(host="127.0.0.1", port=store, path="store/noloc",
                           token="tok", type="http")
    with pytest.raises(ScreenshotError, match="location header not found"):
        save_screenshot("x.png", b"d", noloc,
                        transport=_loopback_transport(store))


def test_http_storage_blocks_private_hosts(store):
    # the REAL wire path (no injected transport) enforces the IP guard
    cfg = FileStorageAPI(host="127.0.0.1", port=store, path="store",
                         token="tok", type="http")
    with pytest.raises(ScreenshotError, match="not allowed"):
        save_screenshot("shot.png", b"d", cfg)


def test_take_screenshot_to_http_store(store):
    drv = SyntheticDriver(HTML, viewport=(120, 256))
    cfg = FileStorageAPI(host="127.0.0.1", port=store, path="store",
                         token="tok", type="http")
    ss = take_screenshot(drv, "full.png", storage=cfg,
                         transport=_loopback_transport(store))
    assert ss.screenshot_link == "https://cdn.test/full.png"
    stored = _Store.saved["full.png"]
    assert ss.byte_size == len(stored)
    np.testing.assert_array_equal(png_decode(stored)[:, :, :3], drv.page)


def test_s3_seam_fails_loudly(monkeypatch):
    with pytest.raises(ScreenshotError, match="missing S3 bucket"):
        write_data_to_s3("k", b"d", FileStorageAPI())
    # real SigV4 client now — still loud without credentials
    # (test_awsv4.py covers the credentialed fixture-server path)
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    with pytest.raises(ScreenshotError, match="credentials"):
        write_data_to_s3("k", b"d", FileStorageAPI(path="bucket"))
