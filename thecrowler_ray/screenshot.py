"""Full-page screenshot capture: scroll-slice → stitch → encode → store.

Mirrors the reference's screenshot plane (``pkg/crawler/web.go:308-706``):

- ``take_screenshot(driver, filename, max_height, ...)`` orchestrates the
  capture exactly like ``TakeScreenshot`` (:309-357): read the viewport
  size and total page height via the same JS snippets, clamp to
  ``max_height``, scroll-capture viewport slices, stitch, PNG-encode,
  store, and return the Screenshot record (link, format, width, height,
  byte_size, content_hash = sha256(bytes), location_hash = sha256(link)).
- ``stitch_screenshots`` reproduces ``stitchScreenshots`` (:430-462)
  including the last-slice quirk: when the remaining height is less than
  the final slice's height, only the slice's BOTTOM ``remaining`` rows are
  drawn (the reference crops ``bounds.Max.Y - remainingHeight`` — the
  scrolled page can't scroll past the end, so the tail would duplicate).
- ``save_screenshot`` reproduces ``saveScreenshot`` (:490-514): an
  ImageStorageAPI config with a host dispatches on type — ``http`` POSTs
  the bytes (``writeDataViaHTTP``, :527-575: octet-stream body, Filename
  header, Bearer token, disallowed-IP guard, the response's ``Location``
  header is REQUIRED), ``s3`` needs an AWS client (import-gated seam
  here), anything else errors "unsupported storage type"; no host falls
  back to a local file under ``cfg.path``.

The driver is a seam with the vdi.WebDriver contract used by the
reference — ``execute_script(js) -> value`` and ``screenshot() -> png
bytes`` — so a real browser hook drops in on a live cluster while tests
drive a deterministic fake that rasterizes the synthetic layout.
"""

from __future__ import annotations

import hashlib
import http.client
import os
import socket
from dataclasses import dataclass

import numpy as np

from .codecs import png_decode, png_encode
from .fetch_client import is_private_or_meta

__all__ = [
    "FileStorageAPI",
    "Screenshot",
    "SyntheticDriver",
    "capture_screenshots",
    "save_screenshot",
    "stitch_screenshots",
    "take_screenshot",
]

# the exact scripts the reference executes (web.go:361,383,399)
VIEWPORT_SIZE_SCRIPT = "return [window.innerHeight, window.innerWidth]"
TOTAL_HEIGHT_SCRIPT = "return document.body.parentNode.scrollHeight"
SCROLL_SCRIPT = "window.scrollTo(0, %d);"


@dataclass
class Screenshot:
    """crawler/types.go Screenshot subset recorded by TakeScreenshot."""

    screenshot_link: str = ""
    format: str = "png"
    width: int = 0
    height: int = 0
    byte_size: int = 0
    content_hash: str = ""
    location_hash: str = ""


@dataclass
class FileStorageAPI:
    """cfg.FileStorageAPI fields the screenshot path reads."""

    host: str = ""
    port: int = 0
    path: str = ""
    token: str = ""
    type: str = ""          # "http" | "s3" | "" (local)
    ssl_mode: str = ""      # "enable" → https
    timeout: float = 15.0


class ScreenshotError(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# capture + stitch (web.go:359-488)


def get_window_size(driver) -> tuple[int, int]:
    """getWindowSize (web.go:359-380): returns (height, width)."""
    res = driver.execute_script(VIEWPORT_SIZE_SCRIPT)
    if not isinstance(res, (list, tuple)) or len(res) != 2:
        raise ScreenshotError(
            f"unexpected result format for viewport size: {res!r}")
    return int(res[0]), int(res[1])


def get_total_height(driver) -> int:
    """getTotalHeight (web.go:382-395)."""
    return int(driver.execute_script(TOTAL_HEIGHT_SCRIPT))


def capture_screenshots(driver, total_height: int,
                        window_height: int) -> list[bytes]:
    """captureScreenshots (web.go:397-428): scroll by viewport heights and
    snap a slice at each stop; an 'unexpected alert open' failure accepts
    the alert and retries once."""
    shots: list[bytes] = []
    y = 0
    while y < total_height:
        driver.execute_script(SCROLL_SCRIPT % y)
        try:
            shot = driver.screenshot()
        except Exception as e:  # noqa: BLE001 — mirror the Go error probe
            if "unexpected alert open" in str(e) and hasattr(
                    driver, "accept_alert"):
                driver.accept_alert()
                shot = driver.screenshot()
            else:
                raise
        shots.append(shot)
        y += window_height
    return shots


def stitch_screenshots(screenshots: list[bytes], window_width: int,
                       total_height: int) -> np.ndarray:
    """stitchScreenshots (web.go:430-462) → RGBA uint8 array
    (total_height, window_width, 4). Slices are drawn top-down; the LAST
    slice is bottom-aligned when less than a full viewport remains."""
    final = np.zeros((total_height, window_width, 4), np.uint8)
    current_y = 0
    for i, raw in enumerate(screenshots):
        img = png_decode(raw)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        if img.shape[2] == 3:
            img = np.concatenate(
                [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2)
        h, w = img.shape[:2]
        w = min(w, window_width)
        if i == len(screenshots) - 1:
            remaining = total_height - current_y
            if remaining < h:
                img = img[h - remaining:]       # keep the BOTTOM rows
                h = remaining
        rows = min(h, total_height - current_y)
        if rows <= 0:
            break
        final[current_y:current_y + rows, :w] = img[:rows, :w]
        current_y += rows
    return final


def take_screenshot(driver, filename: str, max_height: int = 0,
                    storage: FileStorageAPI | None = None,
                    transport=None) -> Screenshot:
    """TakeScreenshot (web.go:309-357)."""
    window_height, window_width = get_window_size(driver)
    total_height = get_total_height(driver)
    if max_height > 0 and total_height > max_height:
        total_height = max_height
    shots = capture_screenshots(driver, total_height, window_height)
    final = stitch_screenshots(shots, window_width, total_height)
    payload = png_encode(final)
    location = save_screenshot(filename, payload, storage or FileStorageAPI(),
                               transport=transport)
    return Screenshot(
        screenshot_link=location,
        format="png",
        width=window_width,
        height=total_height,
        byte_size=len(payload),
        content_hash=hashlib.sha256(payload).hexdigest(),
        location_hash=hashlib.sha256(location.encode("utf-8")).hexdigest(),
    )


# ---------------------------------------------------------------------------
# storage backends (web.go:490-706)


def save_screenshot(filename: str, data: bytes, cfg: FileStorageAPI,
                    transport=None) -> str:
    """saveScreenshot (web.go:490-514). Returns the stored location."""
    if cfg.host:
        if not cfg.port:
            raise ScreenshotError(
                "invalid ImageStorageAPI configuration: host and port must "
                "be set")
        kind = (cfg.type or "").strip().lower()
        if kind == "http":
            return write_data_via_http(filename, data, cfg,
                                       transport=transport)
        if kind == "s3":
            return write_data_to_s3(filename, data, cfg)
        raise ScreenshotError("unsupported storage type")
    # local fallback (web.go:511-513: path + "/" + filename)
    path = os.path.join(cfg.path or ".", filename)
    with open(path, "wb") as f:
        f.write(data)
    return path


def _host_disallowed(host: str) -> bool:
    """cmn.IsDisallowedIP level 1: resolve and refuse private/link-local."""
    try:
        infos = socket.getaddrinfo(host, None)
    except OSError:
        return True
    return any(is_private_or_meta(i[4][0]) for i in infos)


def write_data_via_http(filename: str, data: bytes, cfg: FileStorageAPI,
                        transport=None) -> str:
    """writeDataViaHTTP (web.go:527-575): POST octet-stream with Filename +
    Bearer headers; the response MUST carry a Location header. ``transport``
    (url, headers, body) -> (status, headers) replaces the wire client in
    tests and for loopback fixtures (the production guard refuses private
    IPs, which is everything reachable in this sandbox)."""
    protocol = "https" if cfg.ssl_mode == "enable" else "http"
    url = f"{protocol}://{cfg.host}:{cfg.port}/{cfg.path}"
    headers = {
        "Content-Type": "application/octet-stream",
        "Filename": filename,
        "Authorization": "Bearer " + (cfg.token or ""),
    }
    if transport is not None:
        status, rheaders = transport(url, headers, data)
    else:
        if _host_disallowed(cfg.host):
            raise ScreenshotError(f"host {cfg.host} is not allowed")
        conn_cls = (http.client.HTTPSConnection if protocol == "https"
                    else http.client.HTTPConnection)
        conn = conn_cls(cfg.host, cfg.port, timeout=cfg.timeout)
        try:
            conn.request("POST", "/" + cfg.path, body=data, headers=headers)
            resp = conn.getresponse()
            status, rheaders = resp.status, dict(resp.getheaders())
            resp.read()
        except OSError as e:
            raise ScreenshotError(f"failed to save file: {e}")
        finally:
            conn.close()
    if status != 200:
        raise ScreenshotError(f"failed to save file, status code: {status}")
    location = rheaders.get("Location", "")
    if not location:
        raise ScreenshotError("location header not found")
    return location


def write_data_to_s3(filename: str, data: bytes, cfg: FileStorageAPI) -> str:
    """writeDataToToS3 (web.go:605-706): bucket = cfg.path, key = filename.
    Real SigV4 PUT via ``awsv4.S3Client`` — creds/region/endpoint from the
    standard AWS SDK env vars; fails loudly without credentials rather
    than faking a durable write."""
    from .awsv4 import S3Client, S3Error

    if not cfg.path:
        raise ScreenshotError("missing S3 bucket (saveCfg.Path)")
    client = S3Client.from_env()
    if client is None:
        raise ScreenshotError(
            "s3 storage needs AWS credentials (AWS_ACCESS_KEY_ID / "
            "AWS_SECRET_ACCESS_KEY; AWS_ENDPOINT_URL for S3-compatible "
            "stores); use type='http' or local storage")
    try:
        client.put_object(cfg.path, filename, data,
                          content_type="image/png")
    except S3Error as e:
        raise ScreenshotError(f"s3 upload failed: {e}") from e
    return f"s3://{cfg.path}/{filename}"


# ---------------------------------------------------------------------------
# deterministic fake driver over the synthetic layout (tests / local bench)


class SyntheticDriver:
    """vdi.WebDriver stand-in: rasterizes an HTML string into a page image
    (same layout rules as ScreenshotStage._render_fake) and serves
    viewport slices through the real scroll/screenshot contract. The paint
    is fake; every script string, scroll offset, slice boundary, and PNG
    byte is real."""

    def __init__(self, html: str, viewport=(120, 256), page_height=None,
                 alert_on_slice: int | None = None):
        self.viewport_h, self.viewport_w = viewport
        digest = hashlib.sha256((html or "").encode("utf-8")).digest()
        lines = [ln for ln in (html or "").splitlines() if ln.strip()][:300]
        h = page_height or max(self.viewport_h, 24 + 6 * max(len(lines), 1))
        img = np.full((h, self.viewport_w, 3), 245, np.uint8)
        img[:16] = digest[0], digest[1], digest[2]
        for i, ln in enumerate(lines):
            y = 24 + 6 * i
            if y + 3 >= h:
                break
            bar = min(self.viewport_w - 8, 4 + len(ln))
            img[y:y + 3, 4:4 + bar] = 40 + (digest[(3 + i) % 32] % 80)
        self.page = img
        self.scroll_y = 0
        self.alert_on_slice = alert_on_slice
        self.alert_pending = False
        self.shots_taken = 0
        self.scripts: list[str] = []

    def execute_script(self, script: str):
        self.scripts.append(script)
        if script == VIEWPORT_SIZE_SCRIPT:
            return [self.viewport_h, self.viewport_w]
        if script == TOTAL_HEIGHT_SCRIPT:
            return self.page.shape[0]
        if script.startswith("window.scrollTo(0, "):
            y = int(script[len("window.scrollTo(0, "):].rstrip(");"))
            # a real page can't scroll past the end
            self.scroll_y = min(y, max(0, self.page.shape[0] -
                                       self.viewport_h))
            return None
        raise ScreenshotError(f"unknown script: {script}")

    def screenshot(self) -> bytes:
        if self.alert_on_slice is not None and \
                self.shots_taken == self.alert_on_slice:
            self.alert_pending = True
            raise ScreenshotError("unexpected alert open: {Alert text: hi}")
        self.shots_taken += 1
        sl = self.page[self.scroll_y:self.scroll_y + self.viewport_h]
        if sl.shape[0] < self.viewport_h:  # browser pads to the viewport
            pad = np.full((self.viewport_h - sl.shape[0], self.viewport_w, 3),
                          245, np.uint8)
            sl = np.vstack([sl, pad])
        return png_encode(sl)

    def accept_alert(self):
        self.alert_pending = False
        self.alert_on_slice = None  # dismissed — won't reopen
