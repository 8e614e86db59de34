"""Multimodal column stages (image / audio / video as opaque binary).

The reference stores media as screenshots / downloaded web objects
(``pkg/crawler/web.go:163-517``, ``types.go:295-307``) with typed metadata.
Here media are ``binary`` columns + a MIME column; decode / feature-extract /
resize / frame-sample are actor-pool ``map_batches`` stages.

PNG and WAV are decoded/encoded for REAL via the pure-numpy codecs in
``thecrowler_ray.codecs`` (PNG needs only stdlib zlib; WAV only stdlib
``wave``). JPEG and MP4 genuinely need external codecs (PIL/ffmpeg, absent
in this container), so for those ``DecodeStage(real_codec=True)`` falls back
to the deterministic fake unless ``strict=True`` (then it raises
``NotImplementedError`` per row). The default ``real_codec=False`` keeps the
byte-derived fake for all mimes — that variant is SQL-recomputable, which is
what the ``q_media_decode`` DuckDB oracle checks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..codecs import (
    audio_feature,
    image_feature,
    png_decode,
    png_encode,
    resize_bilinear,
    wav_decode,
)
from ..content_type import media_kind

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("doc_id", pa.string()),
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
    ]
)

DECODED_FIELDS = [
    ("media_id", pa.string()),
    ("doc_id", pa.string()),
    ("mime", pa.string()),
    ("kind", pa.string()),
    ("byte_len", pa.int64()),
    ("sha256", pa.string()),
    ("width", pa.int32()),        # images/video (fake-decoded)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),  # audio/video
    ("feature", pa.list_(pa.float32(), 16)),  # unit-norm feature vector
]


class DecodeStage:
    """Actor-pool media decode / feature-extract.

    Use small ``batch_size`` (payloads are large) and
    ``batch_format='pyarrow'`` (binary columns stay zero-copy;
    pandas would box them into Python objects).
    """

    def __init__(self, real_codec: bool = False, strict: bool = False):
        self.real_codec = real_codec
        self.strict = strict

    def _decode_real(self, payload: bytes, mime: str) -> dict | None:
        """Real decode for the formats whose codecs we have (PNG, WAV).
        Returns None when the mime needs an external codec (JPEG/MP4)."""
        digest = hashlib.sha256(payload).digest()
        base = {
            "kind": media_kind(mime),
            "byte_len": len(payload),
            "sha256": digest.hex(),
            "width": 0,
            "height": 0,
            "duration_ms": 0,
        }
        if mime == "image/png":
            img = png_decode(payload)
            base.update(
                width=img.shape[1],
                height=img.shape[0],
                feature=image_feature(img).tolist(),
            )
            return base
        if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
            samples, rate = wav_decode(payload)
            base.update(
                duration_ms=int(len(samples) * 1000 / max(rate, 1)),
                feature=audio_feature(samples).tolist(),
            )
            return base
        return None

    @staticmethod
    def _decode_fake(payload: bytes, mime: str) -> dict:
        """Deterministic fake decode: metadata derived from payload bytes."""
        digest = hashlib.sha256(payload).digest()
        h64 = int.from_bytes(digest[:8], "big")
        kind = media_kind(mime)
        feat = (
            np.frombuffer(digest[:16] + digest[16:32], dtype=np.uint8)
            .astype(np.float32)
            .reshape(2, 16)
            .mean(axis=0)
        )
        norm = float(np.linalg.norm(feat)) or 1.0
        return {
            "kind": kind,
            "byte_len": len(payload),
            "sha256": digest.hex(),
            "width": 160 + h64 % 1920 if kind in ("image", "video") else 0,
            "height": 120 + (h64 >> 16) % 1080 if kind in ("image", "video") else 0,
            "duration_ms": (h64 >> 32) % 600_000 if kind in ("audio", "video") else 0,
            "feature": (feat / norm).tolist(),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name, _ in DECODED_FIELDS}
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        for i in range(len(batch)):
            d = None
            if self.real_codec:
                d = self._decode_real(payloads[i] or b"", mimes[i])
                if d is None and self.strict:
                    raise NotImplementedError(
                        f"no codec for {mimes[i]} in this container "
                        "(wire PIL/ffmpeg here on a real cluster)"
                    )
            if d is None:
                d = self._decode_fake(payloads[i] or b"", mimes[i])
            cols["media_id"].append(batch["media_id"][i].as_py())
            cols["doc_id"].append(batch["doc_id"][i].as_py())
            cols["mime"].append(mimes[i])
            for k in ("kind", "byte_len", "sha256", "width", "height",
                      "duration_ms", "feature"):
                cols[k].append(d[k])
        # id columns keep the caller's types (synth media uses strings, the
        # documents-derived path carries int64 doc_ids)
        schema = pa.schema(
            [(n, batch.schema.field(n).type) if n in ("media_id", "doc_id")
             else (n, t) for n, t in DECODED_FIELDS]
        )
        return pa.Table.from_pydict(cols, schema=schema)


def resize_plan_stage(batch: pa.Table, max_side: int = 512) -> pa.Table:
    """Pure-metadata resize planning (the real resample happens in the
    decode actor on a real cluster): target dims preserving aspect ratio."""
    import pyarrow.compute as pc

    w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
    h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
    scale = np.minimum(1.0, max_side / np.maximum(np.maximum(w, h), 1.0))
    return batch.append_column(
        "target_width", pa.array((w * scale).astype(np.int32))
    ).append_column("target_height", pa.array((h * scale).astype(np.int32)))


class ResizeStage:
    """Real image resize for PNG rows: decode → bilinear resample to at most
    ``max_side`` on the long edge (aspect preserved) → re-encode. Non-PNG
    rows pass through untouched (``resized=False``). Actor-pool stage —
    use small batches; payloads dominate block size."""

    def __init__(self, max_side: int = 128):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        out_payloads, widths, heights, resized = [], [], [], []
        for payload, mime in zip(payloads, mimes):
            payload = payload or b""
            if mime == "image/png":
                img = png_decode(payload)
                h, w = img.shape[:2]
                scale = min(1.0, self.max_side / max(h, w, 1))
                if scale < 1.0:
                    img = resize_bilinear(
                        img, max(1, int(w * scale)), max(1, int(h * scale))
                    )
                    payload = png_encode(img)
                out_payloads.append(payload)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                resized.append(scale < 1.0)
            else:
                out_payloads.append(payload)
                widths.append(0)
                heights.append(0)
                resized.append(False)
        cols = {n: batch[n] for n in batch.column_names if n != "payload"}
        cols["payload"] = pa.array(out_payloads, pa.large_binary())
        cols["width"] = pa.array(widths, pa.int32())
        cols["height"] = pa.array(heights, pa.int32())
        cols["resized"] = pa.array(resized, pa.bool_())
        return pa.table(cols)


def frame_sample_plan(batch: pa.Table, fps: float = 1.0) -> pa.Table:
    """Frame-sampling plan for video rows: list of timestamps (ms)."""
    durs = batch["duration_ms"].to_pylist()
    kinds = batch["kind"].to_pylist()
    stamps = [
        list(range(0, d, int(1000 / fps))) if k == "video" and d > 0 else []
        for d, k in zip(durs, kinds)
    ]
    return batch.append_column(
        "frame_ts_ms", pa.array(stamps, pa.list_(pa.int64()))
    )


_DOC_MIMES = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]


def media_from_documents(batch: pa.Table) -> pa.Table:
    """documents rows → media rows: payload = the document's UTF-8 text
    bytes, mime round-robin by ``doc_id % 4``. Deterministic and
    SQL-recomputable (sha256/byte-length arithmetic), which lets the
    multimodal decode pipeline run under the DuckDB oracle gate while
    exercising the exact binary-column plumbing a real media corpus uses."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "media_id": pa.array([f"m{d}" for d in doc_ids], pa.string()),
            "doc_id": batch["doc_id"],
            "mime": pa.array([_DOC_MIMES[int(d) % 4] for d in doc_ids], pa.string()),
            "payload": pa.array([(t or "").encode("utf-8") for t in texts],
                                pa.large_binary()),
        }
    )


class ScreenshotStage:
    """Screenshot capture + storage plumbing (reference
    ``pkg/crawler/web.go:163-517``: viewport-slice stitch → PNG → store to
    file/HTTP/S3 under a deterministic name, recording path/size on the
    page). The PNG encoder needs a browser+codec, so the payload here is a
    deterministic fake (PNG magic + sha256-derived bytes sized by the page);
    everything storage-side — per-actor output dir, url-hash naming, real
    file writes, the (url, path, byte_len, sha256) record — is real. Swap
    ``_render_fake`` for the browser screenshot hook on a live cluster."""

    MAGIC = b"\x89PNG\r\n\x1a\n"
    WIDTH = 256

    def __init__(self, out_dir: str, url_col: str = "url",
                 html_col: str = "html"):
        import os

        self.out_dir = out_dir
        self.url_col = url_col
        self.html_col = html_col
        os.makedirs(out_dir, exist_ok=True)

    def _render_fake(self, html: str) -> bytes:
        """Deterministic page rasterization → REAL PNG bytes (the codec is
        ours, `codecs.png_encode`; only the *browser paint* is faked): a
        title band colored from the content hash, then one text band per
        line with width ∝ line length. Height scales with content like a
        real full-page screenshot stitch (``web.go:163-517``)."""
        lines = [ln for ln in (html or "").splitlines() if ln.strip()][:120]
        digest = hashlib.sha256((html or "").encode("utf-8")).digest()
        h = 24 + 4 * max(len(lines), 1)
        img = np.full((h, self.WIDTH, 3), 245, np.uint8)
        img[:16] = digest[0], digest[1], digest[2]  # title band
        for i, ln in enumerate(lines):
            y = 24 + 4 * i
            bar = min(self.WIDTH - 8, 4 + len(ln))
            shade = 40 + (digest[(3 + i) % 32] % 80)
            img[y : y + 3, 4 : 4 + bar] = shade
        return png_encode(img)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os

        urls = batch[self.url_col].to_pylist()
        htmls = batch[self.html_col].to_pylist()
        paths, sizes, hashes = [], [], []
        for u, h in zip(urls, htmls):
            name = hashlib.sha1((u or "").encode("utf-8")).hexdigest()
            path = os.path.join(self.out_dir, f"{name}.png")
            payload = self._render_fake(h or "")
            with open(path, "wb") as f:
                f.write(payload)
            paths.append(path)
            sizes.append(len(payload))
            hashes.append(hashlib.sha256(payload).hexdigest())
        return pa.table(
            {
                "url": batch[self.url_col],
                "screenshot_path": pa.array(paths, pa.string()),
                "byte_len": pa.array(sizes, pa.int64()),
                "sha256": pa.array(hashes, pa.string()),
            }
        )


def synth_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic synthetic media rows for tests/benches."""
    rng = np.random.default_rng(seed)
    mimes = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]
    rows = {name: [] for name, _ in zip(MEDIA_SCHEMA.names, MEDIA_SCHEMA.types)}
    for i in range(n):
        mime = mimes[i % len(mimes)]
        payload = rng.integers(0, 256, size=64 + (i % 512), dtype=np.uint8).tobytes()
        rows["media_id"].append(f"m{seed}-{i}")
        rows["doc_id"].append(f"d{i % max(1, n // 4)}")
        rows["mime"].append(mime)
        rows["payload"].append(payload)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
