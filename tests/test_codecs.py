"""Real media codecs: PNG encode/decode (pure numpy+zlib), WAV, resize,
and their integration into the multimodal stages."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray

from thecrowler_ray.codecs import (
    PNG_MAGIC,
    audio_feature,
    image_feature,
    png_decode,
    png_encode,
    png_info,
    resize_bilinear,
    resize_nearest,
    wav_decode,
    wav_encode,
)


def _rand_img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize(
    "shape",
    [(13, 17), (13, 17, 1), (8, 5, 2), (20, 31, 3), (7, 7, 4), (1, 1, 3)],
)
def test_png_roundtrip(shape):
    img = _rand_img(shape, seed=sum(shape))
    data = png_encode(img)
    assert data.startswith(PNG_MAGIC)
    out = png_decode(data)
    want = img[:, :, 0] if img.ndim == 3 and img.shape[2] == 1 else img
    np.testing.assert_array_equal(out, want)
    w, h, c = png_info(data)
    assert (h, w) == shape[:2]
    assert c == (1 if len(shape) == 2 else max(shape[2], 1))


def _filter_rows(img, ftype):
    """Reference scalar PNG scanline filter (the encoder side of the spec),
    used to build test vectors for every filter type."""
    h, stride = img.shape
    bpp = 1
    out = bytearray()
    for y in range(h):
        out.append(ftype)
        for x in range(stride):
            raw = int(img[y, x])
            a = int(img[y, x - bpp]) if x >= bpp else 0
            b = int(img[y - 1, x]) if y else 0
            c = int(img[y - 1, x - bpp]) if y and x >= bpp else 0
            if ftype == 0:
                out.append(raw)
            elif ftype == 1:
                out.append((raw - a) & 0xFF)
            elif ftype == 2:
                out.append((raw - b) & 0xFF)
            elif ftype == 3:
                out.append((raw - ((a + b) >> 1)) & 0xFF)
            elif ftype == 4:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                out.append((raw - pred) & 0xFF)
    return bytes(out)


def _chunk(tag, body):
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filters(ftype):
    img = _rand_img((9, 14), seed=ftype)
    ihdr = struct.pack(">IIBBBBB", 14, 9, 8, 0, 0, 0, 0)
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_filter_rows(img, ftype)))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(png_decode(data), img)


def test_png_palette_decode():
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"\x00" + bytes(idx[0]) + b"\x00" + bytes(idx[1])
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = png_decode(data)
    assert out.shape == (2, 2, 3)
    np.testing.assert_array_equal(out[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(out[1, 0], [0, 0, 255])


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_resize():
    img = _rand_img((64, 48, 3))
    nn = resize_nearest(img, 24, 32)
    assert nn.shape == (32, 24, 3)
    bl = resize_bilinear(img, 24, 32)
    assert bl.shape == (32, 24, 3)
    # identity-size bilinear is exact
    np.testing.assert_array_equal(resize_bilinear(img, 48, 64), img)
    # grayscale keeps 2-D shape
    assert resize_bilinear(img[:, :, 0], 24, 32).shape == (32, 24)


def test_wav_roundtrip_and_features():
    t = np.arange(1600)
    mono = (np.sin(t / 10.0) * 10000).astype(np.int16)
    data = wav_encode(mono, rate=16_000)
    out, rate = wav_decode(data)
    np.testing.assert_array_equal(out, mono)
    assert rate == 16_000
    stereo = np.stack([mono, mono // 2], axis=1)
    out2, _ = wav_decode(wav_encode(stereo))
    np.testing.assert_array_equal(out2, stereo)
    feat = audio_feature(mono)
    assert feat.shape == (16,)
    assert np.linalg.norm(feat) == pytest.approx(1.0, rel=1e-5)
    assert image_feature(_rand_img((10, 10, 3))).shape == (16,)


@pytest.mark.usefixtures("ray_session")
def test_decode_stage_real_codecs():
    """real_codec=True decodes PNG and WAV for real; a CORRUPT jpeg
    payload degrades to the deterministic fake in non-strict mode (one
    truncated file must not kill a crawl-scale decode stage)."""
    from thecrowler_ray.stages.multimodal import DecodeStage

    img = _rand_img((12, 20, 3), seed=3)
    tone = (np.sin(np.arange(8000) / 7.0) * 9000).astype(np.int16)
    wav = wav_encode(tone, rate=16_000)
    media = pa.table(
        {
            "media_id": ["p1", "a1", "j1"],
            "doc_id": ["d1", "d2", "d3"],
            "mime": ["image/png", "audio/wav", "image/jpeg"],
            "payload": [png_encode(img), wav, b"\xff\xd8\xff\xe0 not-decodable"],
        }
    )
    out = (
        ray.data.from_arrow(media)
        .map_batches(
            DecodeStage,
            fn_constructor_kwargs={"real_codec": True},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .set_index("media_id")
    )
    assert out.loc["p1", "width"] == 20 and out.loc["p1", "height"] == 12
    assert out.loc["a1", "duration_ms"] == 500
    assert out.loc["a1", "width"] == 0
    # truncated jpeg got the byte-derived fake, still kind=image
    assert out.loc["j1", "kind"] == "image"
    feats = np.stack(out.feature.to_numpy())
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)


@pytest.mark.usefixtures("ray_session")
def test_resize_stage_real():
    from thecrowler_ray.stages.multimodal import ResizeStage

    big = _rand_img((200, 100, 3), seed=9)
    small = _rand_img((30, 40, 3), seed=10)
    media = pa.table(
        {
            "media_id": ["big", "small", "aud"],
            "mime": ["image/png", "image/png", "audio/wav"],
            "payload": [
                png_encode(big),
                png_encode(small),
                wav_encode(np.zeros(100, np.int16)),
            ],
        }
    )
    out = (
        ray.data.from_arrow(media)
        .map_batches(
            ResizeStage,
            fn_constructor_kwargs={"max_side": 64},
            batch_format="pyarrow",
            batch_size=2,
            concurrency=1,
        )
        .to_pandas()
        .set_index("media_id")
    )
    assert out.loc["big", "resized"]
    assert out.loc["big", "height"] == 64 and out.loc["big", "width"] == 32
    got = png_decode(out.loc["big", "payload"])  # re-encoded payload decodes
    assert got.shape == (64, 32, 3)
    assert not out.loc["small", "resized"]
    np.testing.assert_array_equal(png_decode(out.loc["small", "payload"]), small)
    assert not out.loc["aud", "resized"]


def test_screenshot_render_is_real_png(tmp_path):
    from thecrowler_ray.stages.multimodal import ScreenshotStage

    st = ScreenshotStage(str(tmp_path))
    html = "<html><body>\n" + "\n".join(
        f"<p>row {i} of content</p>" for i in range(40)) + "\n</body></html>"
    out = st(pa.table({"url": ["http://a.test/p"], "html": [html]}))
    payload = open(out["screenshot_path"][0].as_py(), "rb").read()
    img = png_decode(payload)
    assert img.shape[1] == ScreenshotStage.WIDTH
    # page spans >1 viewport: the scroll-stitch path really ran
    assert img.shape[0] == out["height"][0].as_py() > st.VIEWPORT_H
    assert out["byte_len"][0].as_py() == len(payload)
    # deterministic
    out2 = st(pa.table({"url": ["http://a.test/p"], "html": [html]}))
    assert out2["sha256"][0].as_py() == out["sha256"][0].as_py()
    out3 = st(pa.table({"url": ["http://a.test/q"],
                        "html": [html + "<p>x</p>"]}))
    assert out3["sha256"][0].as_py() != out["sha256"][0].as_py()
