"""Multimodal decode surface — round 7 makes the image-meta codec
REAL (header parser, no PIL): these tests run genuine PNG/JPEG/BMP/GIF
bytes through the same mapInPandas plumbing the oracle-checked fake
codec uses (q42/q64/q65 keep fake_decode_meta because the parquet
fixtures carry text, not blobs)."""

import struct

import pandas as pd
import pytest

from etl_btc_spark.operators import multimodal as MM


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return b"\x89PNG\r\n\x1a\n" + ihdr + b"\x00" * 4 + b"\x00\x00\x00\x00IEND\xaeB`\x82"


def _jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _bmp(w: int, h: int) -> bytes:
    # negative height = top-down row order; parser must abs() it
    return (
        b"BM" + struct.pack("<I", 100) + b"\x00" * 4 + struct.pack("<I", 54)
        + struct.pack("<I", 40) + struct.pack("<ii", w, -h) + b"\x00" * 28
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 20


def test_decode_image_meta_real_headers():
    cases = [
        (_png(320, 240), "png", 320, 240),
        (_jpeg(640, 480), "jpeg", 640, 480),
        (_bmp(800, 600), "bmp", 800, 600),
        (_gif(12, 34), "gif", 12, 34),
    ]
    for payload, fmt, w, h in cases:
        m = MM.decode_image_meta(payload)
        assert (m["format"], m["width"], m["height"]) == (fmt, w, h)
        assert m["byte_len"] == len(payload)
        assert m["n_frames"] == 1

    # spec-legal 0xFF fill/padding bytes before a marker must not
    # desync the segment walk (review r7)
    padded = b"\xff\xd8" + b"\xff\xff\xff" + _jpeg(640, 480)[2:]
    m = MM.decode_image_meta(padded)
    assert (m["format"], m["width"], m["height"]) == ("jpeg", 640, 480)

    with pytest.raises(ValueError, match="undecodable"):
        MM.decode_image_meta(b"not an image at all")
    with pytest.raises(ValueError, match="no SOF"):
        # valid JPEG SOI + APP0 but truncated before any frame header
        MM.decode_image_meta(_jpeg(1, 1)[:10])


def test_extract_media_meta_real_bytes_through_spark(spark):
    """q42's operator with the REAL decoder over genuine image bytes:
    the mapInPandas contract (schema, Arrow batching, typed NULLs) is
    decoder-agnostic."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "payload": [
                _png(320, 240),
                _jpeg(640, 480),
                _bmp(800, 600),
                _gif(12, 34),
                b"corrupt \x00 garbage",
            ],
        }
    )
    df = spark.createDataFrame(pdf)

    ok = (
        MM.extract_media_meta(
            df.filter("doc_id < 5"), decode=MM.decode_image_meta
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.format, r.width, r.height) for r in ok] == [
        ("png", 320, 240),
        ("jpeg", 640, 480),
        ("bmp", 800, 600),
        ("gif", 12, 34),
    ]

    # per-item error-continue: the corrupt payload NULLs its meta but
    # keeps byte_len; decodable neighbors are untouched
    rows = (
        MM.extract_media_meta(df, decode=MM.decode_image_meta, on_error="null")
        .orderBy("doc_id")
        .collect()
    )
    assert len(rows) == 5
    bad = rows[4]
    assert bad.width is None and bad.format is None
    assert bad.byte_len == len(b"corrupt \x00 garbage")
    assert rows[0].width == 320

    # default stays fail-fast so the oracle path can't silently drop
    with pytest.raises(Exception):
        MM.extract_media_meta(df, decode=MM.decode_image_meta).collect()


def test_fake_codec_unchanged_for_oracle(spark):
    """The q42 oracle contract: fake_decode_meta output is pure byte
    arithmetic and must not drift when the real codec evolves."""
    m = MM.fake_decode_meta(b"x" * 100)
    assert m == {
        "byte_len": 100,
        "width": 64 + 100 % 640,
        "height": 64 + 700 % 480,
        "n_frames": 1 + 100 % 30,
        "format": "fake/1",
    }


def test_bmp_pixel_roundtrip_and_nn_resize():
    """VERDICT r7 #6 unit layer: encode→decode is the identity for
    RGB arrays (incl. odd widths that need row padding and top-down
    headers), and the NN kernel picks the pixels the standard
    center-mapping formula says it should."""
    import struct

    import numpy as np

    rng = np.random.RandomState(3)
    for w in (5, 4, 1):  # 5 → 15-byte rows pad to 16; 4 → no pad
        arr = rng.randint(0, 256, size=(3, w, 3), dtype=np.uint8)
        assert np.array_equal(MM.decode_bmp_pixels(MM.encode_bmp(arr)), arr)

    # top-down variant (negative height) decodes to the same array
    arr = rng.randint(0, 256, size=(2, 2, 3), dtype=np.uint8)
    b = bytearray(MM.encode_bmp(arr))
    stride = (2 * 3 + 3) & ~3
    body = np.zeros((2, stride), dtype=np.uint8)
    body[:, : 2 * 3] = arr[:, :, ::-1].reshape(2, 6)  # top-down BGR
    b[22:26] = struct.pack("<i", -2)
    b[54:] = body.tobytes()
    assert np.array_equal(MM.decode_bmp_pixels(bytes(b)), arr)

    # NN kernel: 4x4 gradient down to 2x2 picks centers (1,1),(1,3)...
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)[:, :, None].repeat(3, axis=2)
    small = MM.resize_pixels_nn(g, 2, 2)
    assert small[:, :, 0].tolist() == [[5, 7], [13, 15]]
    # upscale 2x2 -> 4x4 repeats each source pixel 2x2
    up = MM.resize_pixels_nn(small, 4, 4)
    assert up[:, :, 0].tolist() == [
        [5, 5, 7, 7], [5, 5, 7, 7], [13, 13, 15, 15], [13, 13, 15, 15]
    ]

    # refusals: non-BMP, 8-bit, truncated
    with pytest.raises(ValueError):
        MM.decode_bmp_pixels(b"PNG not bmp" * 10)
    b8 = bytearray(MM.encode_bmp(arr))
    b8[28:30] = struct.pack("<H", 8)
    with pytest.raises(ValueError):
        MM.decode_bmp_pixels(bytes(b8))
    with pytest.raises(ValueError):
        MM.decode_bmp_pixels(MM.encode_bmp(arr)[:-3])


def test_resize_media_real_bmp_through_spark(spark):
    """VERDICT r7 #6 end-to-end: REAL BMP bytes flow through the
    mapInPandas resize path — decode, NN-resize, re-encode — and the
    emitted md5/length match the locally computed resized image.
    The fake codec (q65's oracle contract) is untouched."""
    import hashlib

    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(9)
    imgs = {
        1: rng.randint(0, 256, size=(16, 9, 3), dtype=np.uint8),
        2: rng.randint(0, 256, size=(7, 31, 3), dtype=np.uint8),
    }
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(imgs), "payload": [MM.encode_bmp(a) for a in imgs.values()]}
        )
    )
    rows = {
        r.doc_id: r
        for r in MM.resize_media(df, width=8, height=6, codec="bmp").collect()
    }
    for did, arr in imgs.items():
        want = MM.encode_bmp(MM.resize_pixels_nn(arr, 8, 6))
        assert rows[did].resized_md5 == hashlib.md5(want).hexdigest()
        assert rows[did].resized_len == len(want)
        assert (rows[did].width, rows[did].height) == (8, 6)
    # header parser agrees with the pixel decoder on dimensions
    meta = MM.decode_image_meta(MM.encode_bmp(imgs[1]))
    assert (meta["width"], meta["height"]) == (9, 16)
