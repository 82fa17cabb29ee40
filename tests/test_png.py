"""Pure-stdlib PNG codec: round-trip, every unfilter branch, palette
expansion, planted-oracle arithmetic, and the (now unconditional,
image-library-free) real decode path of operators.multimodal."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from ekati_spark.operators.multimodal import decode_image
from ekati_spark.operators.png import (
    PNG_SIG,
    _chunk,
    decode_png,
    encode_png,
    luminance_quadrant_means,
    planted_png,
)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(channels, filter_type):
    rng = random.Random(channels * 10 + filter_type)
    w, h = rng.randint(1, 9), rng.randint(1, 9)
    px = bytes(rng.randrange(256) for _ in range(w * h * channels))
    dw, dh, dch, dpx = decode_png(
        encode_png(w, h, px, channels, filter_type)
    )
    assert (dw, dh, dch, bytes(dpx)) == (w, h, channels, px)


def test_palette_expansion():
    # hand-built color-type-3 PNG: 2x2 indices into a 3-color palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, ch, px = decode_png(data)
    assert (w, h, ch) == (2, 2, 3)
    assert bytes(px) == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 0, 0]
    )


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        decode_png(PNG_SIG + b"junk")
    # 16-bit depth is out of scope and must fail loudly, not garble
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    data = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(data)


@pytest.mark.parametrize("doc_id", [0, 1, 6, 12, 90, 199, 499, 987654])
def test_planted_png_matches_oracle_arithmetic(doc_id):
    """decode(planted_png(i)) recovers exactly the l12 oracle formulas."""
    w, h, ch, px = decode_png(planted_png(doc_id))
    assert (w, h, ch) == (4 + doc_id % 13, 4 + doc_id % 7, 1)
    q = luminance_quadrant_means(w, h, ch, px)
    assert q == [(doc_id * 7 + 37 * i) % 256 for i in range(4)]


def test_quadrant_means_rgb_luminance():
    # 2x2 RGB: pure red/green/blue/white — ITU-R 601 integer weights
    px = bytes(
        [255, 0, 0] + [0, 255, 0] + [0, 0, 255] + [255, 255, 255]
    )
    q = luminance_quadrant_means(2, 2, 3, px)
    assert q == [
        299 * 255 // 1000,
        587 * 255 // 1000,
        114 * 255 // 1000,
        (299 * 255 + 587 * 255 + 114 * 255) // 1000,
    ]


def test_decode_image_png_unconditional():
    """The real decode runs with NO image library: PNG payloads go
    through the pure decoder and honor the 8-float feature contract."""
    feats = decode_image(planted_png(42))
    assert len(feats) == 8
    assert all(0.0 <= v <= 1.0 for v in feats)
    assert feats[0] == (4 + 42 % 13) / 4096.0
    assert feats[1] == (4 + 42 % 7) / 4096.0
    assert feats[3] == 1 / 8.0
    assert feats[4] == ((42 * 7) % 256) / 255.0


def test_extract_features_real_decode(spark):
    """fake=False end-to-end through mapInPandas with no image library;
    a corrupt payload degrades to null features, not a batch failure."""
    from ekati_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(7, planted_png(7)), (9, planted_png(9)), (1, PNG_SIG + b"junk")],
        "doc_id long, content binary",
    )
    rows = {
        r.doc_id: r.features
        for r in extract_features(df, fake=False).collect()
    }
    assert rows[1] is None
    for did in (7, 9):
        assert rows[did][0] == (4 + did % 13) / 4096.0
        assert rows[did][4] == ((did * 7) % 256) / 255.0


def test_resize_png_nearest_neighbor():
    """Deterministic index-map resample: a 2x2 quadrant image scaled to
    4x4 repeats each quadrant pixel in a 2x2 block; downscale picks the
    mapped source pixel exactly."""
    from ekati_spark.operators.png import resize_png

    px = bytes([10, 20, 30, 40])  # 2x2 grayscale
    up = decode_png(resize_png(encode_png(2, 2, px, 1), 4, 4))
    assert (up[0], up[1], up[2]) == (4, 4, 1)
    assert bytes(up[3]) == bytes(
        [10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40]
    )
    down = decode_png(resize_png(encode_png(4, 4, bytes(up[3]), 1), 2, 2))
    assert bytes(down[3]) == px


def test_resize_images_real_png(spark):
    """fake=False resize runs for real in-container on PNG payloads;
    metadata tracks the target size; corrupt PNGs degrade to null."""
    from ekati_spark.operators.multimodal import (
        resize_images,
        with_media_columns,
    )
    from ekati_spark.operators.png import resize_png

    df = with_media_columns(
        spark.createDataFrame(
            [(7, planted_png(7)), (1, PNG_SIG + b"junk")],
            "doc_id long, payload binary",
        ),
        "payload",
        mime="image/png",
    ).select("doc_id", "content", "media")
    rows = {
        r.doc_id: r for r in resize_images(df, 6, 6, fake=False).collect()
    }
    assert rows[1].content is None
    got = rows[7].content
    assert bytes(got) == resize_png(planted_png(7), 6, 6)
    w, h, ch, _ = decode_png(bytes(got))
    assert (w, h, ch) == (6, 6, 1)
    assert (rows[7].media.width, rows[7].media.height) == (6, 6)


def test_palette_index_out_of_range_raises():
    """A malformed palette index must raise, not shift-corrupt the
    output buffer (bytearray short-slice assignment inserts)."""
    plte = bytes([255, 0, 0])  # one entry; index 5 is invalid
    raw = b"\x00" + bytes([5])
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    data = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        decode_png(data)


def test_dhash_survives_reencode_resize():
    """The perceptual property: a 2x-rescaled re-encode has DIFFERENT
    bytes (md5 grouping fails) but the IDENTICAL dHash (perceptual
    grouping works) — decode-path invariance, not byte identity."""
    import hashlib

    from ekati_spark.operators.png import (
        decode_png, dhash_words, planted_png, resize_png,
    )

    for i in (0, 3, 11, 29, 41):
        img = planted_png(i)
        w0, h0, _, _ = decode_png(img)
        up = resize_png(img, w0 * 2, h0 * 2)
        assert hashlib.md5(img).digest() != hashlib.md5(up).digest()
        assert dhash_words(img) == dhash_words(up)


def test_dhash_distinguishes_distinct_gradients():
    from ekati_spark.operators.png import dhash_words, planted_png

    assert dhash_words(planted_png(1)) != dhash_words(planted_png(2))


def test_planted_png16_raises_and_telemetry_counts(spark):
    """A structurally-valid 16-bit PNG is outside the codec contract:
    decode_png raises its documented ValueError, and the decode-status
    columns classify the row instead of failing the batch."""
    import pytest as _pytest

    from ekati_spark.operators.multimodal import extract_features
    from ekati_spark.operators.png import decode_png, planted_png, planted_png16

    with _pytest.raises(ValueError, match="bit depth 16"):
        decode_png(planted_png16(3))

    rows = [(1, planted_png(1)), (2, planted_png16(2)), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r.doc_id: (r.decode_ok, r.decode_err)
        for r in extract_features(df, fake=False, with_status=True).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (False, "ValueError")
    assert got[3] == (False, "NullPayload")
