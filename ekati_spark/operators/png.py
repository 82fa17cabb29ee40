"""Pure-stdlib PNG codec (zlib + struct) for the multimodal decode seam.

The reference treats media payloads as opaque typed blobs
(``/root/reference`` stores values as bytes with a type tag); the decode
step itself has no reference analog, so this implements the standard
PNG format (RFC 2083) directly: enough of a decoder to recover
dimensions, channels, and pixels from real PNG bytes without any image
library, and an encoder to produce valid PNGs for fixtures and planted
round-trip oracles.

Scope (documented, asserted loudly): 8-bit samples, color types
0/2/3/4/6, all five scanline filters, no interlacing. That covers every
PNG this pipeline synthesizes and the overwhelming share of real-world
PNGs; exotic shapes (16-bit, Adam7) raise ``ValueError`` and the caller
maps the row to null features rather than failing the Arrow batch.

Scale note: decode runs inside ``mapInPandas`` workers, per-row
independent — throughput scales linearly with partitions and the pure
loop is only the per-image unfilter pass (O(bytes)); a deployment with
Pillow/cv2 swaps the fast path in `multimodal._pil` without touching
the Spark plumbing.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse per-scanline filtering (PNG spec §6): returns packed pixel
    bytes, ``height`` rows of ``width * bpp`` bytes."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        prev_off = (y - 1) * stride
        off = y * stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if y > 0:
                for x in range(stride):
                    line[x] = (line[x] + out[prev_off + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                up = out[prev_off + x] if y > 0 else 0
                line[x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                up = out[prev_off + x] if y > 0 else 0
                ul = out[prev_off + x - bpp] if (y > 0 and x >= bpp) else 0
                line[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[off : off + stride] = line
    return out


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode PNG bytes -> (width, height, channels, pixels).

    ``pixels`` is row-major packed bytes, ``channels`` samples per pixel
    (palette images are expanded to RGB, channels=3).
    """
    if not data or not data.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIG)
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        body = data[pos : pos + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        pos += length + 4  # skip CRC (payload integrity, not semantics)
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, _comp, _filt,
             interlace) = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    bpp = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expect = height * (1 + width * bpp)
    if len(raw) != expect:
        raise ValueError(f"PNG data length {len(raw)} != expected {expect}")
    pixels = _unfilter(raw, width, height, bpp)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = bytearray(width * height * 3)
        n_entries = len(palette) // 3
        for i, idx in enumerate(pixels):
            # bounds-check explicitly: a short slice assigned into a
            # bytearray SHIFTS the buffer (insert semantics) instead of
            # failing — a malformed index must raise, not corrupt
            if idx >= n_entries:
                raise ValueError(
                    f"palette index {idx} out of range ({n_entries} entries)"
                )
            rgb[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
        return width, height, 3, rgb
    return width, height, bpp, pixels


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    filter_type: int = 0,
) -> bytes:
    """Encode packed 8-bit pixels into a valid PNG.

    ``filter_type`` applies one filter to every scanline (0 for normal
    use; 1-4 exist so tests can exercise every decoder unfilter branch
    against a known image).
    """
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer does not match dimensions")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += line
        elif filter_type == 1:
            raw += bytes(
                (line[x] - (line[x - channels] if x >= channels else 0))
                & 0xFF
                for x in range(stride)
            )
        elif filter_type == 2:
            raw += bytes((line[x] - prev[x]) & 0xFF for x in range(stride))
        elif filter_type == 3:
            raw += bytes(
                (line[x]
                 - (((line[x - channels] if x >= channels else 0) + prev[x])
                    >> 1)) & 0xFF
                for x in range(stride)
            )
        elif filter_type == 4:
            raw += bytes(
                (line[x]
                 - _paeth(
                     line[x - channels] if x >= channels else 0,
                     prev[x],
                     prev[x - channels] if x >= channels else 0,
                 )) & 0xFF
                for x in range(stride)
            )
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def planted_png(doc_id: int) -> bytes:
    """Deterministic grayscale fixture PNG for round-trip oracles.

    Dimensions and the four quadrant constants are pure arithmetic on
    ``doc_id``, so a SQL oracle can predict exactly what a correct
    decode recovers (queries/llm.py::l12). Quadrants split at h//2 and
    w//2 (top-left quadrant is [0,h//2) x [0,w//2), etc.).
    """
    w = 4 + (doc_id % 13)
    h = 4 + (doc_id % 7)
    q = [(doc_id * 7 + 37 * i) % 256 for i in range(4)]
    px = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            qi = (2 if y >= h // 2 else 0) + (1 if x >= w // 2 else 0)
            px[y * w + x] = q[qi]
    return encode_png(w, h, bytes(px), channels=1)


def planted_frame_png(key: int, frame_s: int) -> bytes:
    """Deterministic 9x8 grayscale VIDEO-FRAME fixture: pixel row ``y``
    is the first 9 bytes of ``md5("vf:<key>:<frame_s>:<y>")``, so the
    image carries full-entropy content per (content stream, second) —
    ``dhash_words`` of it is a genuinely distinct 64-bit perceptual
    hash (a smooth arithmetic gradient would collapse the hash space
    to a few hundred values and drown near-dup detection in spurious
    collisions). 9x8 exactly matches the dHash sample grid, so the
    nearest-neighbor resample is the identity and a SQL oracle can
    replay each gradient bit directly from the md5 hex (queries/llm.py
    ::l99). Real bytes end-to-end: encode_png here, zlib inflate +
    unfilter in the decode."""
    px = bytearray(9 * 8)
    for y in range(8):
        row = hashlib.md5(f"vf:{key}:{frame_s}:{y}".encode()).digest()
        px[y * 9 : (y + 1) * 9] = row[:9]
    return encode_png(9, 8, bytes(px), channels=1)


def planted_png16(doc_id: int) -> bytes:
    """Deterministic 16-bit-depth PNG fixture: structurally valid
    (signature, IHDR, IDAT, IEND, correct CRCs) but outside the
    codec's 8-bit contract, so ``decode_png`` raises its documented
    ``ValueError: unsupported PNG bit depth 16`` — the planted
    "exotic format" row for decode-coverage telemetry (l69)."""
    w = 2 + (doc_id % 3)
    h = 2
    # 16-bit grayscale scanlines: filter byte + 2 bytes per pixel
    stride = w * 2
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        for x in range(w):
            v = (doc_id * 257 + y * w + x) % 65536
            raw += struct.pack(">H", v)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def resize_png(data: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of a PNG, pure stdlib: decode → index-map
    resample (src index = (dst * src_size) // dst_size, pure integer
    arithmetic, deterministic everywhere) → re-encode. Palette images
    come back expanded (RGB), matching ``decode_png``."""
    w0, h0, ch, px = decode_png(data)
    out = bytearray(width * height * ch)
    for y in range(height):
        sy = (y * h0) // height
        src_row = sy * w0 * ch
        dst_row = y * width * ch
        for x in range(width):
            sx = (x * w0) // width
            s = src_row + sx * ch
            d = dst_row + x * ch
            out[d : d + ch] = px[s : s + ch]
    return encode_png(width, height, bytes(out), channels=ch)


def luminance_quadrant_means(
    width: int, height: int, channels: int, pixels: bytes
) -> list[float]:
    """Mean luminance of the four image quadrants, each in [0, 255].

    Luminance uses the ITU-R 601 integer weights Pillow's ``convert("L")``
    applies ((299 R + 587 G + 114 B) // 1000); grayscale/gray+alpha use
    the gray sample, alpha is ignored. Quadrant boundaries are the
    half-open splits at width//2 / height//2 (deterministic for odd
    sizes), NOT a resampling kernel — this is the canonical definition
    for the pure-decode path and is exactly replayable in SQL.
    """
    sums = [0, 0, 0, 0]
    counts = [0, 0, 0, 0]
    stride = width * channels
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        for x in range(width):
            o = x * channels
            if channels >= 3:
                lum = (
                    299 * row[o] + 587 * row[o + 1] + 114 * row[o + 2]
                ) // 1000
            else:
                lum = row[o]
            qi = (2 if y >= height // 2 else 0) + (1 if x >= width // 2 else 0)
            sums[qi] += lum
            counts[qi] += 1
    return [s / c if c else 0.0 for s, c in zip(sums, counts)]


def dhash_words(data: bytes) -> tuple[int, int]:
    """Perceptual difference-hash (dHash) of a PNG, pure stdlib: decode,
    nearest-neighbor-sample a 9x8 luminance grid (src index =
    (dst * src) // dst — the same integer resample as ``resize_png``),
    then 64 horizontal-gradient bits (bit set iff left < right
    neighbor). Returned as two exact uint32 words (rows 0-3 -> hi,
    rows 4-7 -> lo; row byte = sum of bit << x) so engines without
    unsigned 64-bit types can replay the value exactly. Near-identical
    images (rescales, mild noise) agree on most bits; identical images
    agree on all — grouping by (hi, lo) is the perceptual-exact bucket,
    and banding the four row-byte pairs gives a hamming-tolerant
    blocking key (the simhash trick)."""
    w0, h0, ch, px = decode_png(data)
    stride = w0 * ch

    def lum(sx: int, sy: int) -> int:
        o = sy * stride + sx * ch
        if ch >= 3:
            return (299 * px[o] + 587 * px[o + 1] + 114 * px[o + 2]) // 1000
        return px[o]

    hi = lo = 0
    for y in range(8):
        sy = (y * h0) // 8
        row = 0
        for x in range(8):
            if lum((x * w0) // 9, sy) < lum(((x + 1) * w0) // 9, sy):
                row |= 1 << x
        if y < 4:
            hi |= row << (8 * y)
        else:
            lo |= row << (8 * (y - 4))
    return hi, lo
