"""Real image decode: a self-contained Windows BMP (DIB) codec.

BMP rounds out the image-format surface (PNG, JPEG, GIF already decode
natively): the uncompressed 24-bit BI_RGB form with its two traps —
pixel rows stored BOTTOM-UP in BGR byte order, and every row padded to
a 4-byte boundary. The decoder also accepts the top-down variant
(negative biHeight), validates plane/bpp/compression fields, and
bounds-checks every slice (ValueError on truncation, same defensive
discipline as the other codecs).

Synthesis closed form (what the DuckDB oracle replays per pixel):

- ``width  = 8 + (doc_id % 9)``   (widths 8..16 — several row paddings)
- ``height = 6 + (doc_id % 7)``
- ``r = (doc_id + 7x + 13y) % 256``
- ``g = (3*doc_id + 5x + 11y) % 256``
- ``b = (9*doc_id + 2x + 3y) % 256``

The decode features (per-channel pixel sums) only match the closed form
if the decoder undid the bottom-up row order, the BGR ordering, AND the
row padding — a shifted/flipped read changes the sums.

At 100 TB: opaque ``binary`` column + Arrow-batched ``mapInPandas``
decode, zero shuffle; swap in a SIMD codec at the same plug point as
the other formats when pixel volume dominates.
"""

from __future__ import annotations

import struct

_FILE_HDR = 14  # BITMAPFILEHEADER
_INFO_HDR = 40  # BITMAPINFOHEADER


def synth_dims(doc_id: int) -> tuple[int, int]:
    return 8 + (doc_id % 9), 6 + (doc_id % 7)


def synth_pixel(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Closed-form RGB for (x, y), y counted TOP-DOWN."""
    return (
        (doc_id + 7 * x + 13 * y) % 256,
        (3 * doc_id + 5 * x + 11 * y) % 256,
        (9 * doc_id + 2 * x + 3 * y) % 256,
    )


def encode_bmp(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Encode top-down row-major RGB ``pixels`` as a standard bottom-up
    24-bit BI_RGB BMP with 4-byte row padding."""
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        for x in range(width):
            r, g, b = pixels[y * width + x]
            body += bytes((b, g, r))  # BGR on disk
        body += pad
    pixel_off = _FILE_HDR + _INFO_HDR
    info = struct.pack(
        "<IiiHHIIiiII",
        _INFO_HDR, width, height, 1, 24, 0,  # BI_RGB
        len(body), 2835, 2835, 0, 0,
    )
    file_hdr = struct.pack(
        "<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off
    )
    return file_hdr + info + body


def synth_bmp(doc_id: int) -> bytes:
    w, h = synth_dims(doc_id)
    return encode_bmp(
        w, h, [synth_pixel(doc_id, x, y) for y in range(h) for x in range(w)]
    )


def decode_bmp(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode a 24-bit BI_RGB BMP -> (width, height, top-down RGB rows).

    Handles bottom-up (positive height) and top-down (negative height)
    storage, BGR order, and row padding; rejects other bit depths,
    compressed variants, and truncated payloads with ``ValueError``.
    """
    if len(payload) < _FILE_HDR + _INFO_HDR or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _sig, _fsize, _r1, _r2, pixel_off = struct.unpack_from("<2sIHHI", payload, 0)
    (
        hdr_size, width, height_raw, planes, bpp, compression,
        _img_size, _xppm, _yppm, _clr_used, _clr_imp,
    ) = struct.unpack_from("<IiiHHIIiiII", payload, _FILE_HDR)
    if hdr_size < _INFO_HDR:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1:
        raise ValueError(f"invalid plane count {planes}")
    if bpp != 24:
        raise ValueError(f"unsupported bit depth {bpp}")
    if compression != 0:
        raise ValueError(f"unsupported compression {compression}")
    if width <= 0 or height_raw == 0:
        raise ValueError(f"invalid dimensions {width}x{height_raw}")
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    row_stride = (width * 3 + 3) & ~3
    if pixel_off + row_stride * height > len(payload):
        raise ValueError("truncated BMP pixel data")

    pixels: list[tuple[int, int, int]] = []
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        base = pixel_off + src_row * row_stride
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            pixels.append((r, g, b))
    return width, height, pixels
