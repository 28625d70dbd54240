"""Pure-stdlib PNG codec (encode + decode) for the multimodal column path.

The container ships no PIL/opencv, so the general ``decode_image`` plug
point stays stubbed for JPEG/etc. — but PNG needs only ``zlib`` +
``struct``, both stdlib, so for PNG the decode path is REAL: chunk walk
with CRC verification, IHDR parse, IDAT concatenation, zlib inflate, and
reversal of all five scanline filters (None/Sub/Up/Average/Paeth, PNG
spec §6). The encoder exists so tests and the registered query can
synthesize deterministic payloads that exercise every filter type.

Supported subset (what we emit; the decoder validates and reports
anything else): 8-bit-depth, color types 0 (grayscale), 2 (truecolor
RGB), and 3 (indexed/palette via PLTE), progressive Adam7 interlace or
none.

Scale note: both functions are per-payload pure Python invoked from an
Arrow-batched ``mapInPandas`` — a narrow map over the binary column,
zero shuffle; at 100 TB the cost is linear scan work that parallelizes
per input split.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: Adam7 interlace passes: (x_start, y_start, x_step, y_step).
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _adam7_pass_dims(width: int, height: int):
    """Per-pass (x0, y0, dx, dy, pass_w, pass_h), empty passes included
    with zero dims (they contribute no scanlines)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        out.append((x0, y0, dx, dy, pw, ph))
    return out

_CHANNELS = {0: 1, 2: 3, 3: 1}  # color type -> samples/px (3 = palette index)

#: Decode ceiling (pixels) — 64 MPix ≈ 192 MB RGB, far above any test
#: payload but small enough that a malicious header can't OOM an executor.
_MAX_PIXELS = 64 * 1024 * 1024


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): a=left, b=up, c=upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanline(ftype: int, raw: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply filter ``ftype`` to one raw scanline (encode direction)."""
    n = len(raw)
    out = bytearray(n)
    for i in range(n):
        x = raw[i]
        a = raw[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
    return bytes(out)


def _unfilter_scanline(ftype: int, flt: bytes, prev: bytes, bpp: int) -> bytes:
    """Reverse filter ``ftype`` on one filtered scanline (decode direction)."""
    n = len(flt)
    out = bytearray(n)
    for i in range(n):
        x = flt[i]
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x + a) & 0xFF
        elif ftype == 2:
            out[i] = (x + b) & 0xFF
        elif ftype == 3:
            out[i] = (x + (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unsupported scanline filter {ftype}")
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filter_per_row=None,
    palette: bytes | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels``
    bytes) as a valid PNG. ``filter_per_row`` maps row index -> filter
    type 0..4 (default: cycle through all five so decoders must handle
    each). ``color_type=3`` takes palette INDICES as pixels plus a
    ``palette`` of packed RGB triples (PLTE chunk). ``interlace=True``
    writes the Adam7 progressive layout (7 sub-images, each filtered
    independently)."""
    if color_type == 3:
        if palette is None or len(palette) % 3 or len(palette) > 768:
            raise ValueError("palette encode needs <=256 RGB triples")
    channels = _CHANNELS[color_type]
    bpp = channels
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {stride * height}"
        )
    if filter_per_row is None:
        filter_per_row = lambda y: y % 5  # noqa: E731
    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(width, height):
            if pw == 0 or ph == 0:
                continue
            prev = bytes(pw * bpp)
            for py in range(ph):
                sy = y0 + py * dy
                row = b"".join(
                    pixels[
                        (sy * width + x0 + px * dx) * bpp
                        : (sy * width + x0 + px * dx) * bpp + bpp
                    ]
                    for px in range(pw)
                )
                ftype = filter_per_row(py)
                raw.append(ftype)
                raw += _filter_scanline(ftype, row, prev, bpp)
                prev = row
    else:
        prev = bytes(stride)
        for y in range(height):
            row = pixels[y * stride : (y + 1) * stride]
            ftype = filter_per_row(y)
            raw.append(ftype)
            raw += _filter_scanline(ftype, row, prev, bpp)
            prev = row
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    out = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += _chunk(b"PLTE", palette)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw), 6)) + _chunk(b"IEND", b"")


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG: returns ``(width, height, channels, pixels)`` with
    pixels as raw row-major bytes. Verifies chunk CRCs; raises
    ``ValueError`` on corruption or on features outside the supported
    subset (palette, interlace, 16-bit)."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = channels = -1
    color = -1
    interlaced = False
    bpp = stride = 0
    idat = bytearray()
    plte: bytes | None = None
    seen_end = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError(f"truncated {tag!r} chunk")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + data) != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = _CHANNELS[color]
            bpp = channels
            stride = width * channels
            interlaced = interlace == 1
            # (color retained for the post-unfilter palette mapping)
        elif tag == b"PLTE":
            if len(data) % 3 or len(data) > 768:
                raise ValueError("malformed PLTE chunk")
            plte = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            seen_end = True
            break
        # ancillary chunks (tEXt etc.) are skipped
    if width < 0:
        raise ValueError("missing IHDR")
    if not seen_end:
        raise ValueError("missing IEND")
    # Bound the inflate by the size the header promises: a crafted payload
    # (zlib bomb, or huge declared dims) must not allocate unbounded
    # executor memory before a post-hoc length check.
    if width * height > _MAX_PIXELS:
        raise ValueError(f"declared {width}x{height} exceeds pixel ceiling")
    if interlaced:
        expected = sum(
            ph * (1 + pw * bpp)
            for _x0, _y0, _dx, _dy, pw, ph in _adam7_pass_dims(width, height)
            if pw and ph
        )
    else:
        expected = (stride + 1) * height
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected)
    if d.unconsumed_tail or d.decompress(b"", 1):
        raise ValueError(f"inflated stream exceeds expected {expected} bytes")
    if len(raw) != expected:
        raise ValueError(
            f"inflated stream is {len(raw)} bytes, expected {expected}"
        )
    if interlaced:
        out = bytearray(stride * height)
        off = 0
        for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(width, height):
            if pw == 0 or ph == 0:
                continue
            pstride = pw * bpp
            prev = bytes(pstride)
            for py in range(ph):
                row = _unfilter_scanline(
                    raw[off], raw[off + 1 : off + 1 + pstride], prev, bpp
                )
                sy = y0 + py * dy
                for px in range(pw):
                    dst = (sy * width + x0 + px * dx) * bpp
                    out[dst : dst + bpp] = row[px * bpp : (px + 1) * bpp]
                prev = row
                off += 1 + pstride
    else:
        out = bytearray()
        prev = bytes(stride)
        for y in range(height):
            off = y * (stride + 1)
            row = _unfilter_scanline(
                raw[off], raw[off + 1 : off + 1 + stride], prev, bpp
            )
            out += row
            prev = row
    if color == 3:  # indexed: map through the palette to RGB
        if plte is None:
            raise ValueError("palette image missing PLTE chunk")
        n_entries = len(plte) // 3
        rgb = bytearray()
        for idx in out:
            if idx >= n_entries:
                raise ValueError(f"palette index {idx} out of range")
            rgb += plte[idx * 3 : idx * 3 + 3]
        return width, height, 3, bytes(rgb)
    return width, height, channels, bytes(out)


# --- deterministic synthetic payloads (shared by query + oracle) -----------
#
# The registered query synthesizes each document's PNG from doc_id alone,
# with pixel (x, y, c) = (doc_id*7 + x*3 + y*5 + c*11) % 256. The DuckDB
# oracle recomputes width/height/pixel_sum from the same closed form
# WITHOUT decoding — so a hash-match proves the decoder recovered the
# actual pixels (any unfilter/inflate bug changes pixel_sum).


def synth_dims(doc_id: int) -> tuple[int, int]:
    return (doc_id % 13) + 4, (doc_id % 7) + 3


def synth_pixels(doc_id: int, width: int, height: int) -> bytes:
    return bytes(
        (doc_id * 7 + x * 3 + y * 5 + c * 11) % 256
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )


def synth_png(doc_id: int) -> bytes:
    """Deterministic RGB PNG for one document; rows cycle through all
    five PNG filter types so decode exercises every unfilter branch."""
    w, h = synth_dims(doc_id)
    return encode_png(w, h, synth_pixels(doc_id, w, h), color_type=2,
                      filter_per_row=lambda y: (doc_id + y) % 5)
