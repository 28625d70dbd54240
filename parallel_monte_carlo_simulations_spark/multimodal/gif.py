"""Real multi-frame video-ish decode: a self-contained GIF87a/89a codec.

Completes the multimodal codec set (PNG + baseline/color JPEG images,
RIFF/WAVE audio) with an animated-container leg: GIF is the one
multi-frame format implementable stdlib-only, and it turns the video
frame-sampling surface from a schedule computation into an EXECUTED
decode path — the registered query synthesizes an animated GIF per
video-typed document, walks the container, LZW-decompresses every
frame, and samples frames at a stride, with a DuckDB oracle that
recomputes each sampled frame's pixel checksum from the synthesis
closed form without decoding.

The codec is spec-faithful where the synthesizer exercises it:

- logical screen descriptor + 256-entry global color table;
- per-frame Graphic Control Extension (delay parsed, not skipped);
- image descriptors with data sub-block chains;
- GIF-LZW proper: variable code width starting at ``min_code + 1``,
  LSB-first bit packing, CLEAR/EOI codes, the ``code == next`` self-
  referential case, width growth at ``next == 2**width`` (decoder) /
  ``next == 2**width + 1`` (encoder — the one-code lag exists because
  the decoder's first post-clear read adds no table entry), dictionary
  reset at 4096.

Unsupported corners (interlace, local color tables, transparency
compositing) raise ``ValueError`` — bounds-checked like the PNG/WAV
decoders, never a raw struct/index error.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_CODE = 1 << 12


class _BitReader:
    """LSB-first bit reader over the concatenated image data stream."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        end = self.pos + width
        if end > len(self.data) * 8:
            raise ValueError("truncated LZW stream")
        out = 0
        for k in range(width):
            bit_idx = self.pos + k
            if (self.data[bit_idx >> 3] >> (bit_idx & 7)) & 1:
                out |= 1 << k
        self.pos = end
        return out


class _BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.bytes)


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    w = _BitWriter()
    width = min_code + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    nxt = eoi + 1
    w.write(clear, width)
    buf = b""
    for px in indices:
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        w.write(table[buf], width)
        table[cand] = nxt
        nxt += 1
        # Encoder widens one code LATER than the decoder's next==2**width
        # rule: the decoder's first post-clear code adds no entry.
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt == _MAX_CODE:
            w.write(clear, width)
            table = {bytes([i]): i for i in range(1 << min_code)}
            nxt = eoi + 1
            width = min_code + 1
        buf = bytes([px])
    if buf:
        w.write(table[buf], width)
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
    w.write(eoi, width)
    return w.flush()


def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    r = _BitReader(data)
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = r.read(width)
        if code == clear:
            table = table[: (1 << min_code) + 2]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("LZW output exceeds frame size")
    if len(out) != n_expected:
        raise ValueError(f"LZW output {len(out)} != expected {n_expected}")
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    delays_cs: list[int] | None = None,
    min_code: int = 8,
) -> bytes:
    """Encode 8-bit-indexed ``frames`` (grayscale identity palette) into
    an animated GIF89a payload."""
    if delays_cs is None:
        delays_cs = [4] * len(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # GCT present, 8-bit, 256 entries
    for i in range(256):
        out += bytes([i, i, i])  # identity grayscale palette
    for frame, delay in zip(frames, delays_cs):
        if len(frame) != width * height:
            raise ValueError("frame size mismatch")
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(frame, min_code))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Decode a GIF payload -> ``(width, height, [(delay_cs, indices)])``.

    ``indices`` are the 8-bit palette indices of each full frame; with
    the identity grayscale palette the index IS the gray value. Every
    read is bounds-checked; malformed payloads raise ``ValueError``.
    """
    if len(payload) < 13 or payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    width, height = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if packed & 0x80:  # global color table
        gct_len = 3 * (2 << (packed & 0x07))
        if pos + gct_len > len(payload):
            raise ValueError("truncated global color table")
        pos += gct_len
    frames: list[tuple[int, bytes]] = []
    delay = 0
    while True:
        if pos >= len(payload):
            raise ValueError("missing GIF trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension: parse delay
                if pos + 6 > len(payload) or payload[pos] != 4:
                    raise ValueError("malformed GCE")
                delay = struct.unpack_from("<H", payload, pos + 2)[0]
                pos += 6
            else:  # skip other extensions' sub-blocks
                while True:
                    if pos >= len(payload):
                        raise ValueError("truncated extension sub-blocks")
                    n = payload[pos]
                    pos += 1 + n
                    if n == 0:
                        break
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("truncated image descriptor")
            left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos)
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:
                raise ValueError("local color tables unsupported")
            if ipacked & 0x40:
                raise ValueError("interlaced frames unsupported")
            if (left, top, fw, fh) != (0, 0, width, height):
                raise ValueError("partial-canvas frames unsupported")
            if pos >= len(payload):
                raise ValueError("truncated LZW header")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError(f"bad LZW min code size {min_code}")
            data = bytearray()
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated image sub-blocks")
                n = payload[pos]
                if pos + 1 + n > len(payload):
                    raise ValueError("truncated image sub-block")
                data += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
                if n == 0:
                    break
            frames.append((delay, _lzw_decode(bytes(data), min_code, fw * fh)))
            delay = 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return width, height, frames


# --- deterministic synthesis (the closed form the oracle replays) ------

def synth_dims(doc_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) for the synthetic animation."""
    return 4 + doc_id % 9, 3 + doc_id % 5, 2 + doc_id % 4


def synth_gif(doc_id: int) -> bytes:
    w, h, n = synth_dims(doc_id)
    frames = [
        bytes(
            (doc_id * 7 + f * 13 + x * 3 + y * 5) % 256
            for y in range(h)
            for x in range(w)
        )
        for f in range(n)
    ]
    return encode_gif(w, h, frames, delays_cs=[4 + f for f in range(n)])
