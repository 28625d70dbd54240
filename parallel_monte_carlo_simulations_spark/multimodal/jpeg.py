"""Baseline JPEG (ITU T.81) grayscale codec — stdlib + numpy only.

A real, self-contained implementation of the baseline sequential DCT
process for single-component (grayscale) 8-bit images: marker segment
parsing (SOI/DQT/SOF0/DHT/SOS/EOI, APPn/COM skipped), canonical Huffman
tables decoded from DHT, entropy-coded scan with byte unstuffing, DC
prediction with signed magnitude categories, AC run-length (EOB/ZRL)
coding, dequantization, inverse zigzag, and a float IDCT — plus the
matching encoder used to synthesize deterministic test payloads.

Scope (enforced, clear errors outside it): baseline DCT, 8-bit,
one component, no restart markers, no progressive/arithmetic coding.
That subset is decoded for REAL — there is no library call anywhere.

The embedded Huffman tables are canonical fixed-length code sets (12
DC symbols at 4 bits, 256 AC symbols at 8-9 bits): valid JPEG prefix
codes (the all-ones code is never assigned), chosen over the spec's
Annex K defaults because the payloads are synthetic — compression
ratio is irrelevant, table-transcription bugs are not.

Exactness: with an all-ones quantization table, a block whose pixels
are constant has a single integer DCT coefficient (DC = 8·(c−128));
round-tripping is bit-exact, so decoded pixel sums can be verified
against a closed form computed WITHOUT decoding (the DuckDB oracle of
``q_multimodal_jpeg_decode``). The AC path (runs, ZRL, EOB, magnitude
categories) is exercised by tests against an independent numpy
reference of the dequantize→IDCT pipeline.
"""

from __future__ import annotations

import struct

import numpy as np

SOI, EOI, SOS, DQT, DHT, SOF0 = 0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xC0

#: Decode ceiling (pixels) — same rationale as png._MAX_PIXELS: a
#: malicious header must not allocate unbounded executor memory.
_MAX_PIXELS = 64 * 1024 * 1024


def _build_zigzag() -> list[tuple[int, int]]:
    """(row, col) visit order of the standard zigzag scan, derived
    programmatically (anti-diagonals, alternating direction)."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(s - j, j) for j in range(s + 1) if s - j < 8 and j < 8]
        if s % 2 == 1:
            diag.reverse()  # odd diagonals run top-right -> bottom-left
        order.extend(diag)
    return order


ZIGZAG = _build_zigzag()

# Orthonormal 8-point DCT-II matrix; F = M @ B @ M.T matches the JPEG
# FDCT definition (constant block c -> DC = 8c, all AC = 0).
_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _M[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(1 / 8) if _u == 0 else 0.5
        )

# Canonical Huffman tables: BITS[i] = #codes of length i+1, then the
# symbol list in code order.
_DC_BITS = [0, 0, 0, 12] + [0] * 12          # 12 symbols, 4 bits each
_DC_SYMS = list(range(12))                    # categories 0..11
_AC_BITS = [0] * 7 + [128, 128] + [0] * 7     # 256 symbols at 8-9 bits
_AC_SYMS = list(range(256))                   # all (run<<4)|size bytes


def _canonical_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[syms[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated marker in scan")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:  # unstuff FF00 -> FF; anything else ends us
                    raise ValueError(f"unexpected marker 0xFF{marker:02X} in scan")
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, size: int) -> int:
    """Signed magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def encode_jpeg(pixels: bytes, width: int, height: int) -> bytes:
    """Encode 8-bit grayscale row-major ``pixels`` as a baseline JPEG.

    Dimensions must be multiples of 8 (the synthetic-payload case; real
    encoders pad partial blocks). Quantization is the all-ones table, so
    integer-valued DCT blocks round-trip exactly."""
    if width % 8 or height % 8:
        raise ValueError("encode_jpeg: dimensions must be multiples of 8")
    if len(pixels) != width * height:
        raise ValueError("encode_jpeg: pixel buffer does not match dims")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)

    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(height // 8):
        for bx in range(width // 8):
            block = arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64)
            coef = _M @ (block - 128.0) @ _M.T
            q = np.rint(coef).astype(np.int64)  # all-ones quant table
            zz = [int(q[r, c]) for r, c in ZIGZAG]

            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            size = _category(diff)
            w.write(*dc_codes[size])
            if size:
                w.write(diff if diff > 0 else diff + (1 << size) - 1, size)

            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    w.write(*ac_codes[0xF0])  # ZRL
                    run -= 16
                size = _category(v)
                w.write(*ac_codes[(run << 4) | size])
                w.write(v if v > 0 else v + (1 << size) - 1, size)
                run = 0
            if run:
                w.write(*ac_codes[0x00])  # EOB

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    quant_zz = bytes([1] * 64)
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(DQT, b"\x00" + quant_zz)
    out += seg(SOF0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    out += seg(DHT, bytes([0x00] + _DC_BITS) + bytes(_DC_SYMS))
    out += seg(DHT, bytes([0x10] + _AC_BITS) + bytes(_AC_SYMS))
    out += seg(SOS, bytes([1, 1, 0x00, 0, 63, 0]))
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline grayscale JPEG; returns ``(width, height,
    channels=1, pixels)``. Raises ``ValueError`` on corruption or on
    features outside the supported subset."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = -1
    comp_dc = comp_ac = comp_q = 0
    scan_data: bytes | None = None

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == EOI:
            break
        if marker == SOI or 0xD0 <= marker <= 0xD7:
            continue  # no length field
        if pos + 2 > len(payload):
            raise ValueError("truncated segment length")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment body")
        pos += seglen

        if marker == DQT:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for i, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = body[off + 1 + i]
                quant[tq] = tbl
                off += 65
        elif marker == SOF0:
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("only single-component (grayscale) supported")
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
            comp_q = body[8]
            if width * height > _MAX_PIXELS:
                raise ValueError("declared dims exceed pixel ceiling")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == DHT:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                syms = list(body[off + 17 : off + 17 + n])
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(cls, tid)] = table
                off += 17 + n
        elif marker == SOS:
            if body[0] != 1:
                raise ValueError("scan must cover exactly 1 component")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0xF
            scan_data = payload[pos:]
            break
        # APPn / COM / others: skipped

    if scan_data is None:
        raise ValueError("missing SOS")
    if width < 0:
        raise ValueError("missing SOF0")
    if comp_q not in quant:
        raise ValueError("missing quantization table")
    if (0, comp_dc) not in huff or (1, comp_ac) not in huff:
        raise ValueError("missing Huffman table")

    dc_tbl, ac_tbl = huff[(0, comp_dc)], huff[(1, comp_ac)]
    qtbl = quant[comp_q]
    r = _BitReader(scan_data)

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in scan")

    bw, bh = (width + 7) // 8, (height + 7) // 8
    out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = [0] * 64
            size = read_symbol(dc_tbl)
            if size > 11:
                raise ValueError("invalid DC category")
            diff = _extend(r.receive(size), size) if size else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = read_symbol(ac_tbl)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run overflows block")
                zz[k] = _extend(r.receive(size), size)
                k += 1
            coef = np.zeros((8, 8), dtype=np.float64)
            for i, (row, col) in enumerate(ZIGZAG):
                coef[row, col] = zz[i] * qtbl[row, col]
            block = _M.T @ coef @ _M + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(block), 0, 255
            ).astype(np.uint8)

    return width, height, 1, out[:height, :width].tobytes()


# --------------------------------------------------------------------------
# Deterministic synthetic payloads (shared by query + oracle)
# --------------------------------------------------------------------------
#
# Dimensions and per-8x8-block constants are pure functions of doc_id, so
# the DuckDB oracle recomputes pixel sums from the closed form WITHOUT
# decoding: constant blocks have one integer DCT coefficient, which the
# all-ones quantization preserves exactly.


def synth_jpeg_dims(doc_id: int) -> tuple[int, int]:
    return 8 * (2 + doc_id % 4), 8 * (2 + (doc_id % 9) // 3)


def block_constant(doc_id: int, bx: int, by: int) -> int:
    return (doc_id * 11 + bx * 17 + by * 29) % 256


def synth_jpeg(doc_id: int) -> bytes:
    width, height = synth_jpeg_dims(doc_id)
    arr = np.zeros((height, width), dtype=np.uint8)
    for by in range(height // 8):
        for bx in range(width // 8):
            arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block_constant(
                doc_id, bx, by
            )
    return encode_jpeg(arr.tobytes(), width, height)
