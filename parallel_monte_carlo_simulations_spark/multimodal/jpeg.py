"""Baseline JPEG (ITU T.81) codec — stdlib + numpy only.

A real, self-contained implementation of the baseline sequential DCT
process for 8-bit grayscale and 3-component YCbCr images in 4:4:4 or
4:2:0 chroma-subsampled layout: marker
segment parsing (SOI/DQT/SOF0/DHT/SOS/EOI, APPn/COM skipped), canonical
Huffman tables decoded from DHT, entropy-coded scan with byte
unstuffing, interleaved MCUs with per-component DC predictors, AC
run-length (EOB/ZRL) coding, dequantization, inverse zigzag, a float
IDCT, and BT.601 YCbCr->RGB conversion — plus the matching encoder used
to synthesize deterministic test payloads.

Scope (enforced, clear errors outside it): baseline DCT, 8-bit, 1 or 3
components in 4:4:4 or 4:2:0 (generalized interleaved-MCU walk with
per-component sampling factors, replication chroma upsample), no
restart markers, no progressive or arithmetic coding. That subset is decoded for REAL — there is no
library call anywhere.

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

# Vectorized-scatter form of the zigzag order: coef[:, _ZZ_R, _ZZ_C] =
# zz places every block's 64 zigzag values in one numpy op (the
# per-block 64-iteration Python loop was the decoder's hottest line).
_ZZ_R = np.array([r for r, _ in ZIGZAG])
_ZZ_C = np.array([c for _, c in ZIGZAG])

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

    def pad_align(self) -> None:
        """Pad the current partial byte with 1-bits (spec) — used before
        emitting a byte-aligned RSTn marker."""
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.buf)


class _BitReader:
    """Buffered MSB-first bit reader over an entropy-coded segment.

    Round-9 rework: the original read one BIT per Python call (the
    decoder's hot loop after the IDCT was batched). This form buffers
    whole unstuffed bytes into an int accumulator and exposes
    ``peek16``/``consume`` so Huffman decode is one table probe per
    SYMBOL. Stuffed 0xFF00 unstuffs during fill; any other marker
    (RSTn, EOI) stops the fill with ``pos`` left ON the 0xFF so
    ``restart`` can verify it byte-aligned, exactly like the
    byte-at-a-time original."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0
        self._boundary = False

    def _fill(self) -> None:
        data, pos, n = self.data, self.pos, len(self.data)
        while self._n <= 24 and not self._boundary:
            if pos >= n:
                break
            b = data[pos]
            pos += 1
            if b == 0xFF:
                if pos >= n:
                    raise ValueError("truncated marker in scan")
                if data[pos] == 0x00:
                    pos += 1  # unstuff FF00 -> FF
                else:
                    pos -= 1  # leave pos on the marker's 0xFF
                    self._boundary = True
                    break
            self._acc = (self._acc << 8) | b
            self._n += 8
        self.pos = pos

    def peek16(self) -> int:
        if self._n < 16:
            self._fill()
        if self._n >= 16:
            return (self._acc >> (self._n - 16)) & 0xFFFF
        return (self._acc << (16 - self._n)) & 0xFFFF  # zero-padded tail

    def consume(self, k: int) -> None:
        if self._n < k:
            self._fill()
            if self._n < k:
                raise ValueError("truncated entropy-coded segment")
        self._n -= k
        self._acc &= (1 << self._n) - 1

    def read_bit(self) -> int:
        bit = self.peek16() >> 15
        self.consume(1)
        return bit

    def receive(self, length: int) -> int:
        if length == 0:
            return 0
        v = self.peek16() >> (16 - length)
        self.consume(length)
        return v

    def restart(self, n: int) -> None:
        """Discard pad bits and consume the byte-aligned RSTn marker."""
        self._acc = 0
        self._n = 0
        self._boundary = False
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated restart marker")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + n:
            raise ValueError(
                f"expected RST{n} at scan offset {self.pos}, found "
                f"{self.data[self.pos:self.pos + 2].hex()}"
            )
        self.pos += 2


#: (symbol, length) flat lookup over a 16-bit peek window, keyed by the
#: DHT payload so repeated decodes of same-table payloads (every decode
#: in a corpus scan) build it once per process. Bounded: cleared if an
#: adversarial stream registers more than 64 distinct tables.
_HUFF_LUT_CACHE: dict[bytes, tuple[list[int], list[int]]] = {}


def _huff_lut(bits: list[int], syms: list[int]) -> tuple[list[int], list[int]]:
    key = bytes(bits) + bytes(syms)
    hit = _HUFF_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym_l = [0] * 65536
    len_l = [0] * 65536
    code = k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym_l[lo:hi] = [syms[k]] * (hi - lo)
            len_l[lo:hi] = [length] * (hi - lo)
            code += 1
            k += 1
        code <<= 1
    if len(_HUFF_LUT_CACHE) >= 64:
        _HUFF_LUT_CACHE.clear()
    _HUFF_LUT_CACHE[key] = (sym_l, len_l)
    return sym_l, len_l


def _extend(v: int, size: int) -> int:
    """Signed magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _plane_zigzags(plane: np.ndarray) -> list[list[int]]:
    """FDCT + quantize (all-ones table) every 8x8 block of a plane in
    one broadcast matmul, returning per-block zigzag coefficient lists
    in raster block order (round-9: the per-block matmul + 64-element
    numpy scalar-indexing loop was the encoder's hot path)."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    q = np.rint(_M @ blocks @ _M.T).astype(np.int64)
    return q[:, _ZZ_R, _ZZ_C].tolist()


def _encode_block(
    w: _BitWriter,
    zz: list[int],
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-code one block's zigzag coefficients; returns the
    block's DC for the component's predictor."""
    diff = zz[0] - prev_dc
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
    return zz[0]


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _headers(
    width: int,
    height: int,
    ncomp: int,
    samplings: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(DQT, b"\x00" + bytes([1] * 64))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    samplings = samplings or [0x11] * ncomp
    comp_specs = b"".join(
        bytes([cid, samplings[cid - 1], 0]) for cid in range(1, ncomp + 1)
    )
    out += _seg(SOF0, struct.pack(">BHHB", 8, height, width, ncomp) + comp_specs)
    out += _seg(DHT, bytes([0x00] + _DC_BITS) + bytes(_DC_SYMS))
    out += _seg(DHT, bytes([0x10] + _AC_BITS) + bytes(_AC_SYMS))
    scan_specs = b"".join(bytes([cid, 0x00]) for cid in range(1, ncomp + 1))
    out += _seg(SOS, bytes([ncomp]) + scan_specs + bytes([0, 63, 0]))
    return bytes(out)


def _encode_planes(
    planes: list[np.ndarray], width: int, height: int, restart_interval: int = 0
) -> bytes:
    """Shared encoder core: interleaved MCUs (one 8x8 block per plane,
    4:4:4), per-plane DC predictors, all-ones quantization; optional
    DRI/RSTn restart markers every ``restart_interval`` MCUs."""
    if width % 8 or height % 8:
        raise ValueError("encode_jpeg: dimensions must be multiples of 8")
    for p in planes:
        if p.shape != (height, width):
            raise ValueError("encode_jpeg: plane shape does not match dims")
    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMS)
    w = _BitWriter()
    prev_dc = [0] * len(planes)
    zzs = [_plane_zigzags(p) for p in planes]  # raster block order
    mcu_i = 0
    n_mcus = (height // 8) * (width // 8)
    for by in range(height // 8):
        for bx in range(width // 8):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                w.pad_align()
                w.buf += bytes([0xFF, 0xD0 + (mcu_i // restart_interval - 1) % 8])
                prev_dc = [0] * len(planes)
            for ci in range(len(planes)):
                prev_dc[ci] = _encode_block(
                    w, zzs[ci][mcu_i], prev_dc[ci], dc_codes, ac_codes
                )
            mcu_i += 1
    assert mcu_i == n_mcus
    return (
        _headers(width, height, len(planes), restart_interval=restart_interval)
        + w.flush()
        + b"\xff\xd9"
    )


def encode_jpeg(
    pixels: bytes, width: int, height: int, restart_interval: int = 0
) -> bytes:
    """Encode 8-bit grayscale row-major ``pixels`` as a baseline JPEG.

    Dimensions must be multiples of 8 (the synthetic-payload case; real
    encoders pad partial blocks). Quantization is the all-ones table, so
    integer-valued DCT blocks round-trip exactly."""
    if len(pixels) != width * height:
        raise ValueError("encode_jpeg: pixel buffer does not match dims")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    return _encode_planes([arr], width, height, restart_interval=restart_interval)


def encode_jpeg_ycbcr(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, width: int, height: int
) -> bytes:
    """Encode three ALREADY-YCbCr 8-bit planes as a 3-component 4:4:4
    baseline JPEG (interleaved MCUs, shared quant/Huffman tables). The
    planes are taken as-is — no RGB conversion on encode — so integer
    constant blocks survive the all-ones quantization exactly and the
    decoder's YCbCr->RGB output has a closed form."""
    return _encode_planes([y, cb, cr], width, height)


def encode_jpeg_ycbcr_420(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, width: int, height: int
) -> bytes:
    """Encode YCbCr planes as a 4:2:0 chroma-subsampled baseline JPEG:
    Y at full resolution (sampling 2x2), Cb/Cr at half resolution in
    both axes (1x1) — the ubiquitous real-world JPEG layout. Each MCU
    covers 16x16 pixels and carries four Y blocks (2x2 order) then one
    Cb and one Cr block. Dimensions must be multiples of 16; the chroma
    planes are (height/2, width/2)."""
    if width % 16 or height % 16:
        raise ValueError("encode 4:2:0: dimensions must be multiples of 16")
    if y.shape != (height, width):
        raise ValueError("encode 4:2:0: Y plane shape mismatch")
    if cb.shape != (height // 2, width // 2) or cr.shape != cb.shape:
        raise ValueError("encode 4:2:0: chroma plane shape mismatch")
    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMS)
    w = _BitWriter()
    prev_dc = [0, 0, 0]
    y_zz, cb_zz, cr_zz = (_plane_zigzags(p) for p in (y, cb, cr))
    ybw, cbw = width // 8, width // 16  # blocks per row, per plane
    for my in range(height // 16):
        for mx in range(width // 16):
            for vy in range(2):  # four Y blocks, raster order inside MCU
                for vx in range(2):
                    prev_dc[0] = _encode_block(
                        w, y_zz[(my * 2 + vy) * ybw + mx * 2 + vx],
                        prev_dc[0], dc_codes, ac_codes,
                    )
            for ci, zz in ((1, cb_zz), (2, cr_zz)):
                prev_dc[ci] = _encode_block(
                    w, zz[my * cbw + mx], prev_dc[ci], dc_codes, ac_codes
                )
    return (
        _headers(width, height, 3, samplings=[0x22, 0x11, 0x11])
        + w.flush()
        + b"\xff\xd9"
    )


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG — grayscale or 3-component 4:4:4 YCbCr —
    returning ``(width, height, channels, pixels)`` with color output as
    interleaved RGB. Raises ``ValueError`` on corruption or on features
    outside the supported subset (subsampling, progressive, 16-bit)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    width = height = -1
    comp_q: dict[int, int] = {}
    comp_samp: dict[int, tuple[int, int]] = {}
    scan_comps: list[tuple[int, int, int]] = []
    scan_data: bytes | None = None
    restart_interval = 0

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
            if ncomp not in (1, 3):
                raise ValueError("only 1 (gray) or 3 (YCbCr) components supported")
            comp_q = {}
            comp_samp = {}
            for ci in range(ncomp):
                cid, sampling, qid = body[6 + 3 * ci : 9 + 3 * ci]
                comp_q[cid] = qid
                comp_samp[cid] = (sampling >> 4, sampling & 0xF)
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
                huff[(cls, tid)] = _huff_lut(bits, syms)
                off += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                raise ValueError("malformed DRI segment")
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == SOS:
            ns = body[0]
            if ns not in (1, 3):
                raise ValueError("scan must cover 1 or 3 components")
            scan_comps = []
            for ci in range(ns):
                cid = body[1 + 2 * ci]
                tbls = body[2 + 2 * ci]
                scan_comps.append((cid, tbls >> 4, tbls & 0xF))
            scan_data = payload[pos:]
            break
        # APPn / COM / others: skipped

    if scan_data is None:
        raise ValueError("missing SOS")
    if width < 0:
        raise ValueError("missing SOF0")
    if len(scan_comps) != len(comp_q):
        raise ValueError("scan component count differs from frame")
    for cid, dc_id, ac_id in scan_comps:
        if cid not in comp_q:
            raise ValueError(f"scan references unknown component {cid}")
        if comp_q[cid] not in quant:
            raise ValueError("missing quantization table")
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("missing Huffman table")

    r = _BitReader(scan_data)

    def read_symbol(lut: tuple[list[int], list[int]]) -> int:
        sym_l, len_l = lut
        v = r.peek16()
        ln = len_l[v]
        if ln == 0:
            raise ValueError("invalid Huffman code in scan")
        r.consume(ln)
        return sym_l[v]

    def read_block_zz(dc_tbl, ac_tbl, prev_dc: int) -> tuple[list[int], int]:
        """Entropy-decode one block to its 64 zigzag-order coefficients.
        Dequantization and the IDCT are deferred and batched over ALL
        blocks after the scan (round-9: one broadcast matmul instead of
        a per-block Python zigzag loop + 8x8 matmul — same arithmetic,
        exact integers below 2^53 either way)."""
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
        return zz, prev_dc

    ncomp = len(scan_comps)
    samps = [comp_samp[cid] for cid, _dc, _ac in scan_comps]
    hmax = max(h for h, _v in samps)
    vmax = max(v for _h, v in samps)
    supported = {(1, 1)} if ncomp == 1 else {((1, 1),) * 3, ((2, 2), (1, 1), (1, 1))}
    key = samps[0] if ncomp == 1 else tuple(samps)
    if key not in supported:
        raise ValueError(f"unsupported sampling layout {samps}")

    # Interleaved MCUs, generalized over sampling factors: an MCU covers
    # (8*hmax x 8*vmax) pixels and carries h_i*v_i blocks per component
    # in raster order — 4:4:4 degenerates to one block each; 4:2:0 is
    # four Y blocks then one Cb and one Cr.
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * v * 8, mcux * h * 8), dtype=np.uint8)
        for h, v in samps
    ]
    zz_per_comp: list[list[list[int]]] = [[] for _ in range(ncomp)]
    pos_per_comp: list[list[tuple[int, int]]] = [[] for _ in range(ncomp)]
    prev_dc = [0] * ncomp
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                r.restart((mcu_i // restart_interval - 1) % 8)
                prev_dc = [0] * ncomp
            for ci, (cid, dc_id, ac_id) in enumerate(scan_comps):
                h, v = samps[ci]
                for vy in range(v):
                    for vx in range(h):
                        zz, prev_dc[ci] = read_block_zz(
                            huff[(0, dc_id)], huff[(1, ac_id)], prev_dc[ci]
                        )
                        zz_per_comp[ci].append(zz)
                        pos_per_comp[ci].append(
                            ((my * v + vy) * 8, (mx * h + vx) * 8)
                        )
            mcu_i += 1

    # Batched dequantize -> IDCT -> level shift, one broadcast matmul
    # per component over its (N, 8, 8) coefficient stack.
    for ci, (cid, _dc_id, _ac_id) in enumerate(scan_comps):
        if not zz_per_comp[ci]:
            continue
        qzz = quant[comp_q[cid]][_ZZ_R, _ZZ_C].astype(np.float64)
        coef = np.zeros((len(zz_per_comp[ci]), 8, 8), dtype=np.float64)
        coef[:, _ZZ_R, _ZZ_C] = np.asarray(zz_per_comp[ci], dtype=np.float64) * qzz
        blocks = np.clip(np.rint(_M.T @ coef @ _M + 128.0), 0, 255).astype(
            np.uint8
        )
        plane = planes[ci]
        for (r0, c0), blk in zip(pos_per_comp[ci], blocks):
            plane[r0 : r0 + 8, c0 : c0 + 8] = blk

    if ncomp == 1:
        return width, height, 1, planes[0][:height, :width].tobytes()

    # Upsample subsampled chroma by sample replication (each chroma
    # sample covers a (vmax/v x hmax/h) pixel tile) before conversion.
    full = []
    for ci, (h, v) in enumerate(samps):
        p = planes[ci]
        if (h, v) != (hmax, vmax):
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p)

    # YCbCr (BT.601 full-range) -> RGB. Rounding is floor(x + 0.5): the
    # JPEG spec does not mandate a rounding mode here, and floor+0.5 is
    # reproducible verbatim in SQL, which keeps the decoded output
    # closed-form checkable (np.rint's half-to-even is not).
    y = full[0][:height, :width].astype(np.float64)
    cb = full[1][:height, :width].astype(np.float64) - 128.0
    cr = full[2][:height, :width].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return width, height, 3, rgb.tobytes()


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


def block_ycbcr(doc_id: int, bx: int, by: int) -> tuple[int, int, int]:
    """Per-block constant YCbCr triple for the color synthetic payloads."""
    return (
        (doc_id * 13 + bx * 7 + by * 3) % 256,
        (doc_id * 5 + bx * 11) % 256,
        (doc_id * 3 + by * 17) % 256,
    )


def synth_jpeg_color(doc_id: int) -> bytes:
    """Deterministic 3-component 4:4:4 JPEG: constant YCbCr blocks that
    survive all-ones quantization exactly, so the decoder's RGB output
    (floor(x+0.5) conversion) has a closed form the oracle can verify."""
    width, height = synth_jpeg_dims(doc_id)
    planes = [np.zeros((height, width), dtype=np.uint8) for _ in range(3)]
    for by in range(height // 8):
        for bx in range(width // 8):
            y, cb, cr = block_ycbcr(doc_id, bx, by)
            for plane, v in zip(planes, (y, cb, cr)):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    return encode_jpeg_ycbcr(*planes, width, height)


def synth_jpeg_420_dims(doc_id: int) -> tuple[int, int]:
    """(Y blocks wide, Y blocks high), both even so dims are 16-multiples."""
    return 2 * (1 + doc_id % 3), 2 * (1 + (doc_id % 6) // 3)


def synth_jpeg_420(doc_id: int) -> bytes:
    """Deterministic 4:2:0 payload: Y constant per 8x8 block, chroma
    constant per chroma block (= per 16x16 luma region); constant blocks
    have a single integer DCT coefficient, so the all-ones quantization
    round-trips them exactly and the decoded RGB has a closed form."""
    wb, hb = synth_jpeg_420_dims(doc_id)
    w, h = 8 * wb, 8 * hb
    y = np.zeros((h, w), dtype=np.uint8)
    for by in range(hb):
        for bx in range(wb):
            y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                doc_id * 11 + bx * 17 + by * 29
            ) % 256
    cb = np.zeros((h // 2, w // 2), dtype=np.uint8)
    cr = np.zeros((h // 2, w // 2), dtype=np.uint8)
    for cy in range(hb // 2):
        for cx in range(wb // 2):
            cb[cy * 8 : cy * 8 + 8, cx * 8 : cx * 8 + 8] = (
                doc_id * 13 + cx * 7 + cy * 19
            ) % 256
            cr[cy * 8 : cy * 8 + 8, cx * 8 : cx * 8 + 8] = (
                doc_id * 17 + cx * 23 + cy * 31
            ) % 256
    return encode_jpeg_ycbcr_420(y, cb, cr, w, h)
