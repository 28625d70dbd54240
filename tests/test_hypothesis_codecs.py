"""Hypothesis property tests for the native image codecs (no Spark per
example — pure Python/numpy, hundreds of generated cases).

PNG is lossless: encode->decode must reproduce arbitrary pixel content
bit-exactly under every (dims, filter-choice) combination. Baseline JPEG
is lossy, but its loss is exactly the quantization round-trip: the
decoder's output on arbitrary content must equal the independent numpy
model round(DCT) -> IDCT -> clamp of each block — which verifies the
whole Huffman bitstream (DC prediction, magnitude categories, AC runs,
ZRL/EOB, byte stuffing) symbol-exactly."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parallel_monte_carlo_simulations_spark.multimodal.jpeg import (
    _M,
    decode_jpeg,
    encode_jpeg,
)
from parallel_monte_carlo_simulations_spark.multimodal.png import (
    decode_png,
    encode_png,
)


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    color=st.sampled_from([0, 2]),
    base_filter=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=120, deadline=None)
def test_png_roundtrip_lossless(w, h, color, base_filter, seed):
    channels = 1 if color == 0 else 3
    rng = np.random.default_rng(seed)
    pixels = bytes(rng.integers(0, 256, size=w * h * channels, dtype=np.uint8))
    payload = encode_png(
        w, h, pixels, color_type=color,
        filter_per_row=lambda y: (base_filter + y) % 5,
    )
    dw, dh, dc, out = decode_png(payload)
    assert (dw, dh, dc) == (w, h, channels)
    assert out == pixels


@given(
    bw=st.integers(min_value=1, max_value=3),
    bh=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_roundtrip_matches_quantization_model(bw, bh, seed):
    w, h = bw * 8, bh * 8
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    dw, dh, dc, px = decode_jpeg(encode_jpeg(img.tobytes(), w, h))
    assert (dw, dh, dc) == (w, h, 1)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    ref = np.zeros_like(img)
    for by in range(bh):
        for bx in range(bw):
            b = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64)
            q = np.rint(_M @ (b - 128.0) @ _M.T)
            r = _M.T @ q @ _M + 128.0
            ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(r), 0, 255
            )
    assert (dec == ref).all()


@given(
    bw=st.integers(min_value=1, max_value=3),
    bh=st.integers(min_value=1, max_value=2),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_color_roundtrip_matches_model(bw, bh, seed):
    """Random YCbCr planes through the 3-component bitstream must equal
    the numpy model: per-plane round(DCT)->IDCT->clamp, then BT.601
    conversion with floor(x+0.5) rounding."""
    from parallel_monte_carlo_simulations_spark.multimodal.jpeg import (
        encode_jpeg_ycbcr,
    )

    w, h = bw * 8, bh * 8
    rng = np.random.default_rng(seed)
    planes = [rng.integers(0, 256, size=(h, w), dtype=np.uint8) for _ in range(3)]
    dw, dh, dc, px = decode_jpeg(encode_jpeg_ycbcr(*planes, w, h))
    assert (dw, dh, dc) == (w, h, 3)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)

    ref_planes = []
    for plane in planes:
        out = np.zeros((h, w), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                b = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64)
                q = np.rint(_M @ (b - 128.0) @ _M.T)
                r = _M.T @ q @ _M + 128.0
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.rint(r), 0, 255
                )
        ref_planes.append(out)
    y, cb, cr = ref_planes[0], ref_planes[1] - 128.0, ref_planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    ref = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    assert (dec == ref).all()


@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=400
    ),
    junk=st.one_of(st.none(), st.binary(min_size=0, max_size=9)),
)
@settings(max_examples=120, deadline=None)
def test_wav_roundtrip_lossless(rate, samples, junk):
    """WAV is a lossless container: arbitrary PCM16 content survives
    encode->decode bit-exactly, with or without an (odd-length) extra
    chunk exercising RIFF padding."""
    from parallel_monte_carlo_simulations_spark.multimodal.wav import (
        decode_wav,
        encode_wav,
    )

    drate, dch, out = decode_wav(encode_wav(rate, samples, junk=junk))
    assert (drate, dch) == (rate, 1)
    assert out == samples


@given(
    doc_id=st.integers(min_value=0, max_value=10**6),
    cut=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=80, deadline=None)
def test_wav_truncation_raises_valueerror(doc_id, cut):
    """Any truncation of a valid payload raises ValueError (never a raw
    struct.error) — the bounds-check-before-unpack discipline."""
    import pytest

    from parallel_monte_carlo_simulations_spark.multimodal.wav import (
        decode_wav,
        synth_wav,
    )

    payload = synth_wav(doc_id)
    with pytest.raises(ValueError):
        decode_wav(payload[: len(payload) - cut])


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    n_frames=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    uniform=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_gif_roundtrip_lossless(w, h, n_frames, seed, uniform):
    """GIF-LZW is lossless on 8-bit indexed frames: arbitrary (or
    worst-case uniform, long-run) content round-trips bit-exactly with
    per-frame GCE delays preserved — covering variable code-width
    growth and the code==next self-referential case."""
    from parallel_monte_carlo_simulations_spark.multimodal.gif import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(seed)
    if uniform:
        frames = [bytes([f % 256]) * (w * h) for f in range(n_frames)]
    else:
        frames = [
            bytes(rng.integers(0, 256, size=w * h, dtype=np.uint8))
            for _ in range(n_frames)
        ]
    delays = [int(rng.integers(0, 1000)) for _ in range(n_frames)]
    dw, dh, dec = decode_gif(encode_gif(w, h, frames, delays_cs=delays))
    assert (dw, dh) == (w, h)
    assert [d for d, _ in dec] == delays
    assert [x for _, x in dec] == frames


@given(
    doc_id=st.integers(min_value=0, max_value=10**6),
    cut=st.integers(min_value=1, max_value=60),
)
@settings(max_examples=80, deadline=None)
def test_gif_truncation_raises_valueerror(doc_id, cut):
    import pytest

    from parallel_monte_carlo_simulations_spark.multimodal.gif import (
        decode_gif,
        synth_gif,
    )

    payload = synth_gif(doc_id)
    with pytest.raises(ValueError):
        decode_gif(payload[: len(payload) - cut])


@given(
    mw=st.integers(min_value=1, max_value=3),
    mh=st.integers(min_value=1, max_value=2),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_420_roundtrip_matches_model(mw, mh, seed):
    """4:2:0 chroma-subsampled bitstream must equal the numpy model:
    per-plane round(DCT)->IDCT->clamp, 2x2 replication upsample of the
    half-resolution chroma, then BT.601 with floor(x+0.5)."""
    from parallel_monte_carlo_simulations_spark.multimodal.jpeg import (
        encode_jpeg_ycbcr_420,
    )

    w, h = mw * 16, mh * 16
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    cb = rng.integers(0, 256, size=(h // 2, w // 2), dtype=np.uint8)
    cr = rng.integers(0, 256, size=(h // 2, w // 2), dtype=np.uint8)
    dw, dh, dc, px = decode_jpeg(encode_jpeg_ycbcr_420(y, cb, cr, w, h))
    assert (dw, dh, dc) == (w, h, 3)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)

    def model(plane):
        ph, pw = plane.shape
        out = np.zeros((ph, pw), dtype=np.float64)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                b = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                    np.float64
                )
                q = np.rint(_M @ (b - 128.0) @ _M.T)
                r = _M.T @ q @ _M + 128.0
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.rint(r), 0, 255
                )
        return out

    ym = model(y)
    cbf = np.repeat(np.repeat(model(cb), 2, 0), 2, 1) - 128.0
    crf = np.repeat(np.repeat(model(cr), 2, 0), 2, 1) - 128.0
    rgb = np.stack(
        [ym + 1.402 * crf, ym - 0.344136 * cbf - 0.714136 * crf, ym + 1.772 * cbf],
        axis=-1,
    )
    ref = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    assert (dec == ref).all()


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    n_colors=st.integers(min_value=1, max_value=256),
    base_filter=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=80, deadline=None)
def test_png_palette_roundtrip(w, h, n_colors, base_filter, seed):
    """Indexed PNG: arbitrary index maps through arbitrary palettes must
    decode to exactly the palette-mapped RGB under every filter type."""
    rng = np.random.default_rng(seed)
    pal = bytes(rng.integers(0, 256, size=n_colors * 3, dtype=np.uint8))
    idx = bytes(rng.integers(0, n_colors, size=w * h, dtype=np.uint8))
    payload = encode_png(
        w, h, idx, color_type=3, palette=pal,
        filter_per_row=lambda y: (base_filter + y) % 5,
    )
    dw, dh, dc, out = decode_png(payload)
    assert (dw, dh, dc) == (w, h, 3)
    assert out == bytes(b for i in idx for b in pal[i * 3 : i * 3 + 3])


@given(
    bw=st.integers(min_value=1, max_value=5),
    bh=st.integers(min_value=1, max_value=4),
    interval=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_restart_markers_roundtrip(bw, bh, interval, seed):
    """DRI/RSTn streams must decode identically to the unrestarted
    stream: marker byte alignment, RST index cycling, and DC predictor
    resets all verified against the quantization model."""
    w, h = bw * 8, bh * 8
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    from parallel_monte_carlo_simulations_spark.multimodal.jpeg import (
        encode_jpeg as _enc,
    )

    plain = decode_jpeg(_enc(img.tobytes(), w, h))
    restarted = decode_jpeg(_enc(img.tobytes(), w, h, restart_interval=interval))
    assert plain == restarted


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    color=st.sampled_from([0, 2]),
    base_filter=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=100, deadline=None)
def test_png_adam7_roundtrip_lossless(w, h, color, base_filter, seed):
    """Adam7 progressive layout must reproduce arbitrary content
    bit-exactly — all 7 pass geometries, per-pass filtering, and the
    scatter back onto the pixel grid (incl. degenerate dims where some
    passes are empty)."""
    channels = 1 if color == 0 else 3
    rng = np.random.default_rng(seed)
    pixels = bytes(rng.integers(0, 256, size=w * h * channels, dtype=np.uint8))
    payload = encode_png(
        w, h, pixels, color_type=color, interlace=True,
        filter_per_row=lambda y: (base_filter + y) % 5,
    )
    dw, dh, dc, out = decode_png(payload)
    assert (dw, dh, dc) == (w, h, channels)
    assert out == pixels


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    top_down=st.booleans(),
)
@settings(max_examples=120, deadline=None)
def test_bmp_roundtrip_lossless(w, h, seed, top_down):
    """24-bit BI_RGB encode->decode reproduces arbitrary pixels exactly,
    including the top-down (negative height) storage variant."""
    import struct

    from parallel_monte_carlo_simulations_spark.multimodal.bmp import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)
    pixels = [
        (int(vals[i]), int(vals[i + 1]), int(vals[i + 2]))
        for i in range(0, len(vals), 3)
    ]
    payload = encode_bmp(w, h, pixels)
    if top_down:
        # rewrite as the top-down variant: negate height, reverse rows
        buf = bytearray(payload)
        struct.pack_into("<i", buf, 14 + 8, -h)
        stride = (w * 3 + 3) & ~3
        body = payload[54:]
        rows = [body[i * stride : (i + 1) * stride] for i in range(h)]
        buf[54:] = b"".join(reversed(rows))
        payload = bytes(buf)
    dw, dh, out = decode_bmp(payload)
    assert (dw, dh) == (w, h)
    assert out == pixels


@given(
    doc_id=st.integers(min_value=0, max_value=5000),
    cut=st.integers(min_value=1, max_value=53),
)
@settings(max_examples=60, deadline=None)
def test_bmp_truncation_raises_valueerror(doc_id, cut):
    from parallel_monte_carlo_simulations_spark.multimodal.bmp import (
        decode_bmp,
        synth_bmp,
    )

    payload = synth_bmp(doc_id)
    import pytest

    with pytest.raises(ValueError):
        decode_bmp(payload[: len(payload) - cut])


@given(s=st.integers(min_value=-32768, max_value=32767))
@settings(max_examples=300, deadline=None)
def test_mulaw_transfer_function_properties(s):
    """Spec properties over the full int16 domain: byte in range,
    expansion is sign-preserving, quantization error bounded by the
    segment width (<= 2^exp * 8 with the clip region saturating)."""
    from parallel_monte_carlo_simulations_spark.multimodal.mulaw import (
        CLIP,
        decode_mulaw_sample,
        encode_mulaw_sample,
    )

    b = encode_mulaw_sample(s)
    assert 0 <= b <= 255
    d = decode_mulaw_sample(b)
    if s > 0:
        assert d >= 0
    if s < 0:
        assert d <= 0
    clipped = max(-CLIP, min(CLIP, s))
    # widest segment (exp=7) quantization step is 2^(7+3) = 1024
    assert abs(clipped - d) <= 1024
    # idempotence: re-encoding the decoded value yields the same byte.
    # Exception: mu-law has dual zero encodings (0x7F negative zero,
    # 0xFF positive zero) that both decode to 0, which re-encodes as
    # the positive form.
    if d != 0:
        assert encode_mulaw_sample(d) == b
