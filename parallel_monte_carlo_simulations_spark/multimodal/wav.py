"""Real audio decode: a self-contained RIFF/WAVE PCM16 codec.

The audio leg of the multimodal surface (media_frame types docs as
``audio/wav`` for ``doc_id % 3 == 1``) gets the same treatment the PNG
and JPEG legs got: a genuine synthesizer + decoder pair, stdlib-only,
with a DuckDB oracle that recomputes the audio features from the
synthesis closed form WITHOUT decoding — so an oracle match proves the
samples actually round-tripped through the container format.

Synthesis closed form (what the oracle replays):

- ``sample_rate = 8000 * (1 + doc_id % 3)``  (8/16/24 kHz)
- ``n_samples  = 200 + (doc_id % 23) * 16``
- ``s[i] = ((doc_id * 31 + i * 17) % 2001) - 1000``  (int16 mono PCM)

The container is real RIFF: ``fmt `` chunk (PCM tag, mono, 16-bit), a
deliberately odd-length ``note`` chunk so the decoder must honor RIFF's
even-byte chunk padding rule, then ``data``. The decoder is a defensive
chunk walk (bounds-checked before every unpack — the lesson from the
PNG truncation ADVICE item), validates the PCM format tag / bit depth /
channel count, and rejects truncated payloads with ``ValueError``.

At 100 TB: payloads are an opaque ``binary`` column; synth and decode
are Arrow-batched ``mapInPandas`` narrow maps — zero shuffle,
embarrassingly parallel scan work, same profile as the image legs.
"""

from __future__ import annotations

import struct

WAV_RIFF = b"RIFF"
WAV_WAVE = b"WAVE"


def synth_rate(doc_id: int) -> int:
    return 8000 * (1 + doc_id % 3)


def synth_n_samples(doc_id: int) -> int:
    return 200 + (doc_id % 23) * 16


def synth_samples(doc_id: int) -> list[int]:
    """The closed-form PCM samples the DuckDB oracle recomputes."""
    return [
        ((doc_id * 31 + i * 17) % 2001) - 1000
        for i in range(synth_n_samples(doc_id))
    ]


def encode_wav(rate: int, samples: list[int], junk: bytes | None = None) -> bytes:
    """Encode mono PCM16 ``samples`` into a real RIFF/WAVE container.

    ``junk`` (optional) is written as an extra ``note`` chunk before
    ``data``; an odd-length value exercises RIFF's even-byte padding rule
    on the decode side."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if junk is not None:
        chunks += b"note" + struct.pack("<I", len(junk)) + junk
        chunks += b"\x00" * (len(junk) & 1)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return WAV_RIFF + struct.pack("<I", 4 + len(chunks)) + WAV_WAVE + chunks


def synth_wav(doc_id: int) -> bytes:
    """Build the deterministic RIFF/WAVE payload for ``doc_id`` (the
    closed form the DuckDB oracle replays), including an odd-length
    metadata chunk so every decode crosses the padding rule."""
    return encode_wav(
        synth_rate(doc_id),
        synth_samples(doc_id),
        junk=b"a" + struct.pack("<I", doc_id % 97),  # 5 bytes -> 1 pad
    )


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a RIFF/WAVE PCM16 payload -> ``(rate, channels, samples)``.

    Defensive chunk walk: every slice is bounds-checked before unpack,
    unknown chunks are skipped with even-byte padding, and the ``fmt ``
    chunk must declare uncompressed PCM / 16-bit before ``data`` is
    interpreted. Raises ``ValueError`` on any malformation.
    """
    if len(payload) < 12 or payload[:4] != WAV_RIFF or payload[8:12] != WAV_WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        raise ValueError("truncated RIFF payload")

    rate = channels = bits = None
    pos = 12
    samples: list[int] | None = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if body_start + size > len(payload):
            raise ValueError(f"truncated {tag!r} chunk")
        body = payload[body_start : body_start + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAVE format tag {audio_fmt}")
            if channels != 1:
                # Interleaved multi-channel PCM would be misread as mono,
                # silently corrupting sample_sum / zero-crossing features.
                raise ValueError(f"unsupported channel count {channels}")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
        elif tag == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            if size % 2:
                raise ValueError("odd PCM16 data length")
            samples = list(struct.unpack_from(f"<{size // 2}h", body))
        pos = body_start + size + (size & 1)  # RIFF even-byte padding
    if samples is None or rate is None or channels is None:
        raise ValueError("missing fmt or data chunk")
    return rate, channels, samples


def zero_crossings(samples: list[int]) -> int:
    """Sign changes (negative <-> non-negative) between adjacent samples."""
    return sum(
        1
        for a, b in zip(samples, samples[1:])
        if (a < 0) != (b < 0)
    )
