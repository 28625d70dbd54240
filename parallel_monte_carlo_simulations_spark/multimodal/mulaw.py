"""Real telephony-audio companding: a self-contained G.711 mu-law codec.

G.711 mu-law is the 8-bit logarithmic PCM format of classic telephony
(and a common ingest format for call-center/voice corpora). This module
implements the standard compand/expand pair from the spec math —
stdlib-only, no audio libraries — and the registered query runs the
full round trip distributed: synthesize PCM16, compand each sample to
one mu-law byte (the payload), expand back, and emit per-doc
quantization features.

Oracle story (same discipline as the WAV/PNG/JPEG codecs): synthesis is
a closed form, and mu-law encode+decode is pure integer arithmetic —
exponent segment selection, mantissa extraction, biased expansion — so
the DuckDB oracle replays the ENTIRE codec per sample in SQL (CASE
ladder for the segment, integer div/mod for the mantissa) without any
binary payloads. A hash match proves the distributed byte-level codec
computes exactly the spec transfer function.

Synthesis closed form (what the oracle replays):

- ``n_samples = 160 + (doc_id % 19) * 16``  (one-plus 20ms frames @8kHz)
- ``s[i] = ((doc_id * 37 + i * 29) % 16001) - 8000``  (int16 PCM,
  spanning several mu-law exponent segments in both signs)

At 100 TB: payloads are an opaque ``binary`` column; compand and expand
are Arrow-batched ``mapInPandas`` narrow maps — zero shuffle.
"""

from __future__ import annotations

BIAS = 0x84  # 132
CLIP = 32635


def synth_n_samples(doc_id: int) -> int:
    return 160 + (doc_id % 19) * 16


def synth_samples(doc_id: int) -> list[int]:
    """Closed-form PCM16 samples the DuckDB oracle recomputes."""
    return [
        ((doc_id * 37 + i * 29) % 16001) - 8000
        for i in range(synth_n_samples(doc_id))
    ]


def encode_mulaw_sample(s: int) -> int:
    """Compand one linear PCM16 sample to its G.711 mu-law byte."""
    sign = 0x80 if s < 0 else 0
    mag = min(-s if s < 0 else s, CLIP) + BIAS
    exp = 7
    mask = 0x4000
    while exp > 0 and not (mag & mask):
        exp -= 1
        mask >>= 1
    mantissa = (mag >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mantissa) & 0xFF


def decode_mulaw_sample(b: int) -> int:
    """Expand one mu-law byte back to linear PCM (spec inverse)."""
    b = ~b & 0xFF
    sign = b & 0x80
    exp = (b >> 4) & 0x07
    mantissa = b & 0x0F
    mag = (((mantissa << 3) + BIAS) << exp) - BIAS
    return -mag if sign else mag


def encode_mulaw(samples: list[int]) -> bytes:
    return bytes(encode_mulaw_sample(s) for s in samples)


def decode_mulaw(payload: bytes) -> list[int]:
    return [decode_mulaw_sample(b) for b in payload]


def sql_decoded_closed_form(s: str) -> str:
    """DuckDB SQL expression: the mu-law round trip of linear sample
    expression ``s`` — encode (segment CASE ladder + mantissa) fused
    with decode (biased expansion), all integer arithmetic."""
    mag = f"(least(abs({s}), {CLIP}) + {BIAS})"
    exp = (
        "(CASE "
        + " ".join(
            f"WHEN {mag} >= {1 << (e + 7)} THEN {e}" for e in range(7, 0, -1)
        )
        + " ELSE 0 END)"
    )
    mant = f"(({mag} // (8 * (1 << {exp}))) % 16)"
    dec_mag = f"((({mant} * 8 + {BIAS}) * (1 << {exp})) - {BIAS})"
    return f"(CASE WHEN {s} < 0 THEN -{dec_mag} ELSE {dec_mag} END)"
