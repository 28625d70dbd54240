"""IMA ADPCM (DVI4) audio codec: 4:1 compression with sequential state.

Where G.711 mu-law (``mulaw.py``) is memoryless — each sample companding
independently — IMA ADPCM is the classic STATEFUL audio codec (WAV
``wFormatTag=0x11``, DVI4 RTP payload): each 16-bit sample becomes a
4-bit nibble via an adaptive quantizer whose step size walks an 89-entry
table driven by the previous nibble. That sequential dependency is the
interesting part here: the oracle cannot unnest per-sample like mulaw's
— it must REPLAY the encoder state machine (predictor, step index) with
a recursive CTE joined to the step table, one recursion level per
sample, all documents advancing in lockstep.

Codec convention (documented, mirrored in both engines): initial
predictor 0, initial step index 0, encode every sample; the decoder's
reconstruction equals the encoder's running predictor, so one replay
produces both streams. Everything is integer arithmetic — bit tests
against halved steps, clamps to [-32768, 32767] and [0, 88] — so the
hash match is exact with no float discipline needed.

Scale design: encode/decode is an Arrow-batched ``mapInPandas`` narrow
map — zero shuffle, embarrassingly parallel per document, the same
plumbing the other codecs use for 100 TB binary columns. The recursion
exists ONLY oracle-side (n_docs x n_samples rows at oracle SF); the
engine side is O(samples) per doc.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .media import spread

#: Standard IMA ADPCM step-size table (89 entries).
STEP_TABLE: tuple[int, ...] = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)

#: Index adjustment by nibble magnitude (bits 0-2): -1 for small codes,
#: +2/+4/+6/+8 for the four large ones.
INDEX_TABLE: tuple[int, ...] = (-1, -1, -1, -1, 2, 4, 6, 8)


def synth_n_samples(doc_id: int) -> int:
    return 128 + (doc_id % 17) * 24


def synth_samples(doc_id: int) -> list[int]:
    """Closed-form PCM16 the DuckDB oracle recomputes per (doc, i)."""
    return [
        ((doc_id * 53 + i * 31) % 12289) - 6144
        for i in range(synth_n_samples(doc_id))
    ]


def encode_decode(samples: list[int]) -> tuple[bytes, list[int], int, int]:
    """Encode to packed nibbles and reconstruct; returns
    (payload, reconstruction, final_predictor, final_index)."""
    pred, idx = 0, 0
    nibbles: list[int] = []
    recon: list[int] = []
    for s in samples:
        step = STEP_TABLE[idx]
        diff = s - pred
        sign = 8 if diff < 0 else 0
        ad = -diff if diff < 0 else diff
        delta = 0
        diffq = step >> 3
        if ad >= step:
            delta = 4
            ad -= step
            diffq += step
        half = step >> 1
        if ad >= half:
            delta |= 2
            ad -= half
            diffq += half
        quarter = step >> 2
        if ad >= quarter:
            delta |= 1
            diffq += quarter
        pred = pred - diffq if sign else pred + diffq
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + INDEX_TABLE[delta]))
        nibbles.append(sign | delta)
        recon.append(pred)
    payload = bytes(
        (nibbles[i] | (nibbles[i + 1] << 4)) if i + 1 < len(nibbles)
        else nibbles[i]
        for i in range(0, len(nibbles), 2)
    )
    return payload, recon, pred, idx


_ADPCM_SCHEMA = (
    "doc_id long, n_samples int, payload_bytes int, final_predictor int, "
    "final_index int, err_sum long, max_abs_err int"
)


def _adpcm_batch(batches: Iterator) -> Iterator:
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            pcm = synth_samples(int(doc_id))
            payload, recon, pred, idx = encode_decode(pcm)
            errs = [abs(a - b) for a, b in zip(pcm, recon)]
            rows.append(
                (
                    int(doc_id),
                    len(pcm),
                    len(payload),
                    pred,
                    idx,
                    sum(errs),
                    max(errs),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_samples", "payload_bytes", "final_predictor",
                "final_index", "err_sum", "max_abs_err",
            ],
        )


# The recursive replay: one level per sample index; every selected doc
# advances in the same level. All-integer state transition.
_QADPCM_ORACLE = f"""
WITH RECURSIVE steps(i, step) AS (
  SELECT * FROM (VALUES {", ".join(f"({i}, {s})" for i, s in enumerate(STEP_TABLE))}) t
),
docs AS (
  SELECT doc_id, 128 + (doc_id % 17) * 24 AS n
  FROM documents WHERE doc_id % 7 = 3
),
rec AS (
  SELECT doc_id, n, 0 AS i, 0 AS pred, 0 AS idx,
         CAST(0 AS BIGINT) AS err_sum, 0 AS max_err
  FROM docs
  UNION ALL
  SELECT r.doc_id, r.n, r.i + 1, t.new_pred, t.new_idx,
         r.err_sum + abs(t.s - t.new_pred),
         greatest(r.max_err, abs(t.s - t.new_pred))
  FROM rec r
  JOIN steps st ON st.i = r.idx,
  LATERAL (
    SELECT s, b2, b1, b0, sign_neg,
           CASE WHEN sign_neg
                THEN greatest(-32768, r.pred - diffq)
                ELSE least(32767, r.pred + diffq) END AS new_pred,
           least(88, greatest(0,
             r.idx + CASE WHEN m >= 4 THEN 2 * (m - 3) ELSE -1 END))
             AS new_idx
    FROM (
      SELECT s, sign_neg, b2, b1, b0,
             4 * b2 + 2 * b1 + b0 AS m,
             (st.step // 8) + b2 * st.step + b1 * (st.step // 2)
               + b0 * (st.step // 4) AS diffq
      FROM (
        SELECT s, sign_neg, b2, b1,
               CASE WHEN ad - b2 * st.step - b1 * (st.step // 2)
                         >= st.step // 4 THEN 1 ELSE 0 END AS b0
        FROM (
          SELECT s, sign_neg, b2,
                 CASE WHEN ad - b2 * st.step >= st.step // 2
                      THEN 1 ELSE 0 END AS b1,
                 ad
          FROM (
            SELECT s, sign_neg,
                   CASE WHEN ad >= st.step THEN 1 ELSE 0 END AS b2, ad
            FROM (
              SELECT s, s - r.pred < 0 AS sign_neg,
                     abs(s - r.pred) AS ad
              FROM (
                SELECT ((r.doc_id * 53 + r.i * 31) % 12289) - 6144 AS s
              )
            )
          )
        )
      )
    )
  ) t
  WHERE r.i < r.n
)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_samples,
       CAST((n + 1) // 2 AS INTEGER) AS payload_bytes,
       CAST(pred AS INTEGER) AS final_predictor,
       CAST(idx AS INTEGER) AS final_index,
       err_sum,
       CAST(max_err AS INTEGER) AS max_abs_err
FROM rec WHERE i = n
"""


@register(
    "q_multimodal_adpcm_roundtrip",
    oracle=_QADPCM_ORACLE,
    description=(
        "IMA ADPCM 4-bit adaptive codec round trip distributed via "
        "mapInPandas; the oracle REPLAYS the sequential encoder state "
        "machine (predictor + 89-entry step-index walk) with a "
        "recursive CTE joined to the step table — exact integer state "
        "at every sample"
    ),
    tags=("multimodal", "binary", "audio", "adpcm", "codec", "mapInPandas"),
)
def q_multimodal_adpcm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    auds = spread(d.filter(F.col("doc_id") % 7 == 3).select("doc_id"))
    return auds.mapInPandas(_adpcm_batch, schema=_ADPCM_SCHEMA)
