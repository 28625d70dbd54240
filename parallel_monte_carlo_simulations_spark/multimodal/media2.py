"""Registered queries for the round-4 codec additions (BMP, mu-law).

Same architecture as :mod:`.media`: synthesize real binary payloads in
one Arrow-batched narrow map, decode them in another, and emit features
whose DuckDB oracle recomputes everything from the synthesis closed
form — a hash match proves the byte-level codecs round-tripped exactly.
Both stages are ``mapInPandas`` over an opaque ``binary`` column: zero
shuffle, embarrassingly parallel, the 100 TB shape for media corpora.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .media import spread
from .mulaw import sql_decoded_closed_form

# --------------------------------------------------------------------------
# BMP: synth → decode → per-channel pixel sums.
# --------------------------------------------------------------------------

_BMP_SCHEMA = (
    "doc_id long, width int, height int, r_sum long, g_sum long, b_sum long"
)


def _bmp_batch(batches: Iterator) -> Iterator:
    import pandas as pd

    from .bmp import decode_bmp, synth_bmp

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            payload = synth_bmp(int(doc_id))
            w, h, pixels = decode_bmp(payload)
            rows.append(
                (
                    int(doc_id),
                    w,
                    h,
                    sum(p[0] for p in pixels),
                    sum(p[1] for p in pixels),
                    sum(p[2] for p in pixels),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "r_sum", "g_sum", "b_sum"]
        )


_QBMP_ORACLE = """
WITH docs AS (
  SELECT doc_id, 8 + (doc_id % 9) AS w, 6 + (doc_id % 7) AS h
  FROM documents WHERE doc_id % 4 = 3
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (d.doc_id + 7 * x.x + 13 * y.y) % 256     AS r,
         (3 * d.doc_id + 5 * x.x + 11 * y.y) % 256 AS g,
         (9 * d.doc_id + 2 * x.x + 3 * y.y) % 256  AS b
  FROM docs d,
       LATERAL (SELECT unnest(range(0, d.w)) AS x) x,
       LATERAL (SELECT unnest(range(0, d.h)) AS y) y
)
SELECT doc_id,
       CAST(w AS INTEGER)      AS width,
       CAST(h AS INTEGER)      AS height,
       CAST(SUM(r) AS BIGINT)  AS r_sum,
       CAST(SUM(g) AS BIGINT)  AS g_sum,
       CAST(SUM(b) AS BIGINT)  AS b_sum
FROM px
GROUP BY doc_id, w, h
"""


@register(
    "q_multimodal_bmp_decode",
    oracle=_QBMP_ORACLE,
    description=(
        "REAL image decode: synthesize 24-bit bottom-up BGR BMP payloads "
        "(4-byte row padding), decode via the stdlib-only codec, emit "
        "per-channel pixel sums; oracle replays the closed form per pixel"
    ),
    tags=("multimodal", "binary", "image", "bmp", "codec", "mapInPandas"),
)
def q_multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A shifted, flipped, or pad-misaligned read changes the channel
    sums, so the oracle match certifies bottom-up + BGR + padding were
    all undone correctly. Cites the reference's trace-batch shape
    (``parallel_simulations.py:75-98``) only by contrast: media payloads
    stay columnar binary end to end here."""
    d = table(spark, sf_dir, "documents")
    imgs = spread(d.filter(F.col("doc_id") % 4 == 3).select("doc_id"))
    return imgs.mapInPandas(_bmp_batch, schema=_BMP_SCHEMA)


# --------------------------------------------------------------------------
# mu-law: synth PCM16 → compand to bytes → expand → quantization features.
# --------------------------------------------------------------------------

_MULAW_SCHEMA = (
    "doc_id long, n_samples int, decoded_sum long, quant_err_sum long, "
    "max_abs_err int"
)


def _mulaw_batch(batches: Iterator) -> Iterator:
    import pandas as pd

    from .mulaw import decode_mulaw, encode_mulaw, synth_samples

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            pcm = synth_samples(int(doc_id))
            payload = encode_mulaw(pcm)  # the 8-bit wire format
            dec = decode_mulaw(payload)
            errs = [abs(a - b) for a, b in zip(pcm, dec)]
            rows.append(
                (int(doc_id), len(pcm), sum(dec), sum(errs), max(errs))
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_samples", "decoded_sum", "quant_err_sum",
                "max_abs_err",
            ],
        )


_MULAW_DEC = sql_decoded_closed_form("s.s")

_QMULAW_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, 160 + (doc_id % 19) * 16 AS n
  FROM documents WHERE doc_id % 3 = 2
),
samples AS (
  SELECT d.doc_id, d.n,
         ((d.doc_id * 37 + i.i * 29) % 16001) - 8000 AS s
  FROM docs d, LATERAL (SELECT unnest(range(0, d.n)) AS i) i
),
dec AS (
  SELECT doc_id, n, s.s AS s, {_MULAW_DEC} AS d
  FROM samples s
)
SELECT doc_id,
       CAST(n AS INTEGER)               AS n_samples,
       CAST(SUM(d) AS BIGINT)           AS decoded_sum,
       CAST(SUM(abs(s - d)) AS BIGINT)  AS quant_err_sum,
       CAST(MAX(abs(s - d)) AS INTEGER) AS max_abs_err
FROM dec
GROUP BY doc_id, n
"""


@register(
    "q_multimodal_mulaw_roundtrip",
    oracle=_QMULAW_ORACLE,
    description=(
        "REAL telephony codec: compand PCM16 to G.711 mu-law bytes and "
        "expand back distributed; oracle replays the full spec transfer "
        "function (segment ladder + biased expansion) in SQL"
    ),
    tags=("multimodal", "binary", "audio", "mulaw", "codec", "mapInPandas"),
)
def q_multimodal_mulaw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    auds = spread(d.filter(F.col("doc_id") % 3 == 2).select("doc_id"))
    return auds.mapInPandas(_mulaw_batch, schema=_MULAW_SCHEMA)
