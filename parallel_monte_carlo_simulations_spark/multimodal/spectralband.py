"""Audio spectral-band features over REAL-decoded PCM (round 10).

The audio leg of the feature-extraction surface every multimodal
training pipeline needs: per clip, DFT power at the first M frequency
bins of a fixed 128-sample analysis window, the dominant bin (pitch
class proxy), and its share of total energy — the minimal spectral
fingerprint used for clustering/dedup of audio corpora.

Pipeline: synthesize real RIFF/WAVE payloads -> decode with the
stdlib-only chunk-walk codec (``decode_audio``) inside Arrow-batched
``mapInPandas``, emitting one row per sample of the analysis window ->
broadcast x M-bin dimension -> one grouped DFT aggregate per (doc, bin)
— the q_ts_periodogram dataflow pointed at decoded media instead of an
event rollup, zero shuffle before the per-doc aggregation.

Cross-engine float discipline (spectral.py): angles come from exact
integers via (m*i) mod 128 with one mirrored literal-pi expression, so
both engines call cos/sin on bit-identical doubles; the per-bin power
normalizes by the EXACT integer window energy before rounding to 5 dp.
The dominant-bin argmax orders on the ROUNDED share with bin tie-break.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .media import decode_audio, spread

_WIN = 128  #: analysis window (samples); every synth clip has >= 200
_M = 8  #: DFT bins 1.._M
_TWO_PI = 2.0 * math.pi


def _window_samples_batch(batches: Iterator) -> Iterator:
    """Synth + REAL decode, one row per sample of the analysis window."""
    import pandas as pd

    from .wav import synth_wav

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            _rate, _ch, samples = decode_audio(synth_wav(int(doc_id)))
            rows.extend(
                (int(doc_id), i, int(s))
                for i, s in enumerate(samples[:_WIN])
            )
        yield pd.DataFrame(rows, columns=["doc_id", "i", "s"])


_QAUDIOBANDS_ORACLE = f"""
WITH docs AS (
  SELECT doc_id FROM documents WHERE doc_id % 3 = 1
),
samp AS (
  SELECT d.doc_id, i.i,
         ((d.doc_id * 31 + i.i * 17) % 2001) - 1000 AS s
  FROM docs d, LATERAL (SELECT unnest(range(0, {_WIN})) AS i) i
),
energy AS (
  SELECT doc_id, CAST(SUM(s * s) AS BIGINT) AS e FROM samp GROUP BY doc_id
),
bins AS (SELECT UNNEST(generate_series(1, {_M})) AS m),
terms AS (
  SELECT samp.doc_id, bins.m,
         CAST(samp.s AS DOUBLE)
           * COS(((2 * 3.141592653589793)
                  * CAST((bins.m * samp.i) % {_WIN} AS DOUBLE))
                 / CAST({_WIN} AS DOUBLE)) AS tc,
         CAST(samp.s AS DOUBLE)
           * SIN(((2 * 3.141592653589793)
                  * CAST((bins.m * samp.i) % {_WIN} AS DOUBLE))
                 / CAST({_WIN} AS DOUBLE)) AS ts
  FROM samp CROSS JOIN bins
),
spec AS (
  SELECT t.doc_id, t.m,
         FLOOR(((POW(SUM(t.tc), 2) + POW(SUM(t.ts), 2))
               / ({_WIN} * CAST(e.e AS DOUBLE))) * 1e5 + 0.5) / 1e5 AS share
  FROM terms t JOIN energy e ON t.doc_id = e.doc_id
  GROUP BY t.doc_id, t.m, e.e
),
dom AS (
  SELECT doc_id, m, share FROM (
    SELECT doc_id, m, share,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY share DESC, m ASC) AS rn
    FROM spec
  ) WHERE rn = 1
)
SELECT d.doc_id,
       CAST(e.e AS BIGINT) AS window_energy,
       CAST(d.m AS INTEGER) AS dominant_bin,
       d.share AS dominant_share
FROM dom d JOIN energy e ON d.doc_id = e.doc_id
ORDER BY d.doc_id
"""


@register(
    "q_multimodal_audio_bands",
    oracle=_QAUDIOBANDS_ORACLE,
    description=(
        f"spectral-band fingerprint over REAL-decoded PCM: DFT power at "
        f"bins 1..{_M} of a {_WIN}-sample window per clip, dominant bin "
        "and its exact-energy-normalized share — the periodogram "
        "dataflow pointed at decoded audio, zero shuffle before the "
        "per-doc aggregate"
    ),
    tags=("multimodal", "audio", "spectral", "codec", "mapInPandas"),
)
def q_multimodal_audio_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    auds = spread(d.filter(F.col("doc_id") % 3 == 1).select("doc_id"))
    samp = auds.mapInPandas(
        _window_samples_batch, schema="doc_id long, i int, s long"
    )
    energy = samp.groupBy("doc_id").agg(
        F.sum(F.col("s") * F.col("s")).cast("long").alias("e")
    )
    bins = spark.range(1, _M + 1).select(F.col("id").alias("m"))
    angle = (
        F.lit(_TWO_PI)
        * ((F.col("m") * F.col("i")) % _WIN).cast("double")
        / F.lit(_WIN).cast("double")
    )
    terms = samp.crossJoin(F.broadcast(bins)).select(
        "doc_id",
        "m",
        (F.col("s").cast("double") * F.cos(angle)).alias("tc"),
        (F.col("s").cast("double") * F.sin(angle)).alias("ts"),
    )
    spec = (
        terms.groupBy("doc_id", "m")
        .agg(F.sum("tc").alias("sc"), F.sum("ts").alias("ss"))
        .join(energy, "doc_id")
        .select(
            "doc_id",
            "m",
            (F.floor(((F.pow(F.col("sc"), 2) + F.pow(F.col("ss"), 2))
                / (F.lit(_WIN) * F.col("e").cast("double"))) * 1e5 + 0.5) / 1e5).alias("share"),
        )
    )
    dom = spec.groupBy("doc_id").agg(
        F.max(F.struct(F.col("share"), (-F.col("m")).alias("negm"))).alias(
            "best"
        )
    )
    return (
        dom.join(energy, "doc_id")
        .select(
            "doc_id",
            F.col("e").cast("long").alias("window_energy"),
            (-F.col("best.negm")).cast("int").alias("dominant_bin"),
            F.col("best.share").alias("dominant_share"),
        )
        .orderBy("doc_id")
    )
