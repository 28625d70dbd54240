"""SAX symbolic aggregate approximation (Lin et al. 2003) (round 10).

The time-series-mining representation behind motif discovery, anomaly
grammars, and series indexing: reduce a numeric series to a short
SYMBOL string (here an 8-character a/b/c word per event type) via
piecewise aggregation + breakpoint quantization, so downstream work is
string matching instead of numeric distance.

Exact-integer variant (no z-normalization float drift): the series is
the ZERO-FILLED daily cent total of each event type's first 64 days;
PAA segments are exact 8-day cent sums; breakpoints are the RANK-based
terciles of each type's own 8 segment sums (3rd and 6th order
statistic — pure integer comparisons, per-type adaptive like classic
SAX's z-normalization but deterministic cross-engine); symbols compare
segment sums against the two breakpoints.

Scale: one daily rollup (map-side combinable), then everything is
(types x 8) rows. The word assembles with an order-pinned join of the
symbol structs — no collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Analysis span from each type's first day. The driver testdata spans
#: 30 days at every SF, so 24 days / 3-day segments keeps all 8
#: segments inside real data (a span-overrunning window degenerates:
#: trailing all-zero segments tie and the word collapses — observed
#: with a 64-day window before this was sized to the data).
_DAYS = 24
_W = 3  #: PAA window (days) -> 8 segments -> 8-char word

_QSAX_ORACLE = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(d) AS d0 FROM daily GROUP BY event_type
),
spine AS (
  SELECT b.event_type, b.d0, g.rn
  FROM bounds b, LATERAL (SELECT unnest(range(0, {_DAYS})) AS rn) g
),
grid AS (
  SELECT sp.event_type, sp.rn // {_W} AS seg,
         COALESCE(dl.cents, 0) AS cents
  FROM spine sp
  LEFT JOIN daily dl
    ON dl.event_type = sp.event_type AND dl.d = sp.rn + sp.d0
),
paa AS (
  SELECT event_type, seg, CAST(SUM(cents) AS BIGINT) AS s
  FROM grid GROUP BY event_type, seg
),
ranked AS (
  SELECT event_type, seg, s,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY s, seg) AS rk
  FROM paa
),
bp AS (
  SELECT event_type,
         MAX(CASE WHEN rk = 3 THEN s END) AS b1,
         MAX(CASE WHEN rk = 6 THEN s END) AS b2
  FROM ranked GROUP BY event_type
),
sym AS (
  SELECT p.event_type, p.seg, p.s,
         CASE WHEN p.s < bp.b1 THEN 'a'
              WHEN p.s < bp.b2 THEN 'b'
              ELSE 'c' END AS sym
  FROM paa p JOIN bp ON bp.event_type = p.event_type
)
SELECT event_type,
       string_agg(sym, '' ORDER BY seg) AS sax_word,
       CAST(MIN(s) AS BIGINT) AS min_segment_cents,
       CAST(MAX(s) AS BIGINT) AS max_segment_cents
FROM sym
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_ts_sax_words",
    oracle=_QSAX_ORACLE,
    description=(
        f"SAX symbolic aggregation: zero-filled first-{_DAYS}-day cent "
        f"series per event type -> {_DAYS // _W} exact PAA segment sums "
        "-> rank-tercile breakpoints (pure integer order statistics) -> "
        "8-char a/b/c word — the series-to-string reduction behind "
        "motif mining and symbolic anomaly detection"
    ),
    tags=("timeseries", "sax", "symbolic", "window", "aggregate"),
)
def q_ts_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) DIV 86400000000").alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    bounds = daily.groupBy("event_type").agg(F.min("d").alias("d0"))
    grid = (
        bounds.select(
            "event_type",
            "d0",
            F.explode(F.sequence(F.lit(0), F.lit(_DAYS - 1))).alias("rn"),
        )
        .join(
            daily.select(
                F.col("event_type").alias("et"),
                F.col("d").alias("dd"),
                "cents",
            ).hint("merge"),
            (F.col("et") == F.col("event_type"))
            & (F.col("dd") == F.col("rn") + F.col("d0")),
            "left",
        )
        .select(
            "event_type",
            F.expr(f"rn div {_W}").alias("seg"),
            F.coalesce(F.col("cents"), F.lit(0)).alias("cents"),
        )
    )
    paa = grid.groupBy("event_type", "seg").agg(
        F.sum("cents").cast("long").alias("s")
    )
    wrk = Window.partitionBy("event_type").orderBy("s", "seg")
    ranked = paa.withColumn("rk", F.row_number().over(wrk))
    bp = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rk") == 3, F.col("s"))).alias("b1"),
        F.max(F.when(F.col("rk") == 6, F.col("s"))).alias("b2"),
    )
    sym = paa.join(F.broadcast(bp), "event_type").select(
        "event_type",
        "seg",
        "s",
        F.when(F.col("s") < F.col("b1"), "a")
        .when(F.col("s") < F.col("b2"), "b")
        .otherwise("c")
        .alias("sym"),
    )
    return (
        sym.groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                    lambda x: x["sym"],
                ),
                "",
            ).alias("sax_word"),
            F.min("s").cast("long").alias("min_segment_cents"),
            F.max("s").cast("long").alias("max_segment_cents"),
        )
        .orderBy("event_type")
    )
