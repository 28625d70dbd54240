"""Image box filter as relational windows — 2-D neighborhood compute
over REAL-decoded pixels, no imaging library.

The separable-filter identity every image pipeline uses (box blur,
SSD/NCC pre-passes, integral-image features): a 3x3 box sum is a
1-D sliding sum along x followed by a 1-D sliding sum along y. Both
passes are plain window frames over the (doc, y | x)-partitioned pixel
table, so the whole filter runs as two narrow shuffles — the shape that
holds when "image" means a billion tiles across a cluster, because each
pass co-partitions by (doc, row) or (doc, col) and never materializes a
dense matrix per executor.

Pipeline: synthesize real 24-bit BMP payloads -> decode them with the
stdlib codec (``bmp.decode_bmp``) inside Arrow-batched ``mapInPandas``,
emitting one row per pixel (doc_id, x, y, lum) with lum = r + g + b ->
two window passes -> per-image interior box-sum checksums. The DuckDB
oracle replays the synthesis closed form per pixel and runs the
IDENTICAL two-pass window arithmetic — integer-exact end to end, so a
hash match certifies both the byte-level decode and the 2-D window
plumbing.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .media import spread

_PX_SCHEMA = "doc_id long, x int, y int, lum long"


def _pixel_batch(batches: Iterator) -> Iterator:
    import pandas as pd

    from .bmp import decode_bmp, synth_bmp

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            payload = synth_bmp(int(doc_id))
            w, h, pixels = decode_bmp(payload)
            for i, (r, g, b) in enumerate(pixels):
                rows.append((int(doc_id), i % w, i // w, r + g + b))
        yield pd.DataFrame(rows, columns=["doc_id", "x", "y", "lum"])


_QBOX_ORACLE = """
WITH docs AS (
  SELECT doc_id, 8 + (doc_id % 9) AS w, 6 + (doc_id % 7) AS h
  FROM documents WHERE doc_id % 4 = 3
),
px AS (
  SELECT d.doc_id, d.w, d.h, x.x, y.y,
         ((d.doc_id + 7 * x.x + 13 * y.y) % 256
          + (3 * d.doc_id + 5 * x.x + 11 * y.y) % 256
          + (9 * d.doc_id + 2 * x.x + 3 * y.y) % 256) AS lum
  FROM docs d,
       LATERAL (SELECT unnest(range(0, d.w)) AS x) x,
       LATERAL (SELECT unnest(range(0, d.h)) AS y) y
),
rowsum AS (
  SELECT doc_id, w, h, x, y,
         SUM(lum) OVER (PARTITION BY doc_id, y ORDER BY x
                        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS rs
  FROM px
),
box AS (
  SELECT doc_id, w, h, x, y,
         SUM(rs) OVER (PARTITION BY doc_id, x ORDER BY y
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS bs
  FROM rowsum
)
SELECT doc_id,
       CAST(ANY_VALUE(w) AS INTEGER) AS width,
       CAST(ANY_VALUE(h) AS INTEGER) AS height,
       CAST(SUM(bs) AS BIGINT) AS box_total,
       CAST(MAX(bs) AS BIGINT) AS box_max
FROM box
WHERE x >= 1 AND x <= w - 2 AND y >= 1 AND y <= h - 2
GROUP BY doc_id
"""


@register(
    "q_multimodal_box_filter",
    oracle=_QBOX_ORACLE,
    description=(
        "3x3 box filter over REAL-decoded BMP pixels as two separable "
        "sliding-window passes (x then y, co-partitioned by (doc,row)/"
        "(doc,col)) — interior box-sum checksums, integer-exact oracle "
        "replaying the synthesis closed form"
    ),
    tags=("multimodal", "image", "filter", "window", "mapInPandas"),
)
def q_multimodal_box_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    imgs = spread(d.filter(F.col("doc_id") % 4 == 3).select("doc_id"))
    px = imgs.mapInPandas(_pixel_batch, schema=_PX_SCHEMA)
    dims = px.groupBy("doc_id").agg(
        (F.max("x") + 1).cast("int").alias("w"),
        (F.max("y") + 1).cast("int").alias("h"),
    )
    px = px.join(dims, "doc_id")
    wx = Window.partitionBy("doc_id", "y").orderBy("x").rowsBetween(-1, 1)
    wy = Window.partitionBy("doc_id", "x").orderBy("y").rowsBetween(-1, 1)
    box = px.withColumn("rs", F.sum("lum").over(wx)).withColumn(
        "bs", F.sum("rs").over(wy)
    )
    interior = box.filter(
        (F.col("x") >= 1)
        & (F.col("x") <= F.col("w") - 2)
        & (F.col("y") >= 1)
        & (F.col("y") <= F.col("h") - 2)
    )
    return interior.groupBy("doc_id").agg(
        F.any_value("w").cast("int").alias("width"),
        F.any_value("h").cast("int").alias("height"),
        F.sum("bs").cast("long").alias("box_total"),
        F.max("bs").cast("long").alias("box_max"),
    )


# ---------------------------------------------------------------------------
# Histogram equalization: per-image tone mapping as relational ops.
# ---------------------------------------------------------------------------

_QHISTEQ_ORACLE = """
WITH docs AS (
  SELECT doc_id, 8 + (doc_id % 9) AS w, 6 + (doc_id % 7) AS h
  FROM documents WHERE doc_id % 4 = 3
),
px AS (
  SELECT d.doc_id, d.w * d.h AS n_px,
         (d.doc_id + 7 * x.x + 13 * y.y) % 256 AS r
  FROM docs d,
       LATERAL (SELECT unnest(range(0, d.w)) AS x) x,
       LATERAL (SELECT unnest(range(0, d.h)) AS y) y
),
hist AS (
  SELECT doc_id, n_px, r, COUNT(*) AS c
  FROM px GROUP BY doc_id, n_px, r
),
cdf0 AS (
  SELECT doc_id, n_px, r, c,
         SUM(c) OVER (PARTITION BY doc_id ORDER BY r) AS cum
  FROM hist
),
cdf AS (
  SELECT doc_id, n_px, r, c, cum,
         MIN(cum) OVER (PARTITION BY doc_id) AS cdf_min
  FROM cdf0
),
mapped AS (
  SELECT doc_id, r, c,
         CASE WHEN n_px = cdf_min THEN 0
              ELSE ((cum - cdf_min) * 255 * 2 + (n_px - cdf_min))
                   // (2 * (n_px - cdf_min)) END AS new_val
  FROM cdf
)
SELECT doc_id,
       CAST(SUM(c * new_val) AS BIGINT) AS eq_sum,
       CAST(MIN(new_val) AS BIGINT) AS eq_min,
       CAST(MAX(new_val) AS BIGINT) AS eq_max,
       CAST(COUNT(*) AS BIGINT) AS n_levels
FROM mapped
GROUP BY doc_id
"""


@register(
    "q_multimodal_hist_equalization",
    oracle=_QHISTEQ_ORACLE,
    description=(
        "histogram equalization over REAL-decoded pixels as relational "
        "ops: per-image histogram groupBy, CDF window cumsum, half-up "
        "integer tone map ((cum-cdfmin)*255 / (n-cdfmin)) — per-image "
        "equalized checksums, integer-exact both engines"
    ),
    tags=("multimodal", "image", "histogram", "window", "mapInPandas"),
)
def q_multimodal_hist_equalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tone-mapping normalization every vision preprocessing stack
    applies, expressed without an imaging library: histogram = groupBy,
    CDF = one ordered window per image, the 0..255 remap = pure integer
    half-up division (the changepoint.py div discipline — decimal/double
    ROUND ties disagree cross-engine). State per image is O(256 levels),
    never O(pixels), after the first groupBy."""
    d = table(spark, sf_dir, "documents")
    imgs = spread(d.filter(F.col("doc_id") % 4 == 3).select("doc_id"))
    px = imgs.mapInPandas(_red_batch, schema="doc_id long, r int")
    counts = px.groupBy("doc_id").agg(F.count("*").alias("n_px"))
    hist = (
        px.groupBy("doc_id", "r")
        .agg(F.count("*").alias("c"))
        .join(counts, "doc_id")
    )
    wc = Window.partitionBy("doc_id").orderBy("r")
    wdoc = Window.partitionBy("doc_id")
    cdf = hist.withColumn("cum", F.sum("c").over(wc)).withColumn(
        "cdf_min", F.min("cum").over(wdoc)
    )
    mapped = cdf.withColumn(
        "new_val",
        F.when(F.col("n_px") == F.col("cdf_min"), F.lit(0)).otherwise(
            F.expr(
                "((cum - cdf_min) * 255 * 2 + (n_px - cdf_min))"
                " div (2 * (n_px - cdf_min))"
            )
        ),
    )
    return mapped.groupBy("doc_id").agg(
        F.sum(F.col("c") * F.col("new_val")).cast("long").alias("eq_sum"),
        F.min("new_val").cast("long").alias("eq_min"),
        F.max("new_val").cast("long").alias("eq_max"),
        F.count("*").cast("long").alias("n_levels"),
    )


def _red_batch(batches: Iterator) -> Iterator:
    """Real decode, red channel only — one row per pixel."""
    import pandas as pd

    from .bmp import decode_bmp, synth_bmp

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            w, h, pixels = decode_bmp(synth_bmp(int(doc_id)))
            rows.extend((int(doc_id), p[0]) for p in pixels)
        yield pd.DataFrame(rows, columns=["doc_id", "r"])
