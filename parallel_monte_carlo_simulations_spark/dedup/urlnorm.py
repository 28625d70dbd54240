"""URL canonicalization dedup: collapsing crawl variants of one page.

Web-crawl corpora carry the same page under many URL spellings — mixed
host case, explicit default ports, tracking parameters, fragments. The
standard first dedup pass canonicalizes the URL (lowercase host, strip
``:443``/``:80``, drop ``utm_*`` tracking params, drop the fragment)
and groups by the canonical form; it removes exact page duplicates
before any content hashing runs, purely on metadata, at scan speed
(string functions only, one aggregate — no content reads).

The documents table has no URL column, so each doc's crawl URL is
SYNTHESIZED deterministically from (doc_id, source) with the messy
variants baked in — both engines build the identical raw URLs, then
canonicalize and group, so the hash match verifies the normalization
logic itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

# Raw URL: scheme + cased host (+ default port for doc_id%3=0) + path
# bucket + optional tracking/ref query + optional fragment.
_SQL_RAW_URL = """
'https://' ||
CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END ||
'.Example.COM' ||
CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END ||
'/p/' || CAST(doc_id % 40 AS VARCHAR) ||
CASE
  WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR)
  WHEN doc_id % 4 = 1 THEN '?ref=' || CAST(doc_id % 5 AS VARCHAR)
  ELSE ''
END ||
CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END
"""

_QURL_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, source, ({_SQL_RAW_URL}) AS url FROM documents
),
canon AS (
  SELECT doc_id, url,
    lower(regexp_extract(url, '^https://([^/:?#]+)', 1))
    || regexp_extract(url, '^https://[^/:?#]+(?::443)?(/[^?#]*)', 1)
    || CASE WHEN regexp_extract(url, '[?&]ref=([0-9]+)', 1) <> ''
            THEN '?ref=' || regexp_extract(url, '[?&]ref=([0-9]+)', 1)
            ELSE '' END AS curl
  FROM raw
)
SELECT curl                                AS canonical_url,
       CAST(COUNT(*) AS BIGINT)            AS n_docs,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
       CAST(MIN(doc_id) AS BIGINT)         AS keeper_doc
FROM canon
GROUP BY curl
HAVING COUNT(*) > 1
"""


@register(
    "q_dedup_url_canonical",
    oracle=_QURL_ORACLE,
    description=(
        "URL-canonicalization dedup: lowercase host, strip default port/"
        "tracking params/fragment, group crawl variants; clusters with "
        ">1 doc and their keeper"
    ),
    tags=("dedup", "url", "canonicalization", "curation"),
)
def q_dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    raw = d.withColumn("url", F.expr(_SQL_RAW_URL.replace("VARCHAR", "STRING")))
    host = F.lower(F.regexp_extract("url", r"^https://([^/:?#]+)", 1))
    path = F.regexp_extract("url", r"^https://[^/:?#]+(?::443)?(/[^?#]*)", 1)
    ref = F.regexp_extract("url", r"[?&]ref=([0-9]+)", 1)
    canon = raw.withColumn(
        "curl",
        F.concat(
            host,
            path,
            F.when(ref != "", F.concat(F.lit("?ref="), ref)).otherwise(
                F.lit("")
            ),
        ),
    )
    return (
        canon.groupBy(F.col("curl").alias("canonical_url"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("url").cast("long").alias("n_variants"),
            F.min("doc_id").cast("long").alias("keeper_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )
