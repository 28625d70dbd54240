"""Content-defined chunking (CDC) dedup accounting (round 10).

Fixed-width segments (``q_dedup_segment_lines``) break on insertion: one
added token shifts every later boundary and no downstream segment
matches again. Content-defined chunking — the primitive under rsync,
LBFS, and every dedup storage engine (FastCDC et al.) — places
boundaries where a ROLLING HASH of the local content hits a mask, so an
edit only disturbs the chunk it lands in and duplicate detection
recovers immediately after.

Construction (all exact integers, identical cross-engine):

- per-token hash: first 8 hex digits of md5(token) mod 1000003;
- Karp-Rabin window over the last 4 tokens, base 31:
  rh = (th + 31*lag1 + 961*lag2 + 29791*lag3) mod 1000003;
- boundary BEFORE position p when p >= 3 and rh % 16 == 0 (the masked
  token starts the new chunk: the running boundary count's frame ends
  at CURRENT ROW, so the increment lands on p itself; expected chunk
  length 16 tokens, measured ~12.6 on this corpus);
- chunk id = running boundary count (one ordered window per doc);
- chunk fingerprint = md5 of the order-joined chunk tokens.

Accounting mirrors the segment-line screen: global chunk document
frequencies via one fingerprint-keyed groupBy, merge-pinned join back,
per-source duplicated-occurrence shares.

Scale: the rolling window partitions by doc (documents are KB-sized —
no cross-doc state), then one hash-partitioned groupBy + one join.
Linear in tokens, zero pairwise work — like segment lines, this is the
screen that runs BEFORE any quadratic candidate generation at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_P = 1_000_003  #: rolling-hash modulus (prime)
_MASK = 16  #: boundary when rh % _MASK == 0 -> expected chunk ~16 tokens

_QCDC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, t.pos - 1 AS pos, t.tok
  FROM documents,
  LATERAL (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS tok,
                  generate_subscripts(
                    list_filter(string_split(text, ' '), x -> x <> ''), 1)
                    AS pos) t
),
h AS (
  SELECT doc_id, source, pos, tok,
         CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {_P} AS th
  FROM toks
),
roll AS (
  SELECT doc_id, source, pos, tok,
         (th
          + 31 * COALESCE(LAG(th, 1) OVER w, 0)
          + 961 * COALESCE(LAG(th, 2) OVER w, 0)
          + 29791 * COALESCE(LAG(th, 3) OVER w, 0)) % {_P} AS rh
  FROM h
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
chunks AS (
  SELECT doc_id, source, pos, tok,
         SUM(CASE WHEN pos >= 3 AND rh % {_MASK} = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_id
  FROM roll
),
cagg AS (
  SELECT doc_id, source, chunk_id,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS ch,
         CAST(COUNT(*) AS BIGINT) AS clen
  FROM chunks GROUP BY doc_id, source, chunk_id
),
df AS (
  SELECT ch, CAST(COUNT(*) AS BIGINT) AS occ,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndocs
  FROM cagg GROUP BY ch
)
SELECT c.source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(c.clen) AS BIGINT) AS n_tokens,
       FLOOR((CAST(SUM(c.clen) AS DOUBLE) / COUNT(*)) * 1e4 + 0.5) / 1e4 AS avg_chunk_len,
       CAST(COUNT(*) FILTER (WHERE d.occ >= 2) AS BIGINT)
         AS dup_occurrences,
       CAST(COUNT(*) FILTER (WHERE d.ndocs >= 2) AS BIGINT)
         AS xdoc_dup_occurrences,
       FLOOR((CAST(SUM(CASE WHEN d.ndocs >= 2 THEN c.clen ELSE 0 END)
                  AS DOUBLE) / SUM(c.clen)) * 1e6 + 0.5) / 1e6 AS xdoc_dup_token_share
FROM cagg c JOIN df d ON c.ch = d.ch
GROUP BY c.source
"""


@register(
    "q_dedup_cdc_chunks",
    oracle=_QCDC_ORACLE,
    description=(
        "content-defined chunking dedup accounting: Karp-Rabin rolling "
        f"hash over 4-token windows, boundary at rh % {_MASK} == 0 "
        "(insertion-robust, unlike fixed-width segments), md5 chunk "
        "fingerprints, per-source duplicated-chunk counts and token "
        "shares — the rsync/FastCDC primitive as one window + two "
        "shuffles, zero pairwise work"
    ),
    tags=("dedup", "cdc", "chunking", "curation", "llm-pipeline", "scale"),
)
def q_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    h = toks.withColumn(
        "th",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % _P,
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    roll = h.withColumn(
        "rh",
        (
            F.col("th")
            + 31 * F.lag("th", 1, 0).over(w)
            + 961 * F.lag("th", 2, 0).over(w)
            + 29791 * F.lag("th", 3, 0).over(w)
        )
        % _P,
    )
    chunks = roll.withColumn(
        "chunk_id",
        F.sum(
            F.when((F.col("pos") >= 3) & (F.col("rh") % _MASK == 0), 1)
            .otherwise(0)
        ).over(w),
    )
    cagg = (
        chunks.groupBy("doc_id", "source", "chunk_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("ch"),
            F.count("*").cast("long").alias("clen"),
        )
    )
    df_tbl = cagg.groupBy("ch").agg(
        F.count("*").cast("long").alias("occ"),
        F.countDistinct("doc_id").cast("long").alias("ndocs"),
    )
    joined = cagg.join(df_tbl.hint("merge"), "ch")
    return joined.groupBy("source").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("clen").cast("long").alias("n_tokens"),
        (F.floor((F.sum("clen").cast("double") / F.count("*")) * 1e4 + 0.5) / 1e4).alias(
            "avg_chunk_len"
        ),
        F.count(F.when(F.col("occ") >= 2, 1)).cast("long").alias(
            "dup_occurrences"
        ),
        F.count(F.when(F.col("ndocs") >= 2, 1)).cast("long").alias(
            "xdoc_dup_occurrences"
        ),
        (F.floor((F.sum(F.when(F.col("ndocs") >= 2, F.col("clen")).otherwise(0))
            .cast("double")
            / F.sum("clen")) * 1e6 + 0.5) / 1e6).alias("xdoc_dup_token_share"),
    )
