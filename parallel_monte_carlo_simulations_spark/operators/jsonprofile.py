"""JSON schema inference: discover keys and infer types from raw text.

The semi-structured ingestion primitive: given a JSON-string column of
unknown shape, report which keys exist, how often, and what type each
holds — the profiling pass that decides whether a key is promotable to
a typed column. Keys are DISCOVERED (``json_object_keys`` /
``json_keys``), not assumed; types are classified from the extracted
raw text with an anchored-regex ladder applied identically in both
engines (documented limitation, also identical: a string whose content
looks like a number classifies as numeric — type inference from text
is heuristic by nature).

The events table's ``props`` column is single-key uniform, so the
query first ENRICHES it deterministically into heterogeneous JSON
(optional keys, ints, decimals, strings, booleans, nulls, nested
objects keyed off event_id residues — the same concat expression in
both engines) and then profiles the result blind.

Scale design: one narrow projection builds the JSON, one
``explode(json_object_keys(...))`` fans each row out to its key count
(bounded by the key vocabulary), one dynamic-path extraction per
(row, key), and a single hash aggregation on (key, dtype). All
JVM-side built-ins — no UDF. Extraction parity (numbers as text,
strings unquoted, objects/arrays as JSON text, nulls as SQL NULL) is
verified across engines by the oracle itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

# The enrichment: same JSON text from both engines. Keys appear or not
# by event_id residue, covering every JSON type.
_JS_SQL = """
'{"id": ' || CAST(event_id AS STRING)
|| CASE WHEN event_id % 3 <> 0
        THEN ', "amt": '
             || CAST(CAST(floor(CAST(ROUND(value * 100, 0) AS BIGINT) / 100)
                          AS BIGINT) AS STRING)
             || '.'
             || lpad(CAST(CAST(ROUND(value * 100, 0) AS BIGINT) % 100
                          AS STRING), 2, '0')
        ELSE '' END
|| CASE WHEN event_id % 4 <> 1
        THEN ', "tag": "' || event_type || '"' ELSE '' END
|| CASE WHEN event_id % 5 = 0
        THEN ', "flag": ' || CASE WHEN event_id % 2 = 0
                                  THEN 'true' ELSE 'false' END
        ELSE '' END
|| CASE WHEN event_id % 7 = 0
        THEN ', "meta": {"src": ' || CAST(event_id % 13 AS STRING) || '}'
        ELSE '' END
|| CASE WHEN event_id % 11 = 0 THEN ', "note": null' ELSE '' END
|| '}'
"""

#: Anchored classification ladder over the extracted raw text. The
#: regex-match function is the one engine-divergent spelling
#: (Spark: regexp_like, DuckDB: regexp_matches) — parameterized.
def _classify(regexp_fn: str) -> str:
    return f"""
CASE WHEN v IS NULL THEN 'null'
     WHEN left(v, 1) = '{{' THEN 'object'
     WHEN left(v, 1) = '[' THEN 'array'
     WHEN v = 'true' OR v = 'false' THEN 'boolean'
     WHEN {regexp_fn}(v, '^-?[0-9]+$') THEN 'integer'
     WHEN {regexp_fn}(v, '^-?[0-9]+[.][0-9]+$') THEN 'number'
     ELSE 'string' END
"""

_QJSONPROF_ORACLE = f"""
WITH enriched AS (
  SELECT event_id, {_JS_SQL} AS js FROM events
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM enriched),
exploded AS (
  SELECT e.event_id, e.js, k.key
  FROM enriched e, LATERAL (SELECT unnest(json_keys(e.js)) AS key) k
),
typed AS (
  SELECT key, {_classify('regexp_matches')} AS dtype
  FROM (
    SELECT key, json_extract_string(js, '$.' || key) AS v FROM exploded
  )
)
SELECT t.key, t.dtype,
       CAST(COUNT(*) AS BIGINT) AS n,
       FLOOR((CAST(COUNT(*) AS DOUBLE) / CAST(tot.n_rows AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS presence
FROM typed t CROSS JOIN tot
GROUP BY t.key, t.dtype, tot.n_rows
ORDER BY t.key, t.dtype
"""


@register(
    "q_json_schema_inference",
    oracle=_QJSONPROF_ORACLE,
    description=(
        "JSON schema inference over a heterogeneous JSON column: "
        "discover keys with json_object_keys, classify each value's "
        "type from the extracted raw text (anchored regex ladder), one "
        "hash aggregation on (key, dtype) with presence rates"
    ),
    tags=("json", "profiling", "data-quality", "semi-structured"),
)
def q_json_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # Spark spells the same enrichment; || is valid Spark SQL concat.
    enriched = e.selectExpr("event_id", f"{_JS_SQL} AS js")
    tot = enriched.agg(F.count("*").cast("long").alias("n_rows"))
    exploded = enriched.select(
        "js", F.explode(F.json_object_keys("js")).alias("key")
    )
    typed = exploded.selectExpr(
        "key", "get_json_object(js, '$.' || key) AS v"
    ).selectExpr("key", f"{_classify('regexp_like')} AS dtype")
    return (
        typed.groupBy("key", "dtype")
        .agg(F.count("*").cast("long").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "key",
            "dtype",
            "n",
            (F.floor((F.col("n").cast("double") / F.col("n_rows").cast("double")) * 1e6 + 0.5) / 1e6).alias("presence"),
        )
        .orderBy("key", "dtype")
    )
