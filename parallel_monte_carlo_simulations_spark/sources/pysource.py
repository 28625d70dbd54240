"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

Spark 4 lets a pure-Python class BE a data source: implement
``DataSource``/``DataSourceReader``, register it, and ``spark.read
.format(name)`` plans it like any other source — ``partitions()`` is
the source's split planning (each InputPartition becomes one task, so
reads parallelize across executors exactly like file splits), and
``read(partition)`` runs executor-side. This is the engine's
extensibility story for feeds with no file representation: internal
REST APIs, message-queue snapshots, bespoke binary stores — the
connector is ~30 lines of Python, and everything downstream (pushdown
of the later relational ops, AQE, the oracle gate) is unchanged.

The registered query reads a deterministic synthetic telemetry source
(closed-form rows, so DuckDB replays them from ``range()`` — same
discipline as the codec oracles) across 8 planned partitions and
aggregates per station.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..functions.microunit import (
    rdiv_halfup_duck,
    rdiv_halfup_expr,
    units_col,
    units_sql,
)
from ..registry import register

N_ROWS = 50_000
N_PARTS = 8


class SensorReader(DataSourceReader):
    """Closed-form telemetry rows, split-planned like file chunks."""

    def __init__(self, options: dict):
        self.n = int(options.get("rows", N_ROWS))
        self.parts = int(options.get("partitions", N_PARTS))

    def partitions(self):
        per = self.n // self.parts
        return [
            InputPartition(
                (i * per, (i + 1) * per if i < self.parts - 1 else self.n)
            )
            for i in range(self.parts)
        ]

    def read(self, part):
        lo, hi = part.value
        for i in range(lo, hi):
            # closed form replayed by the DuckDB oracle
            yield (i, (i * 31) % 97, ((i * 17) % 1001) / 10.0)


class SensorSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pmcs_sensor"

    def schema(self) -> str:
        return "sensor_id long, station int, reading double"

    def reader(self, schema) -> SensorReader:
        return SensorReader(self.options)


_QPYSRC_ORACLE = f"""
WITH rows AS (
  SELECT i AS sensor_id,
         (i * 31) % 97        AS station,
         ((i * 17) % 1001) / 10.0 AS reading
  FROM (SELECT unnest(range(0, {N_ROWS})) AS i)
)
SELECT CAST(station AS INTEGER)        AS station,
       CAST(COUNT(*) AS BIGINT)        AS n_readings,
       {rdiv_halfup_duck(f"SUM({units_sql('reading', 1)})", "10", 2)}
                                       AS total_reading,
       FLOOR((MAX(reading)) * 1e2 + 0.5) / 1e2          AS max_reading
FROM rows
WHERE reading > 50.0
GROUP BY station
"""


@register(
    "q_source_python_datasource",
    oracle=_QPYSRC_ORACLE,
    description=(
        "custom Python DataSource (Spark 4 API): deterministic telemetry "
        f"source split into {N_PARTS} planned partitions, filtered and "
        "aggregated per station"
    ),
    tags=("source", "python_datasource", "extensibility"),
)
def q_source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    # register() is idempotent per name — re-registering replaces the
    # entry, so repeated query runs in one session are safe.
    spark.dataSource.register(SensorSource)
    df = (
        spark.read.format("pmcs_sensor")
        .option("rows", str(N_ROWS))
        .option("partitions", str(N_PARTS))
        .load()
    )
    return (
        df.filter(F.col("reading") > 50.0)
        .groupBy("station")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_readings"),
            # readings are exact tenths ((i*17 % 1001)/10): 1-dec units
            rdiv_halfup_expr(
                f"sum({units_sql('reading', 1)})", "10", 2
            ).alias("total_reading"),
            (F.floor((F.max("reading")) * 1e2 + 0.5) / 1e2).alias("max_reading"),
        )
    )
