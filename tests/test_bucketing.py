"""Bucketed-table co-located join: the 100 TB fact⋈fact strategy.

Writing both join sides bucketed by the join key lets the sort-merge
join read co-located buckets with NO shuffle exchange — the difference
between re-shuffling 100 TB per query and reading pre-organized data."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from parallel_monte_carlo_simulations_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark):
    wh = tempfile.mkdtemp(prefix="pmcs_warehouse_")
    yield wh
    shutil.rmtree(wh, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    o = table(spark, SF, "orders")
    l = table(spark, SF, "lineitem")
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .option("path", f"{warehouse}/orders_b").saveAsTable("orders_b"))
    (l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .option("path", f"{warehouse}/lineitem_b").saveAsTable("lineitem_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ so the test observes bucket co-location, not a
        # broadcast shortcut (at real scale neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = lb.join(
            ob, lb.l_orderkey == ob.o_orderkey
        ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # co-located buckets: no Exchange may feed the join
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # sanity: result matches the unbucketed plan
        plain = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
