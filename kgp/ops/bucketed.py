"""Bucketed (co-located) joins — the pre-shuffle join strategy for
repeated big-big joins (task brief: "bucketing for co-located joins").

Writing both fact tables bucketed by the join key stores them
pre-partitioned AND pre-sorted per bucket: every later equi-join on that
key is a zero-exchange sort-merge join (each task reads matching buckets
from both sides).  At 100 TB this converts the dominant recurring
shuffle of a workload into a one-time write cost.

The bucketed tables are managed tables in a dedicated database whose
LOCATION lives under the cache root (no repo-dir spark-warehouse
pollution); the registry builds them once per sf and the parity oracle
checks the join RESULT, while the pytest asserts the plan property (no
Exchange feeding the join).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .aggutil import decsum, decsum_sql
from .tables import load

N_BUCKETS = 8


def ensure_bucketed(spark: SparkSession, sf_dir: str, cache_root: str) -> str:
    """Create (once per session catalog) bucketed orders/lineitem tables
    for this sf dir.  Returns the database name.

    The build gate is ``spark.catalog.tableExists`` — the table handle
    lives in the session-local metastore, so a filesystem marker from an
    earlier process must NOT skip registration (a fresh session would
    then fail with TABLE_OR_VIEW_NOT_FOUND).  ``saveAsTable`` with
    mode=overwrite is idempotent over a stale on-disk location.
    """
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")
    db = f"kgp_bucketed_{tag}"
    loc = f"{cache_root}/{db}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    if not (spark.catalog.tableExists(f"{db}.orders_b")
            and spark.catalog.tableExists(f"{db}.lineitem_b")):
        (load(spark, sf_dir, "orders")
         .write.mode("overwrite")
         .bucketBy(N_BUCKETS, "o_orderkey").sortBy("o_orderkey")
         .saveAsTable(f"{db}.orders_b"))
        (load(spark, sf_dir, "lineitem")
         .write.mode("overwrite")
         .bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey")
         .saveAsTable(f"{db}.lineitem_b"))
    return db


def bucketed_order_revenue(spark: SparkSession, sf_dir: str,
                           cache_root: str = "/tmp/kgp_cache_bucketed") -> DataFrame:
    """Revenue per order priority via the bucketed orders ⋈ lineitem join —
    both scan sides are bucket-partitioned on the join key, so the join
    runs with ZERO exchanges before it (verified by test_bucketed_join)."""
    db = ensure_bucketed(spark, sf_dir, cache_root)
    o = spark.table(f"{db}.orders_b")
    li = spark.table(f"{db}.lineitem_b")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .withColumn("revenue", revenue)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), decsum("revenue", "total_revenue"))
    )


BUCKETED_ORDER_REVENUE_SQL = f"""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           {decsum_sql('l_extendedprice * (1 - l_discount)', 'total_revenue')}
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
"""
