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
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .aggutil import decsum, decsum_sql
from .tables import load

N_BUCKETS = 8


def _register_existing(spark: SparkSession, full: str, tloc: str, key: str) -> None:
    """Point a fresh session catalog at a completed earlier build.

    ``saveAsTable`` wrote the bucket id into every file name, so an
    external table created with the SAME bucket spec over that location
    reads the files as bucketed (zero-exchange joins preserved — the plan
    pytest covers this path).  At 100 TB this is the only acceptable
    recovery from a lost session catalog: re-register, never rewrite.
    """
    schema = spark.read.parquet(tloc).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    spark.sql(
        f"CREATE TABLE {full} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {N_BUCKETS} BUCKETS "
        f"LOCATION '{tloc}'")


def _ensure_table(spark: SparkSession, sf_dir: str, db: str, loc: str,
                  name: str, src: str, key: str) -> None:
    full, tloc = f"{db}.{name}", f"{loc}/{name}"
    if spark.catalog.tableExists(full):
        return
    marker = os.path.join(tloc, "_BUILD_OK")
    if os.path.exists(marker):
        _register_existing(spark, full, tloc, key)
        return
    # no catalog entry and no completed build (absent or partial stale
    # dir): clear and rebuild — saveAsTable refuses to reuse a dirty
    # managed-table location (LOCATION_ALREADY_EXISTS)
    shutil.rmtree(tloc, ignore_errors=True)
    (load(spark, sf_dir, src)
     .write.mode("overwrite")
     .bucketBy(N_BUCKETS, key).sortBy(key)
     .saveAsTable(full))
    open(marker, "w").close()


def ensure_bucketed(spark: SparkSession, sf_dir: str, cache_root: str) -> str:
    """Create (once) bucketed orders/lineitem tables for this sf dir and
    make sure THIS session's catalog can see them.  Returns the db name.

    Two independent lifetimes are reconciled here: the data files persist
    on disk, but the table handles live in the session-local metastore.
    The gate is ``spark.catalog.tableExists`` per table; a `_BUILD_OK`
    marker inside the table dir records only that the data files are a
    complete build — a fresh session re-registers them (external table
    with the same bucket spec) instead of rewriting, and a dir without
    the marker is treated as a torn write and rebuilt.
    """
    # full dataset fingerprint, not the bare basename: two sf dirs sharing
    # a basename (or one regenerated in place) must not silently serve
    # each other's bucketed rows through the tableExists/_BUILD_OK
    # short-circuit — same identity rule as the materialized-graph cache
    # (ops.common.dataset_tag).  The db name is '{stem}_{contenthash}'
    # with stem = sanitized basename+pathhash; on a cache miss, dirs of
    # the SAME stem but another content hash are regenerated leftovers of
    # this dataset and get pruned (a different dataset has another stem).
    from .common import cached_dataset_tag

    raw = cached_dataset_tag(sf_dir)  # "{basename}-{pathhash}-{contenthash}"
    ident, chash = raw.rsplit("-", 1)
    stem = "kgp_bucketed_" + ident.replace(".", "_").replace("-", "_")
    db = f"{stem}_{chash}"
    loc = f"{cache_root}/{db}"
    if not os.path.exists(loc):
        try:
            for sib in os.listdir(cache_root):
                if sib != db and sib.startswith(f"{stem}_"):
                    spark.sql(f"DROP DATABASE IF EXISTS {sib} CASCADE")
                    shutil.rmtree(os.path.join(cache_root, sib), ignore_errors=True)
        except OSError:
            pass
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    _ensure_table(spark, sf_dir, db, loc, "orders_b", "orders", "o_orderkey")
    _ensure_table(spark, sf_dir, db, loc, "lineitem_b", "lineitem", "l_orderkey")
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
