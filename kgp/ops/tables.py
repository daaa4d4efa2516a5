"""Parquet table loader for the driver-generated testdata star schema.

At cluster scale these reads become Iceberg catalog reads
(``spark.read.table``); the parquet path keeps the same DataFrame surface.
Column pruning + filter pushdown reach the parquet scan either way
(verify with ``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(name)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
