"""Shared physical-layout helpers for CPU-bound UDF operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow input so CPU-bound (pandas-UDF)
    stages use every core.

    A small corpus arriving as one parquet file scans as ONE partition
    (file-split granularity is row groups), serializing every downstream
    Arrow batch onto a single task.  On a production table the input is
    many splits and this is a no-op; locally it costs one cheap shuffle of
    the narrow input and buys full parallelism for the expensive stage.
    ``getNumPartitions`` inspects the plan only — no job is triggered.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target)
