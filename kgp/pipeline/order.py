"""S1 — stable turn ordering, empty-drop, exact dedup, boilerplate removal.

Reference behaviors reproduced (SURVEY.md §2.2/§2.8):
- paragraph-in-file order ≙ (conv_id, turn_idx, ts) window sort (W1)
- empty-after-trim drop (P11, embed_paragraphs.py:23)
- exact-duplicate drop (D1, sha256 membership in create_faiss_index.py:19-37)
  — here a row_number window per (conv_id, text), keep first
- near-dup boilerplate removal (D2, remove_duplicate_paragraphs.py:104-132)
  — reformulated scalably: instead of a per-row ANN lookup, turns whose
  digit-masked normalized text (dup_key) is shared by >= MIN_DUP_GROUP
  turns are dropped.  One shuffle on the key; no N² pass; nothing
  collected to the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T

from ..textops import MIN_DUP_GROUP, dup_key


@F.pandas_udf(T.StringType())
def _dup_key(texts: pd.Series) -> pd.Series:
    return texts.map(dup_key)


def order_turns(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    df = df.filter(F.length(F.trim(F.col("text"))) > 0)

    # exact within-conversation dedup, keep earliest turn
    w = W.partitionBy("conv_id", "text").orderBy("turn_idx", "ts")
    df = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    # boilerplate near-dup removal: one window count per dup_key (single
    # shuffle), offending turns anti-joined away.
    bad_turns = (
        df.select("conv_id", "turn_idx", _dup_key("text").alias("dkey"))
        .withColumn("n", F.count("*").over(W.partitionBy("dkey")))
        .filter(F.col("n") >= MIN_DUP_GROUP)
        .select("conv_id", "turn_idx")
    )
    cleaned = df.join(bad_turns, ["conv_id", "turn_idx"], "left_anti")

    # cluster by conversation and sort within partitions: downstream
    # per-conversation operators see contiguous ordered turns without any
    # further shuffle; a *global* sort is never needed (the invariant is
    # per-conversation order, which partition-local sort provides).
    parts = num_partitions or cleaned.sparkSession.sparkContext.defaultParallelism
    return cleaned.repartition(parts, "conv_id").sortWithinPartitions("conv_id", "turn_idx", "ts")
