"""Edge-input parity between the three engines (Spark / DuckDB / Python
oracle) — regressions for the round-3 adversarial review findings:

- ANSI divide-by-zero surfaces (Spark 4 defaults ANSI on): empty documents
  in quality_scores, all-zero embeddings in the JVM cosine expressions —
  both must yield NULL (the DuckDB twins' behavior), never a crash.
- Whitespace-class parity: tab/newline-edged text through the S1 empty
  drop (oracle vs Spark) and the word-bigram shingle family (Python vs
  JVM vs DuckDB).
- TableIO commit atomicity: a writer crash must not destroy the last
  committed snapshot.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from kgp import oracle, textops
from kgp.io import TableIO
from kgp.ops import dedup, simsearch
from kgp.ops.textqa import QUALITY_SCORES_SQL, quality_scores
from kgp.pipeline import order as s1

EDGE_TEXTS = ["\t", "\n", "   ", " x ", "\ta b", "a\tb \n", "", None, "ok doc"]


def _transcripts_pdf():
    rows = []
    for i, t in enumerate(EDGE_TEXTS):
        rows.append(("c0", i, "user", t, None, pd.Timestamp("2025-01-01") + pd.Timedelta(minutes=i)))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def test_s1_empty_drop_parity_on_whitespace_edges(spark):
    """A tab-only / newline-only turn must be kept or dropped IDENTICALLY
    by the pandas oracle and the Spark pipeline (both: space-only trim)."""
    pdf = _transcripts_pdf()
    got_oracle = oracle.order_turns(pdf)
    got_spark = (
        s1.order_turns(spark.createDataFrame(pdf), pin="none")
        .select("conv_id", "turn_idx", "text").toPandas()
        .sort_values("turn_idx").reset_index(drop=True)
    )
    assert list(got_oracle["turn_idx"]) == list(got_spark["turn_idx"])
    assert list(got_oracle["text"]) == list(got_spark["text"])
    # the load-bearing cases: tab-only and newline-only turns ARE kept
    assert 0 in set(got_spark["turn_idx"])  # "\t"
    assert 1 in set(got_spark["turn_idx"])  # "\n"
    assert 2 not in set(got_spark["turn_idx"])  # "   " dropped by both


def test_quality_scores_empty_doc_null_not_crash(spark):
    """digit_ratio on an empty/whitespace doc: NULL on both engines (the
    unguarded form throws DIVIDE_BY_ZERO under Spark 4 ANSI mode)."""
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["", "   ", "a1b 22 c"]})
    got = (quality_scores(spark.createDataFrame(pdf))
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (con.execute(QUALITY_SCORES_SQL).df()
            .sort_values("doc_id").reset_index(drop=True))
    for c in ["n_tokens", "uniq_ratio", "digit_ratio", "stop_ratio", "quality"]:
        pd.testing.assert_series_equal(
            got[c].astype("float64"), want[c].astype("float64"),
            check_names=False, rtol=0, atol=0)
    assert pd.isna(got.loc[0, "digit_ratio"]) and pd.isna(got.loc[1, "quality"])


def test_cosine_zero_vector_null_not_crash(spark):
    """All-zero embedding (hash_embed emits one for token-less docs) must
    score NULL in every JVM cosine path, matching the SQL twins."""
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 0.0]), (2, [0.6, 0.8, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["score"]
           for r in simsearch.cosine_topk(df, 0, k=5).collect()}
    assert got[1] is None and got[2] is not None
    batch = simsearch.knn_batch_topk(df, max_qid=2, k=5).collect()
    zero_q = [r for r in batch if r["qid"] == 1]
    assert all(r["score"] is None for r in zero_q)  # zero-norm query side
    pairs = simsearch.cosine_pairs_exact(df, threshold=0.0).collect()
    assert all(r["a"] != 1 and r["b"] != 1 for r in pairs)  # NULL >= t filters out


def test_word_bigram_shingles_three_engine_parity(spark):
    """Tab/newline-edged text: the Python shingle hasher, the JVM
    _word_bigrams expression, and the DuckDB ngram_jaccard normalization
    must all emit the SAME gram multiset (no phantom ' x' grams)."""
    texts = ["\ta b", "a\tb \n", "a b", " a  b ", "x", ""]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    jvm = {r["doc_id"]: sorted(r["g"]) for r in
           df.select("doc_id", dedup._word_bigrams("text").alias("g")).collect()}
    con = duckdb.connect()
    con.register("documents", pdf)
    duck = {r[0]: sorted(r[1]) for r in con.execute("""
        WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '[\\s\\v]+', ' ', 'g'), ' ') AS nt
                   FROM documents),
        w AS (SELECT doc_id, string_split(nt, ' ') AS ws, nt FROM d)
        SELECT doc_id, CASE WHEN len(ws) >= 2
               THEN list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]))
               ELSE [nt] END FROM w""").fetchall()}
    assert jvm == duck
    for i, t in enumerate(texts):
        py = textops.word_bigram_shingles(t)
        # whitespace-only docs: Python emits the empty SET, the array
        # engines a ['']-singleton — both verify to jaccard 1.0 vs another
        # empty doc, so only non-empty docs need gram-level equality
        if (t or "").strip(" \t\n\r\f\v"):
            assert py == {textops._fnv1a(g) for g in jvm[i]}, t
        else:
            assert py == set(), t


def test_tableio_crash_keeps_committed_snapshot(spark, tmp_path):
    """A failed second write must leave the first committed snapshot
    readable (versioned data dirs; manifest replace is the commit)."""
    from pyspark.sql import functions as F

    io = TableIO(str(tmp_path / "wh"))
    df1 = spark.range(10).withColumn("v", F.col("id") * 2)
    m1 = io.write(df1, "t")
    assert io.read(spark, "t").count() == 10

    @F.udf("long")
    def boom(x):
        raise RuntimeError("simulated mid-write crash")

    bad = spark.range(5).withColumn("v", boom(F.col("id")))
    with pytest.raises(Exception):
        io.write(bad, "t")
    # old snapshot still committed and readable
    assert io.manifest("t")["snapshot_id"] == m1["snapshot_id"]
    assert io.read(spark, "t").count() == 10
    # and a subsequent good write supersedes it cleanly
    m2 = io.write(spark.range(3).withColumn("v", F.lit(1)), "t")
    assert m2["snapshot_id"] != m1["snapshot_id"]
    assert io.read(spark, "t").count() == 3
