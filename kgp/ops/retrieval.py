"""M4/J10 — the two-stage retrieval pipeline (the reference's "real query").

Mirrors src/deployment/search_pipeline.py:42-89:
1. retrieve: ANN top-k over the embedding corpus for a TABLE of queries
   (semantic_search_two_towers.py:19-57 → ops.simsearch.ann_batch_topk,
   LSH bucket join + exact verify);
2. rerank: cross-score every (query, candidate) pair with a DIFFERENT
   scorer — token_set_ratio over the raw texts stands in for the
   cross-encoder (bert_rerank.py:69-75) — and keep the top ``k_final``
   (reranker_function.py:107-108);
3. expand: token-budget context window around each surviving hit
   (reranker_function.py:109 → ops.textseg.expand_context).

Scale shape: stage 1 shuffles on bucket keys then query id; stage 2 only
touches |Q|·k_retrieve candidate pairs (the query-side text block is
broadcast); stage 3 is the declarative window expansion.  Nothing is ever
|Q|×|corpus|.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F, types as T

from ..fuzzy import token_set_ratio
from .common import pin
from .simsearch import ann_batch_topk
from .tables import load
from .textseg import expand_context


@F.pandas_udf(T.DoubleType())
def _cross_score(qt: pd.Series, ct: pd.Series) -> pd.Series:
    return pd.Series([token_set_ratio((a or "").lower(), (b or "").lower())
                      for a, b in zip(qt, ct)])


def retrieval_pipeline(spark: SparkSession, sf_dir: str, n_queries: int = 8,
                       k_retrieve: int = 50, k_final: int = 5,
                       ctx_tokens: int = 120,
                       ranked: DataFrame | None = None,
                       index: DataFrame | None = None) -> DataFrame:
    """(qid, final_rank, doc_id, retrieve_score, rerank_score, context).

    ``ranked``: optional pre-staged ops.textseg.ranked_corpus table for
    stage 3 — collapses the context-expansion plan from ~10 re-derivations
    of the window functions to N pruned reads of one staged table.
    ``index``: optional persisted S8 LSH bucket table for stage 1 — without
    it every invocation recomputes the whole corpus's bucket keys (a full
    corpus UDF pass the reference amortizes by loading the saved FAISS
    index, create_faiss_index.py:43-68)."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < n_queries)

    stage1 = ann_batch_topk(queries, emb, k=k_retrieve, index=index)

    dq = docs.select(F.col("doc_id").alias("qid"), F.col("text").alias("qtext"))
    dc = docs.select(F.col("doc_id").alias("vec_id"), F.col("text").alias("ctext"),
                     "source")
    reranked = (
        stage1.join(F.broadcast(dq), "qid").join(dc, "vec_id")
        .withColumn("rerank_score", F.round(_cross_score("qtext", "ctext"), 4))
    )
    w = W.partitionBy("qid").orderBy(F.desc("rerank_score"), F.desc("score"), "vec_id")
    # persist (lazy, unlike localCheckpoint under AQE): |Q|·k_final rows,
    # but its lineage holds the ANN join + cross-score UDF — consumed twice
    # below (hit list for context expansion + the final join), which would
    # otherwise re-run stage 1+2
    top = (
        reranked.withColumn("final_rank", F.row_number().over(w))
        .filter(F.col("final_rank") <= k_final)
        .select("qid", "final_rank", F.col("vec_id").alias("doc_id"),
                F.col("score").alias("retrieve_score"), "rerank_score", "source")
    )
    top = pin(top)

    ctx = expand_context(docs, top.select("source", "doc_id"),
                         max_tokens=ctx_tokens, ranked=ranked)
    return (
        top.join(ctx, (top["source"] == ctx["source"])
                 & (top["doc_id"] == ctx["hit_id"]))
        .select("qid", "final_rank", "doc_id", "retrieve_score",
                "rerank_score", "context")
    )
