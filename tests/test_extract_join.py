"""Open-vocabulary join-based extraction == broadcast-gazetteer extraction,
bit-for-bit (mentions AND triples), on the synthetic corpus."""

from __future__ import annotations

import pytest

from kgp import synth
from kgp.pipeline.extract import extract, mentions_view, raw_triples_view
from kgp.pipeline.extract_join import extract_join, surface_table
from kgp.pipeline.order import order_turns


@pytest.fixture(scope="module")
def both_paths(spark):
    vocab_pd = synth.gen_entity_vocab(120)
    transcripts = synth.gen_transcripts_spark(spark, 250, vocab_pd)
    ordered = order_turns(transcripts)
    vocab = spark.createDataFrame(vocab_pd)
    bcast = extract(ordered, synth.vocab_surface_rows(vocab_pd))
    joined = extract_join(ordered, surface_table(vocab))
    return bcast, joined


def _collect(df, keys):
    return sorted(map(tuple, df.toPandas()[keys].itertuples(index=False)))


def test_mentions_identical(both_paths):
    bcast, joined = both_paths
    keys = ["conv_id", "turn_idx", "sent_idx", "mention", "entity_type"]
    a = _collect(mentions_view(bcast), keys)
    b = _collect(mentions_view(joined), keys)
    assert a == b and len(a) > 100


def test_triples_identical(both_paths):
    bcast, joined = both_paths
    keys = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    a = _collect(raw_triples_view(bcast), keys)
    b = _collect(raw_triples_view(joined), keys)
    assert a == b and len(a) > 100


def test_join_path_edge_turns_match_broadcast(spark):
    """Turns that are whitespace-only (pass order.py's space-only gate but
    yield zero sentences) or contain \\x1f (the join path's former split
    marker) must produce EXACTLY the broadcast path's EXTRACTED rows —
    including the uses_tool triple of a sentence-less turn."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kgp import synth
    from kgp.pipeline.extract import extract
    from kgp.pipeline.extract_join import extract_join, surface_table

    vocab_pd = synth.gen_entity_vocab(20)
    vocab = spark.createDataFrame(vocab_pd)
    ent = vocab_pd["canonical_name"].iloc[0]
    rows = [
        ("c0", 0, "user", "\n", "sql", pd.Timestamp("2025-01-01")),       # ws-only + tool
        ("c0", 1, "user", "\t \n", None, pd.Timestamp("2025-01-01 00:01")),  # ws-only, no tool
        ("c0", 2, "user", f"a\x1fb. {ent} did things.", "web",
         pd.Timestamp("2025-01-01 00:02")),                                # \x1f in text
        ("c0", 3, "user", f"{ent} said hello.", None,
         pd.Timestamp("2025-01-01 00:03")),
    ]
    ordered = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]))

    def canon(df):
        return sorted(
            (r["conv_id"], r["turn_idx"], sorted(map(tuple, r["mentions"])),
             sorted(map(tuple, r["triples"])))
            for r in df.collect())

    bcast = extract(ordered, synth.vocab_surface_rows(vocab_pd))
    joined = extract_join(ordered, surface_table(vocab))
    assert canon(bcast) == canon(joined)
    # the sentence-less tool turn IS present with its uses_tool triple
    got = {r["turn_idx"]: [tuple(t) for t in r["triples"]] for r in joined.collect()}
    assert 0 in got and ("conv:c0", "uses_tool", "tool:sql") in got[0]
    assert 1 in got and got[1] == []
