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
