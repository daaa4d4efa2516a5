"""Synthetic-corpus invariants (FIXTURES.md §1)."""

from kgp import synth


def test_deterministic(tiny_vocab, tiny_transcripts):
    v2 = synth.gen_entity_vocab(len(tiny_vocab))
    t2 = synth.gen_transcripts_pandas(100, v2)
    assert tiny_vocab.equals(v2)
    assert tiny_transcripts.equals(t2)


def test_schema_and_uniqueness(tiny_transcripts):
    assert list(tiny_transcripts.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert tiny_transcripts.set_index(["conv_id", "turn_idx"]).index.is_unique
    assert str(tiny_transcripts["turn_idx"].dtype) == "int32"


def test_rows_are_shuffled(tiny_transcripts):
    ordered = tiny_transcripts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert not tiny_transcripts.reset_index(drop=True).equals(ordered)


def test_ts_strictly_increasing_within_conv(tiny_transcripts):
    g = tiny_transcripts.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
    assert g.apply(lambda s: s.is_monotonic_increasing).all()


def test_roles_and_tools(tiny_transcripts):
    assert set(tiny_transcripts["role"].unique()) <= {"user", "assistant", "tool"}
    tool_rows = tiny_transcripts[tiny_transcripts["role"] == "tool"]
    assert tool_rows["tool"].notna().all()
    assert tiny_transcripts[tiny_transcripts["role"] != "tool"]["tool"].isna().all()
    assert len(tool_rows) / len(tiny_transcripts) <= 0.20


def test_spark_generator_matches_pandas(spark, tiny_vocab, tiny_transcripts):
    sdf = synth.gen_transcripts_spark(spark, 100, tiny_vocab).toPandas()
    a = sdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = tiny_transcripts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a[["conv_id", "turn_idx", "role", "text", "tool"]].equals(
        b[["conv_id", "turn_idx", "role", "text", "tool"]]
    )
    assert (a["ts"].values == b["ts"].values).all()
