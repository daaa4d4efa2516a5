"""Text-reshaping operator tests: pure-function properties, the
reference-walk ≡ declarative-window equivalence for T8, and Spark
grouped-map parity against the shared pure core."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from kgp import textops
from kgp.ops import textseg

# ---------------------------------------------------------------------------
# pure-function properties
# ---------------------------------------------------------------------------

def test_merge_split_sentences():
    text = "Short one. Also tiny. This sentence is comfortably long enough to stand alone. x. y."
    segs = textops.merge_split_sentences(text, min_chars=30, max_chars=60)
    # short sentences merge forward until the segment reaches >=30 chars
    assert segs[0].startswith("Short one. Also tiny. This sentence")
    # fixed-width split keeps every segment within max_chars
    assert all(len(s) <= 60 for s in segs)
    # nothing dropped: concatenation (modulo the single-space joins the
    # merge inserts) covers the input
    assert "x. y." in " ".join(segs)


def test_merge_split_long_split():
    text = "a" * 120 + "."
    segs = textops.merge_split_sentences(text, min_chars=30, max_chars=50)
    assert [len(s) for s in segs] == [50, 50, 21]
    assert "".join(segs) == text


def test_adjust_paragraph_lengths_bounds():
    paras = ["w " * 5, "w " * 100, "w " * 45, "w " * 10, "w " * 12]
    out = textops.adjust_paragraph_lengths([p.strip() for p in paras],
                                           min_tokens=20, max_tokens=50)
    # truncate guarantees the upper bound; token conservation only breaks
    # via the final truncation
    assert all(len(p.split()) <= 50 for p in out)
    assert sum(len(p.split()) for p in out) <= 172


def test_adjust_merge_is_pairwise_not_cascading():
    # two shorts merge; the merged product must not absorb a third in the
    # same pass (reference i += 2 semantics) — with one pass it stays split
    out = textops.adjust_paragraph_lengths(["a b", "c d", "e f"],
                                           min_tokens=10, max_tokens=6, max_passes=1)
    assert out == ["a b c d", "e f"]


def test_pack_chunks_greedy_and_bail():
    chunks, err = textops.pack_chunks(["a b c", "d e", "f g h i"], max_tokens=5)
    assert err is None
    assert chunks == ["a b c d e", "f g h i"]
    chunks, err = textops.pack_chunks(["a b c", "x " * 50], max_tokens=5)
    assert chunks == [] and err == textops.CHUNK_ERR_OVERSIZE


def test_parse_qa_pairs_cases():
    ok = "Question 1: what?\nAnswer 1: this.\nQuestion 2: why?\nAnswer 2: so."
    assert textops.parse_qa_pairs(ok) == [("what?", "this."), ("why?", "so.")]
    # fallback: unmarked questions, answer count == expected batch size
    fb = "\n".join(f"q{i}?\nAnswer {i}: a{i}." for i in range(1, 6))
    assert textops.parse_qa_pairs(fb, expected_fallback_count=5) == [
        (f"q{i}?", f"a{i}.") for i in range(1, 6)]
    # mismatch -> empty
    assert textops.parse_qa_pairs("Question 1: q?\nAnswer 1: a.\nAnswer 2: b.") == []


def test_wordpiece_reassembles():
    out = textops.wordpiece_tokenize("Spark Tables stream")
    pieces = out.split()
    assert pieces[0] and not pieces[0].startswith("##")
    assert "".join(p.removeprefix("##") for p in pieces) == "sparktablesstream"


# ---------------------------------------------------------------------------
# T8: reference walk == declarative window formulation
# ---------------------------------------------------------------------------

def _declarative_window(toks: list[int], hit: int, B: int, p: float) -> tuple[int, int]:
    """Pure-python twin of ops.textseg.context_windows' cumsum/join logic."""
    n = len(toks)
    total = sum(toks)
    if total <= B:
        return 0, n - 1
    c = [0]
    for t in toks:
        c.append(c[-1] + t)  # c[i] = prefix sum of toks[:i]
    remaining = B - toks[hit]
    before_budget = int(remaining * p)
    starts = [j for j in range(hit) if c[hit] - c[j] <= before_budget]
    start = min(starts) if starts else hit
    after_budget = remaining - (c[hit] - c[start])
    ends = [m for m in range(hit + 1, n) if c[m + 1] - c[hit + 1] <= after_budget]
    end = max(ends) if ends else hit
    return start, end


@settings(max_examples=300, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=20),
    hit_seed=st.integers(min_value=0, max_value=10 ** 6),
    budget=st.integers(min_value=1, max_value=200),
)
def test_context_window_walk_equals_declarative(toks, hit_seed, budget):
    hit = hit_seed % len(toks)
    walk = textops.context_window(toks, hit, max_tokens=budget, before_percent=0.3)
    decl = _declarative_window(toks, hit, budget, 0.3)
    assert walk == decl


# ---------------------------------------------------------------------------
# Spark parity vs the shared pure core (grouped-map surface)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs_df(spark):
    rows = []
    texts = [
        "Tiny. Also small. This paragraph is long enough to stand by itself fine. End.",
        "word " * 90,
        "alpha beta gamma " * 4,
        "needle stream join appears right here in this text " + "pad " * 20,
        "closing remarks on the file",
    ]
    for g in range(4):
        for i, t in enumerate(texts):
            rows.append((f"s{g}", g * 10 + i, t.strip()))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["source", "doc_id", "text"]))


def test_t2_spark_matches_pure(spark, docs_df):
    got = {(r["doc_id"], r["seg_idx"]): r["segment"]
           for r in textseg.t2_segments(docs_df, min_chars=30, max_chars=60).collect()}
    pdf = docs_df.toPandas()
    want = {}
    for _, row in pdf.iterrows():
        for i, seg in enumerate(textops.merge_split_sentences(row["text"], 30, 60)):
            want[(row["doc_id"], i)] = seg
    assert got == want


def test_t4_t7_spark_matches_pure(spark, docs_df):
    pdf = docs_df.toPandas()
    for (fn, sql_fn, pure, col) in [
        (textseg.t4_adjust_lengths, None,
         lambda ps: textops.adjust_paragraph_lengths(ps, 40, 80), "paragraph"),
        (textseg.t7_pack_chunks, None,
         lambda ps: textops.pack_chunks(ps, 200)[0], "chunk"),
    ]:
        got = {}
        for r in fn(docs_df).collect():
            got.setdefault(r["source"], []).append((r[1], r[col]))
        got = {k: [x for _, x in sorted(v)] for k, v in got.items()}
        want = {}
        for src, grp in pdf.groupby("source"):
            grp = grp.sort_values("doc_id")
            want[src] = pure(grp["text"].tolist())
        want = {k: v for k, v in want.items() if v}
        assert got == want


def test_t8_spark_matches_walk(spark, docs_df):
    out = textseg.context_windows(docs_df, pattern="stream join",
                                  max_tokens=120, before_percent=0.3).collect()
    assert len(out) == 4  # one hit per source group
    pdf = docs_df.toPandas()
    for r in out:
        grp = pdf[pdf["source"] == r["source"]].sort_values("doc_id")
        texts = [textops.canon_ws(t) for t in grp["text"] if t.strip()]
        toks = [len(t.split()) for t in texts]
        hit_pos = next(i for i, t in enumerate(texts) if "stream join" in t)
        s, e = textops.context_window(toks, hit_pos, 120, 0.3)
        assert (r["start_rk"], r["end_rk"]) == (s + 1, e + 1)
        assert r["context"] == " ".join(texts[s:e + 1])
