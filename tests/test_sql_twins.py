"""Property tests: the DuckDB SQL twins of the sequential text policies
(T2 merge/split, T4 adjust-lengths, T7 chunk packing) are byte-identical
to the shared pure-Python functions on RANDOM inputs — not just on the
driver's fixed corpus.  No Spark involved: DuckDB evaluates the same
list_reduce fold expressions the oracle strings use."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from kgp import textops
from kgp.ops import textseg

WORDS = ["alpha", "beta", "gamma", "delta", "spark", "table", "row",
         "x", "yz", "stream", "join", "agg"]

para_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=30).map(" ".join)
paras_st = st.lists(para_st, min_size=0, max_size=8)


def _duck_list(expr_builder, paras, **kw):
    con = duckdb.connect()
    expr = expr_builder("paras", **kw)
    out = con.execute(f"SELECT {expr} FROM (SELECT ? AS paras)", [paras]).fetchone()[0]
    con.close()
    return list(out)


@settings(max_examples=150, deadline=None)
@given(paras=paras_st)
def test_t4_sql_fold_matches_python(paras):
    want = textops.adjust_paragraph_lengths(paras, min_tokens=4, max_tokens=9)
    got = _duck_list(textseg.t4_list_sql, paras, min_tokens=4, max_tokens=9)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(paras=paras_st)
def test_t7_sql_fold_matches_python(paras):
    want, err = textops.pack_chunks(paras, max_tokens=12)
    got = _duck_list(textseg.t7_list_sql, paras, max_tokens=12)
    assert got == want


sentence_st = st.lists(st.sampled_from(WORDS), min_size=1, max_size=8).map(
    lambda ws: " ".join(ws) + ".")
text_st = st.lists(sentence_st, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=150, deadline=None)
@given(text=text_st)
def test_t2_sql_matches_python(text):
    want = textops.merge_split_sentences(text, min_chars=12, max_chars=25)
    sql = textseg.t2_segments_sql(table="(SELECT 0 AS doc_id, ? AS text)",
                                  min_chars=12, max_chars=25)
    con = duckdb.connect()
    rows = con.execute(sql, [text]).fetchall()
    con.close()
    got = [seg for _id, _idx, seg in sorted(rows, key=lambda r: r[1])]
    assert got == want
