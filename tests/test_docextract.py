"""kgp_extract_docs — the flagship extractor's hash-gated documents-corpus
oracle (ops.docextract): Spark (real pipeline.extract operator) must equal
the from-scratch DuckDB re-derivation row-multiset-exactly, and the entry
must exercise EVERY triple family (mentions, both cue preds, the 2-token
cue, the co_occurs default, uses_tool)."""

from __future__ import annotations

import duckdb
import pytest

from kgp.ops.docextract import (DOC_CUES, derive_vocab, extract_docs,
                                extract_docs_resolved,
                                extract_docs_resolved_sql, extract_docs_sql)
from kgp.textops import GazetteerMatcher, extract_turn, find_cues

SF = "/root/testdata/sf0.001"


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_docs_extraction_matches_duckdb(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    odf = _canon(con.execute(extract_docs_sql()).df())
    sdf = _canon(extract_docs(spark, SF).toPandas())
    assert len(sdf) == len(odf) > 10_000
    assert sdf.equals(odf)
    # non-vacuous: every triple family fires on the fixture corpus
    preds = set(sdf["pred"])
    assert {"mentions", "uses_tool", "co_occurs_with",
            "runs_slow", "runs_fast", "big_vector_link"} <= preds


def test_docs_resolved_matches_duckdb(spark):
    """Chain stage 2 (the real pipeline.materialize resolve) equals the SQL
    resolution layer, and no srf: operand survives (closed gazetteer)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    odf = _canon(con.execute(extract_docs_resolved_sql()).df())
    sdf = _canon(extract_docs_resolved(spark, SF).toPandas())
    assert len(sdf) == len(odf) > 10_000
    assert sdf.equals(odf)
    assert not sdf["subj"].str.startswith("srf:").any()
    assert not sdf["obj"].str.startswith("srf:").any()
    assert sdf["subj"].str.startswith("ent:").any()


def test_derived_vocab_is_deterministic_and_cue_free(spark):
    rows = derive_vocab(spark, SF)
    assert rows == derive_vocab(spark, SF)
    surfaces = [s for s, _eid, _t in rows]
    assert len(surfaces) == len(set(surfaces))
    reserved = {w for _p, cue in DOC_CUES for w in cue}
    for s in surfaces:
        assert not (set(s.split()) & reserved), s


def test_cue_override_changes_predicates_only():
    vocab = [("alpha", 1, "term"), ("beta", 2, "term")]
    m = GazetteerMatcher(vocab)
    text = "alpha zz beta."
    # default cue dict: 'zz' is no cue -> co_occurs default
    _, t_default = extract_turn("c", 0, text, None, m)
    # override: 'zz' becomes a cue
    _, t_cue = extract_turn("c", 0, text, None, m,
                            cue_toks=[("linked_by", ("zz",))])
    pair_d = [t for t in t_default if t[2].startswith("srf:")]
    pair_c = [t for t in t_cue if t[2].startswith("srf:") and
              not t[3] == "mentions"]
    assert [t[3] for t in pair_d if t[3] != "mentions"] == ["co_occurs_with"]
    assert [t[3] for t in pair_c] == ["linked_by"]
    # multi-token cue positions come from find_cues with the override
    hits = find_cues("a zz yy b", cue_toks=[("x", ("zz", "yy"))])
    assert hits == [("x", 1, 3)]


def _pairs(triples):
    return [(s[4:], p, o[4:]) for _c, _t, s, p, o in triples
            if s.startswith("srf:")]


def test_pair_rule_strictly_between():
    cues = [("zzp", ("zz",))]
    # cue strictly between the two mention spans -> fires
    m = GazetteerMatcher([("alpha beta", 1, "phrase"), ("gamma", 2, "term")])
    _, t = extract_turn("c", 0, "alpha beta zz gamma.", None, m, cues)
    assert _pairs(t) == [("alpha beta", "zzp", "gamma")]
    # cue INSIDE the first mention's span -> default predicate
    m2 = GazetteerMatcher([("alpha zz", 1, "phrase"), ("gamma", 2, "term")])
    _, t2 = extract_turn("c", 0, "alpha zz gamma.", None, m2, cues)
    assert _pairs(t2) == [("alpha zz", "co_occurs_with", "gamma")]
