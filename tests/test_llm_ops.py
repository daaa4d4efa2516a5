"""M7 LLM-op stand-in tests (QA generation, relevance scoring).

Reference behaviors checked here: the emit-then-regex-parse protocol of
extract_qa.py (Spørgsmål/Svar layout, oversize-skip, marker-count bail)
and assign_relevance.py (Tekststykke score lines), plus the retrying
completion transport with a D4-style failure ledger.
"""

import math
import re

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from kgp.ops import llm

# text alphabet for protocol fuzzing: words, whitespace runs, Danish
# letters, and the protocol's own metacharacters (':', '?', digits)
_word = st.text(alphabet="abzæøå?:.0123456789", min_size=1, max_size=6)
_text = st.lists(_word, min_size=0, max_size=40).map(" ".join)


def _qa_spec(text: str) -> list[tuple[int, str, str]]:
    """Independent pure-Python spec of qa_generate: complete then parse
    with the reference regexes and the marker-count rule."""
    comp = llm.synth_completer([text])[0]
    qs = re.findall(llm.Q_MARK + r" \d+: (.+)", comp)
    ans = re.findall(llm.A_MARK + r" \d+: (.+)", comp)
    if not qs or len(qs) != len(ans):
        return []
    return [(i, q, a) for i, (q, a) in enumerate(zip(qs, ans))]


@settings(max_examples=60, deadline=None)
@given(text=_text)
def test_qa_sql_twin_matches_python_spec(text):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 1::BIGINT AS doc_id, ? AS text",
                [text])
    got = con.execute(llm.qa_generate_sql()).fetchall()
    want = [(1, i, q, a) for i, q, a in _qa_spec(text)]
    assert sorted(got) == sorted(want)


@settings(max_examples=60, deadline=None)
@given(text=_text)
def test_mcq_divide_sql_twin_matches_python_spec(text):
    # independent spec: stem before ' a)', canon, 3 spans of 5 words,
    # emit 'Spørgsmål i: Hvad betyder <span>?', then the reference's
    # split-newline + split(': ')[1] parse
    stem = re.sub(r"\s+", " ", re.split(r" a\)", text)[0]).strip()
    ws = stem.split(" ")
    lines = []
    for i in range(1, 4):
        s0 = (i - 1) * 5
        if len(ws) > s0 and ws[s0] != "":
            span = " ".join(ws[s0:s0 + 5])
            lines.append(f"{llm.Q_MARK} {i}: Hvad betyder {span}?")
    subs = []
    for ln in "\n".join(lines).split("\n"):
        parts = ln.split(": ")
        if len(parts) >= 2 and parts[1]:
            subs.append(parts[1])
    want = [(1, i, s) for i, s in enumerate(subs)]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 1::BIGINT AS doc_id, ? AS text",
                [text])
    got = con.execute(llm.mcq_divide_sql()).fetchall()
    assert sorted(got) == sorted(want)


def test_synth_completer_matches_jvm_expression(spark):
    texts = [
        " ".join(f"w{i}" for i in range(60)),          # all 3 pairs
        " ".join(f"w{i}" for i in range(20)),          # 1 full pair
        " ".join(f"w{i}" for i in range(8)),           # 0 pairs (no answer word)
        "",                                            # empty doc
        "  spaced\t\tout\n words  " + " ".join(f"x{i}" for i in range(20)),
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    jvm = {r.doc_id: r.c for r in
           df.select("doc_id", llm.synth_completion("text").alias("c")).collect()}
    py = llm.synth_completer(texts)
    for i, want in enumerate(py):
        assert jvm[i] == want, f"doc {i}: JVM and Python completions differ"
    assert py[2] == "" and py[3] == ""
    assert py[0].count(llm.Q_MARK) == 3 and py[0].count(llm.A_MARK) == 3


def test_qa_generate_parse_roundtrip(spark):
    long = " ".join(f"w{i}" for i in range(60))
    short = " ".join(f"w{i}" for i in range(20))
    oversize = " ".join(f"w{i}" for i in range(3000))  # > MAX_TOKENS -> skipped
    df = spark.createDataFrame(
        [(1, long), (2, short), (3, oversize), (4, "tiny")],
        "doc_id long, text string")
    rows = llm.qa_generate(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}          # 3 oversize-skipped, 4 yields 0 pairs
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 1
    p0 = sorted(by_doc[1], key=lambda r: r.pair_idx)[0]
    # pair 1 asks about words 1..8 and answers with words 9..16
    assert p0.question == "Hvad siges om " + " ".join(f"w{i}" for i in range(8)) + "?"
    assert p0.answer == " ".join(f"w{i}" for i in range(8, 16)) + "."


def test_qa_parse_marker_count_rule(spark):
    # create_QA_dataset.py case 3: mismatched Q/A marker counts -> drop doc
    comp = (f"{llm.Q_MARK} 1: a?\n{llm.A_MARK} 1: b.\n{llm.Q_MARK} 2: c?")
    df = spark.createDataFrame([(1, comp)], "doc_id long, comp string")
    qs = F.regexp_extract_all("comp", F.lit(llm.Q_MARK + r" \d+: (.+)"), 1)
    ans = F.regexp_extract_all("comp", F.lit(llm.A_MARK + r" \d+: (.+)"), 1)
    out = (df.select(qs.alias("qs"), ans.alias("ans"))
           .filter((F.size("qs") > 0) & (F.size("qs") == F.size("ans"))))
    assert out.count() == 0


def test_complete_prompts_retry_and_ledger(spark):
    calls = {"n": 0}

    def flaky(prompts):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("Rate limit reached, slow down")
        return ["ok:" + p for p in prompts]

    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    rows = {r.doc_id: r for r in
            llm.complete_prompts(df.coalesce(1), completer=flaky,
                                 max_tries=2).collect()}
    assert rows[1].status == "ok" and rows[1].completion == "ok:a"

    def dead(prompts):
        raise ValueError("permanent")

    rows = {r.doc_id: r for r in
            llm.complete_prompts(df.coalesce(1), completer=dead,
                                 max_tries=2).collect()}
    assert all(r.status == "error" and r.completion is None
               and "ValueError" in r.error for r in rows.values())


def test_complete_prompts_ragged_response_is_ledgered(spark):
    """A batched endpoint returning N-1 completions for N prompts (a real
    LLM-API failure mode) must become error ROWS for the sub-batch, not a
    ragged-DataFrame ValueError that aborts the task."""
    def drops_one(prompts):
        return ["ok:" + p for p in prompts][:-1]

    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                               "doc_id long, text string")
    rows = llm.complete_prompts(df.coalesce(1), completer=drops_one,
                                max_tries=1).collect()
    assert len(rows) == 3
    assert all(r.status == "error" and r.completion is None
               and "MalformedResponse" in r.error for r in rows)


def test_complete_prompts_default_matches_registry_path(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i * 10))) for i in range(1, 8)],
        "doc_id long, text string")
    via_udf = {r.doc_id: r.completion
               for r in llm.complete_prompts(df).collect()}
    via_jvm = {r.doc_id: r.c for r in
               df.select("doc_id",
                         llm.synth_completion("text").alias("c")).collect()}
    assert via_udf == via_jvm


def test_api_completer_is_a_documented_stub(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    out = llm.complete_prompts(df, completer=llm.api_completer())
    with pytest.raises(Exception, match="no network/model access"):
        out.collect()


def test_rephrase_strips_and_generalizes(spark):
    df = spark.createDataFrame(
        [(1, "  Hvem stemte for finansloven i tirsdags i salen  "),
         (2, "kort"), (3, "   ")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in llm.rephrase(df).collect()}
    # stripped input is preserved as `question`; rewording keeps 6 words
    assert got[1].question == "Hvem stemte for finansloven i tirsdags i salen"
    assert got[1].rephrased == "Hvad ved man om Hvem stemte for finansloven i tirsdags?"
    assert got[2].rephrased == "Hvad ved man om kort?"
    assert 3 not in got  # whitespace-only input dropped (P11 semantics)


def test_mcq_divide_reference_split_protocol(spark):
    stem = " ".join(f"s{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, stem + " a) opt1 b) opt2"),   # options stripped from the stem
         (2, "s0 s1 s2"),                  # short stem -> 1 subquestion
         (3, "")],
        "doc_id long, text string")
    rows = llm.mcq_divide(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 1
    subs = {r.sub_idx: r.subquestion for r in by_doc[1]}
    assert subs[0] == "Hvad betyder s0 s1 s2 s3 s4?"
    assert subs[2] == "Hvad betyder s10 s11?"
    assert "a)" not in subs[2] and "opt1" not in str(subs)
    assert 3 not in by_doc


def test_mcq_divide_split_truncates_like_reference(spark):
    # divide_mcq.py:35 does split(': ')[1] — a line "Q 1: x: y" parses to "x"
    df = spark.createDataFrame([(1, "x: y z w q a b")], "doc_id long, text string")
    rows = {r.sub_idx: r.subquestion for r in llm.mcq_divide(df).collect()}
    # completion line = "Spørgsmål 1: Hvad betyder x: y z w q?" -> [1] == "Hvad betyder x"
    assert rows[0] == "Hvad betyder x"


def test_index_rerank_top3_by_score(spark):
    texts = {
        1: "a b c d e f g h",
        2: "a b c d x1 x2",          # 0.5
        3: "a x3 x4",                # 0.1
        4: "z1 z2",                  # 0.0
        5: "a b c d e f g h extra",  # 1.0
        6: "a b x5",                 # 0.2
    }
    df = spark.createDataFrame(sorted(texts.items()), "doc_id long, text string")
    got = {(r.doc_id, r.rank): (r.t_idx, r.score)
           for r in llm.index_rerank(df).collect()}
    # doc 1's passages by offset: t1=0.5 t2=0.1 t3=0.0 t4=1.0 t5=0.2
    assert got[(1, 1)] == (4, 1.0)
    assert got[(1, 2)] == (1, 0.5)
    assert got[(1, 3)] == (5, pytest.approx(0.2))


def test_mcq_pipeline_end_to_end(spark):
    # corpus: 2 MCQs (doc 0, 1) + 10 candidate docs with overlapping topics
    rows = [(0, "skat moms afgift politik a) x b) y"),
            (1, "sundhed hospital læge behandling a) x b) y")]
    topics = ["skat moms afgift", "sundhed hospital læge",
              "skat politik", "hospital behandling", "moms afgift satser"]
    for i in range(10):
        rows.append((i + 2, topics[i % 5] + f" fyld{i} " +
                     " ".join(f"w{i}_{j}" for j in range(6))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = llm.mcq_answer_pipeline(df, n_mcq=2, k_per_sub=3, token_budget=40)
    got = out.collect()
    assert got, "pipeline returned no rows"
    by_mcq = {}
    for r in got:
        by_mcq.setdefault(r.mcq_id, []).append(r)
    assert set(by_mcq) <= {0, 1}
    for mcq_id, rs in by_mcq.items():
        # pair_idx values are the kept ranks 1..n, all parsed back via the
        # reference regex and joined to real candidates
        assert sorted(r.pair_idx for r in rs) == list(range(1, len(rs) + 1))
        assert all(r.answer in "abcd" for r in rs)
        assert all(r.cand_id >= 2 for r in rs)  # MCQs never retrieve themselves
        # budget respected: kept docs' token totals fit
        # (each candidate doc has >= 8 tokens, budget 40 -> at most 5)
        assert len(rs) <= 5
    # determinism
    again = llm.mcq_answer_pipeline(df, n_mcq=2, k_per_sub=3, token_budget=40)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))


def test_relevance_scores_exact_overlap_model(spark):
    # doc i = words f"t{i}" .. ; craft overlaps we can hand-compute
    texts = {
        1: "a b c d e f g h",        # question tokens = all 8
        2: "a b c d x1 x2",          # overlap 4/8 -> 0.5
        3: "a x3 x4",                # overlap 1/8 -> floor(1.25)/10 = 0.1
        4: "z1 z2",                  # overlap 0 -> 0.0
        5: "a b c d e f g h extra",  # overlap 8/8 -> 1.0
        6: "q r s",
    }
    df = spark.createDataFrame(sorted(texts.items()), "doc_id long, text string")
    got = {(r.doc_id, r.t_idx): r.score
           for r in llm.relevance_scores(df).collect()}
    assert got[(1, 1)] == 0.5
    assert got[(1, 2)] == pytest.approx(0.1)
    assert got[(1, 3)] == 0.0
    assert got[(1, 4)] == 1.0
    # doc 1 has 5 following docs only up to id 6 -> t_idx 1..5
    assert {t for (d, t) in got if d == 1} == {1, 2, 3, 4, 5}
    # every score is a one-decimal value in [0, 1]
    for s in got.values():
        assert 0.0 <= s <= 1.0 and math.isclose(s * 10, round(s * 10))
