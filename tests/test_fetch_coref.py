"""S3/S4 fetch+extract and M5 coref stand-in tests.

Reference behaviors checked here: retrying fetch with a per-row failure
ledger (get_files.py:86-102), HTML get_text / PDF page-loop extraction
(get_files.py:19-42), and nearest-antecedent anaphora binding
(danlp_experiments.ipynb FCoref shape).
"""

import pytest

from kgp.ops import coref, fetch


def test_fetch_synth_transport_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "synth://a"), (2, "synth://b"), (3, "synth://a")],
        "doc_id long, url string")
    out = {r.url: r for r in fetch.fetch_documents(df).collect()}
    assert all(r.status == "ok" and r.error is None for r in out.values())
    # same url -> same bytes; distinct urls -> distinct payloads
    again = {r.url: r for r in fetch.fetch_documents(df).collect()}
    assert out["synth://a"].payload == again["synth://a"].payload
    assert out["synth://a"].payload != out["synth://b"].payload


def test_fetch_failure_ledger_not_task_failure(spark):
    calls = {}

    def flaky(url: str) -> bytes:
        n = calls.get(url, 0) + 1
        calls[url] = n
        if url.endswith("dead"):
            raise ValueError("permanent")
        if n < 2:
            raise OSError("transient")
        return b"ok:" + url.encode()

    df = spark.createDataFrame(
        [(1, "x://good"), (2, "x://dead")], "doc_id long, url string")
    rows = {r.url: r for r in
            fetch.fetch_documents(df.coalesce(1), transport=flaky,
                                  max_tries=3).collect()}
    good, dead = rows["x://good"], rows["x://dead"]
    assert good.status == "ok" and bytes(good.payload) == b"ok:x://good"
    assert dead.status == "error" and dead.payload is None
    assert "ValueError" in dead.error  # D4 ledger row, job still succeeded


def test_fetch_null_id_and_url_are_ledgered(spark):
    """NULL keys are an admitted input class (nullable schemas): a NULL
    id becomes a NULL-id row and a NULL url an error row — never an
    int()/startswith TypeError that kills the fetch stage."""
    df = spark.createDataFrame(
        [(None, "synth://ok"), (7, None)], "doc_id long, url string")
    rows = fetch.fetch_documents(df.coalesce(1)).collect()
    by_url = {r.url: r for r in rows}
    assert by_url["synth://ok"].doc_id is None
    assert by_url["synth://ok"].status == "ok"
    nullurl = by_url[None]
    assert nullurl.doc_id == 7 and nullurl.status == "error"
    assert nullurl.payload is None and nullurl.error


def test_fetch_http_is_a_documented_stub():
    with pytest.raises(NotImplementedError):
        fetch.default_transport("https://example.org/x")
    with pytest.raises(ValueError):
        fetch.default_transport("gopher://nope")


def test_html_extraction_semantics(spark):
    payload = ("<html><head><style>p{x}</style>"
               "<script>var a = '<p>not text</p>';</script></head>"
               "<body><h1>T&amp;A</h1>  <p>one\n two</p>"
               "<div>PDF to HTML conversion made easy</div></body></html>")
    df = spark.createDataFrame([(1, "html", payload)],
                               "doc_id long, kind string, payload string")
    (row,) = fetch.extract_text(df).collect()
    assert row.text_out == "T&A one two"


def test_pdf_extraction_drops_blank_pages(spark):
    df = spark.createDataFrame([(1, "pdf", "a  b\f \f c\td")],
                               "doc_id long, kind string, payload string")
    (row,) = fetch.extract_text(df).collect()
    assert row.text_out == "a b\nc d"


def test_coref_nearest_antecedent(spark):
    df = spark.createDataFrame(
        [(1, "the customer sent it and this order cancelled it"),
         (2, "it has no antecedent before this customer")],
        "doc_id long, text string")
    out = coref.resolve_anaphora(
        df, anaphors=("it", "this"), antecedents=("customer", "order"))
    got = {(r.doc_id, r.pos): (r.anaphor, r.ant_pos, r.antecedent)
           for r in out.collect()}
    # doc 1: "it"@3 -> customer@1; "this"@5 -> customer@1; "it"@8 -> order@6
    assert got[(1, 3)] == ("it", 1, "customer")
    assert got[(1, 5)] == ("this", 1, "customer")
    assert got[(1, 8)] == ("it", 6, "order")
    # doc 2: leading "it" has no preceding antecedent -> suppressed;
    # "this"@5 binds forward-most preceding... none before pos 5? antecedent
    # "customer" is AT pos 6, after "this" -> suppressed too.
    assert not any(d == 2 for d, _ in got)
