"""M7 — LLM-based operators (QA generation, relevance scoring).

Reference analogs (src/deployment/):
- QA generation: ``extract_qa.py:61-110`` — chunk a document, prompt
  gpt-3.5 with a Danish system template, receive a ``Spørgsmål n: … /
  Svar n: …`` layout, retry twice with a rate-limit sleep, write
  per-chunk outputs, skip oversize paragraphs into a bad-files ledger.
- Relevance scoring: ``assign_relevance.py:31-78`` — prompt the model
  with one question + 5 retrieved passages, parse ``Tekststykke n:
  <score>`` decimals back out with a regex.

The MODEL is out of scope offline (network, nondeterminism) — but the
operator shape is not, and that is what this module grafts Spark-first:

* ``complete_prompts`` is the transport: an iterator ``mapInPandas``
  stage with a pluggable ``completer`` callable bound once per worker
  (the thread-pool analog — Spark's task parallelism replaces
  ``ThreadPoolExecutor(workers=20)``), bounded retry with the
  reference's rate-limit sleep special case, and per-row status/error
  columns feeding the D4 ledger instead of failing the job.  A real
  deployment passes an API-client completer; offline the default is the
  deterministic synthesizer below, and ``api_completer`` raises
  ``NotImplementedError`` exactly like the multimodal codec / fetch
  transport stubs.
* The deterministic completion is ALSO expressed as a pure-JVM column
  (``synth_completion``) with an exact DuckDB twin, so the whole
  generate→parse round trip gets a hash-gated oracle; pytest asserts the
  Python completer and the JVM expression emit identical text.
* Parsing uses the REFERENCE's regexes (``Spørgsmål \\d+: (.+)`` /
  ``Svar \\d+: (.+)``, ``Tekststykke \\d+: …``) with the marker-count
  matching rule, emitting zero pairs on malformed output rather than
  crashing — create_QA_dataset.py's case-3 bail.

Scale shape: generation and parsing are whole-stage-codegen expressions
over one corpus scan; relevance pairing is an offset-explode equi-join
(never a cross join); the model path streams Arrow batches through a
per-worker client.  At 10^9 docs nothing here shuffles except the
explicit (doc → passage) equi-join.
"""

from __future__ import annotations

import re
import time
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# layout constants shared by the JVM expression, the Python completer,
# and both SQL twins — change together or parity breaks
N_PAIRS = 3
SPAN_WORDS = 8
MAX_TOKENS = 2500  # extract_qa.py create_chunks oversize-skip threshold
N_PASSAGES = 5     # assign_relevance.py scores 5 passages per question

Q_MARK = "Spørgsmål"
A_MARK = "Svar"
T_MARK = "Tekststykke"


def _canon(text_col) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _canon_sql(col: str) -> str:
    return f"trim(regexp_replace({col}, '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# QA generation (extract_qa.py) — deterministic completion + parse
# ---------------------------------------------------------------------------

def synth_completion(text_col: str = "text", n_pairs: int = N_PAIRS,
                     span: int = SPAN_WORDS) -> Column:
    """Deterministic stand-in for the chat completion: pair i asks about
    words [(2i-2)s+1 .. (2i-1)s] and answers with the next s words; pairs
    whose answer span is empty are dropped (short docs yield fewer
    pairs).  Pure JVM — mirrored by the Python ``synth_completer`` and
    the SQL twin."""
    ws = F.split(_canon(text_col), " ")
    lines = []
    for i in range(1, n_pairs + 1):
        q0, a0 = (2 * i - 2) * span + 1, (2 * i - 1) * span + 1
        qspan = F.array_join(F.slice(ws, q0, span), " ")
        aspan = F.array_join(F.slice(ws, a0, span), " ")
        line = F.concat(
            F.lit(f"{Q_MARK} {i}: Hvad siges om "), qspan, F.lit("?\n"),
            F.lit(f"{A_MARK} {i}: "), aspan, F.lit("."))
        lines.append(F.when(F.size(ws) >= a0, line))
    return F.concat_ws("\n", *lines)  # concat_ws skips the NULL lines


def synth_completer(prompts: list[str], n_pairs: int = N_PAIRS,
                    span: int = SPAN_WORDS) -> list[str]:
    """Python twin of ``synth_completion`` (the default ``completer`` for
    the mapInPandas path) — pytest asserts byte-equality with the JVM
    expression."""
    out = []
    for text in prompts:
        ws = re.sub(r"\s+", " ", text or "").strip().split(" ")
        if ws == [""]:
            ws = []
        lines = []
        for i in range(1, n_pairs + 1):
            q0, a0 = (2 * i - 2) * span, (2 * i - 1) * span
            if len(ws) >= a0 + 1:
                qspan = " ".join(ws[q0:q0 + span])
                aspan = " ".join(ws[a0:a0 + span])
                lines.append(f"{Q_MARK} {i}: Hvad siges om {qspan}?\n"
                             f"{A_MARK} {i}: {aspan}.")
        out.append("\n".join(lines))
    return out


def api_completer(model: str = "gpt-3.5-turbo") -> Callable[[list[str]], list[str]]:
    """The real-deployment seam (extract_qa.py:70-91 ChatCompletion
    shape).  Offline container: documented stub."""
    def call(prompts: list[str]) -> list[str]:
        raise NotImplementedError(
            f"no network/model access in this environment (model={model}); "
            "pass a completer callable to complete_prompts instead")
    return call


def complete_prompts(df: DataFrame, prompt_col: str = "text",
                     id_col: str = "doc_id",
                     completer: Callable[[list[str]], list[str]] | None = None,
                     max_tries: int = 2, rate_limit_sleep_s: float = 0.0,
                     batch_rows: int = 64) -> DataFrame:
    """(id, completion, status, error): run every prompt through the
    completer with the reference's retry protocol — up to ``max_tries``
    attempts, sleeping ``rate_limit_sleep_s`` when the error mentions a
    rate limit (extract_qa.py:100-106) — and ledger failures as rows
    instead of task aborts.  Iterator mapInPandas: the completer binds
    once per worker; prompts go through in bounded sub-batches (a
    failing batch is retried whole, like the reference's per-chunk
    loop)."""
    fn = completer or synth_completer
    out_schema = f"{id_col} long, completion string, status string, error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo:lo + batch_rows]
                prompts = ["" if p is None else str(p) for p in sub[prompt_col]]
                comps, err = None, None
                for attempt in range(max_tries):
                    try:
                        comps = fn(prompts)
                        err = None
                        break
                    except NotImplementedError:
                        raise  # configuration error, not a flaky call
                    except Exception as exc:  # noqa: BLE001 — ledger, not crash
                        err = f"{type(exc).__name__}: {exc}"
                        if "rate limit" in str(exc).lower() and rate_limit_sleep_s:
                            time.sleep(rate_limit_sleep_s)
                if comps is None:
                    comps = [None] * len(prompts)
                yield pd.DataFrame({
                    id_col: sub[id_col].astype("int64"),
                    "completion": comps,
                    "status": "ok" if err is None else "error",
                    "error": err,
                })

    return df.select(id_col, prompt_col).mapInPandas(run, schema=out_schema)


def qa_generate(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                max_tokens: int = MAX_TOKENS) -> DataFrame:
    """The M7 registry entry: oversize-skip (create_chunks bad-files
    rule) → deterministic completion → reference-regex parse with the
    marker-count rule → (doc_id, pair_idx, question, answer).  One
    corpus scan, zero Python."""
    ws = F.split(_canon(text_col), " ")
    comp = synth_completion(text_col)
    qs = F.regexp_extract_all(comp, F.lit(Q_MARK + r" \d+: (.+)"), 1)
    ans = F.regexp_extract_all(comp, F.lit(A_MARK + r" \d+: (.+)"), 1)
    d = (docs
         .filter(F.size(ws) <= max_tokens)
         .select(F.col(id_col), qs.alias("qs"), ans.alias("ans"))
         .filter((F.size("qs") > 0) & (F.size("qs") == F.size("ans"))))
    return (
        d.select(F.col(id_col), "ans",
                 F.posexplode("qs").alias("pair_idx", "question"))
        .withColumn("answer", F.element_at("ans", F.col("pair_idx") + 1))
        .select(id_col, "pair_idx", "question", "answer")
    )


def qa_generate_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id", n_pairs: int = N_PAIRS,
                    span: int = SPAN_WORDS,
                    max_tokens: int = MAX_TOKENS) -> str:
    """DuckDB twin: same layout constants, same regexes."""
    parts = []
    for i in range(1, n_pairs + 1):
        q0, a0 = (2 * i - 2) * span + 1, (2 * i - 1) * span + 1
        line = (f"'{Q_MARK} {i}: Hvad siges om ' || "
                f"array_to_string(ws[{q0}:{q0 + span - 1}], ' ') || '?' || chr(10) || "
                f"'{A_MARK} {i}: ' || "
                f"array_to_string(ws[{a0}:{a0 + span - 1}], ' ') || '.'")
        parts.append(f"CASE WHEN len(ws) >= {a0} THEN {line} END")
    comp = f"concat_ws(chr(10), {', '.join(parts)})"
    return f"""
        WITH w AS (SELECT {id_col},
                          string_split({_canon_sql(text_col)}, ' ') AS ws
                   FROM {table}),
        c AS (SELECT {id_col}, {comp} AS comp
              FROM w WHERE len(ws) <= {max_tokens}),
        p AS (SELECT {id_col},
                     regexp_extract_all(comp, '{Q_MARK} \\d+: (.+)', 1) AS qs,
                     regexp_extract_all(comp, '{A_MARK} \\d+: (.+)', 1) AS ans
              FROM c)
        SELECT {id_col},
               CAST(generate_subscripts(qs, 1) - 1 AS BIGINT) AS pair_idx,
               unnest(qs) AS question,
               ans[generate_subscripts(qs, 1)] AS answer
        FROM p
        WHERE len(qs) > 0 AND len(qs) = len(ans)
    """


# ---------------------------------------------------------------------------
# relevance scoring (assign_relevance.py) — emit-then-parse round trip
# ---------------------------------------------------------------------------

def relevance_scores(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     n_passages: int = N_PASSAGES,
                     span: int = SPAN_WORDS) -> DataFrame:
    """(doc_id, t_idx, score): each document's question (its first
    ``span`` words) scored against its next ``n_passages`` documents by
    id.  The deterministic model: score = floor(10·|q∩p|/|q|)/10 over
    DISTINCT tokens — built as the reference's actual wire format
    ('Tekststykke n: 0.x' response text) and regex-parsed back
    (assign_relevance.py:68), so the protocol round-trip is what the
    oracle hashes.  Pairing is an offset-explode EQUI-join — |docs|·n
    rows, never a cross join."""
    qtok = F.array_distinct(F.slice(F.split(_canon(text_col), " "), 1, span))
    q = docs.select(F.col(id_col).alias("qid"), qtok.alias("qtok"))
    p = docs.select(F.col(id_col).alias("pid"),
                    F.array_distinct(F.split(_canon(text_col), " ")).alias("ptok"))
    pairs = (q
             .select("qid", "qtok",
                     F.explode(F.sequence(F.lit(1), F.lit(n_passages))).alias("off"))
             .join(p, F.col("qid") + F.col("off") == F.col("pid"))
             .withColumn("k", F.floor(F.lit(10) * F.size(F.array_intersect("qtok", "ptok"))
                                      / F.size("qtok")).cast("int")))
    # the wire format: one response per question, one line per passage
    line = F.concat(F.lit(f"{T_MARK} "), F.col("off").cast("string"), F.lit(": "),
                    F.when(F.col("k") >= 10, F.lit("1.0"))
                    .otherwise(F.concat(F.lit("0."), F.col("k").cast("string"))))
    by_off = F.array_sort(F.collect_list(F.struct(F.col("off"), line.alias("ln"))))
    resp = (pairs.groupBy("qid")
            .agg(F.array_join(F.transform(by_off, lambda s: s["ln"]),
                              "\n").alias("response")))
    ts = F.regexp_extract_all("response", F.lit(T_MARK + r" (\d+): \d(?:\.\d+)?"), 1)
    ss = F.regexp_extract_all("response", F.lit(T_MARK + r" \d+: (\d(?:\.\d+)?)"), 1)
    return (resp
            .select(F.col("qid").alias(id_col), ts.alias("ts"), ss.alias("ss"))
            .select(id_col, F.posexplode("ts").alias("i", "t"), "ss")
            .select(F.col(id_col),
                    F.col("t").cast("int").alias("t_idx"),
                    F.element_at("ss", F.col("i") + 1).cast("double").alias("score")))


def relevance_scores_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id",
                         n_passages: int = N_PASSAGES,
                         span: int = SPAN_WORDS) -> str:
    return f"""
        WITH q AS (SELECT {id_col} AS qid,
                          list_distinct(string_split({_canon_sql(text_col)}, ' ')[1:{span}]) AS qtok
                   FROM {table}),
        p AS (SELECT {id_col} AS pid,
                     list_distinct(string_split({_canon_sql(text_col)}, ' ')) AS ptok
              FROM {table}),
        pairs AS (SELECT q.qid, o.off, p.ptok, q.qtok,
                         CAST(floor(10.0 * len(list_intersect(q.qtok, p.ptok))
                                    / len(q.qtok)) AS INT) AS k
                  FROM q
                  CROSS JOIN (SELECT unnest(range(1, {n_passages + 1})) AS off) o
                  JOIN p ON q.qid + o.off = p.pid),
        resp AS (SELECT qid,
                        string_agg('{T_MARK} ' || off || ': ' ||
                                   CASE WHEN k >= 10 THEN '1.0' ELSE '0.' || k END,
                                   chr(10) ORDER BY off) AS response
                 FROM pairs GROUP BY qid),
        parsed AS (SELECT qid,
                          regexp_extract_all(response, '{T_MARK} (\\d+): \\d(?:\\.\\d+)?', 1) AS ts,
                          regexp_extract_all(response, '{T_MARK} \\d+: (\\d(?:\\.\\d+)?)', 1) AS ss
                   FROM resp)
        SELECT qid AS {id_col},
               CAST(unnest(ts) AS INT) AS t_idx,
               CAST(ss[generate_subscripts(ts, 1)] AS DOUBLE) AS score
        FROM parsed
    """
