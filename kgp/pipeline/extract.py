"""S2 — vectorized mention detection + triple extraction (mapInPandas).

One Arrow-batched pass over the ordered turns emits BOTH mention rows and
raw triple rows (union schema EXTRACTED) — the per-sentence NER loop of the
reference (src/data/extract_entities.py:29-50) re-expressed as an
iterator-of-batches pandas transform: the gazetteer matcher is built once
per python worker from a broadcast surface list (analog of loading the NER
model once per executor, SURVEY.md §2.9 M1) and applied to every batch.

No per-row Python at the Spark API layer (input_hint requirement): Spark
hands us Arrow record batches; the tight loop is plain-python over an
in-memory batch, exactly like the reference's chunked NER calls
(entity_alias_mapping.ipynb cell-16, chunks of 100).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .. import schemas
from ..textops import GazetteerMatcher, extract_turn

# per-python-worker matcher cache — python workers are reused across tasks,
# so the matcher (like an NER model) is constructed once per executor core.
_MATCHER_CACHE: dict[int, GazetteerMatcher] = {}


def _get_matcher(broadcast) -> GazetteerMatcher:
    key = id(broadcast)
    m = _MATCHER_CACHE.get(key)
    if m is None:
        _MATCHER_CACHE.clear()
        m = GazetteerMatcher(broadcast.value)
        _MATCHER_CACHE[key] = m
    return m




def extract(ordered: DataFrame, surface_rows: list[tuple[str, int, str]]) -> DataFrame:
    """ordered(conv_id, turn_idx, role, text, tool, ts) -> EXTRACTED rows."""
    sc = ordered.sparkSession.sparkContext
    b_surfaces = sc.broadcast(surface_rows)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = _get_matcher(b_surfaces)
        for pdf in batches:
            # columnar assembly: one list per output column instead of one
            # tuple per output row — the extraction loop runs corpus-wide,
            # so per-row tuple churn is measurable allocator pressure
            kind, convs, tidx, sidx = [], [], [], []
            men, etyp, subj, pred, obj, tss = [], [], [], [], [], []
            for conv_id, turn_idx, text, tool, ts in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"], pdf["ts"]
            ):
                mrows, trows = extract_turn(
                    conv_id, int(turn_idx), text or "",
                    tool if isinstance(tool, str) and tool else None, matcher,
                )
                for c, t, s, mention, etype in mrows:
                    kind.append("mention"); convs.append(c); tidx.append(t)
                    sidx.append(s); men.append(mention); etyp.append(etype)
                    subj.append(None); pred.append(None); obj.append(None)
                    tss.append(ts)
                for c, t, sj, pr, ob in trows:
                    kind.append("triple"); convs.append(c); tidx.append(t)
                    sidx.append(None); men.append(None); etyp.append(None)
                    subj.append(sj); pred.append(pr); obj.append(ob)
                    tss.append(ts)
            pdf_out = pd.DataFrame({
                "kind": kind, "conv_id": convs,
                "turn_idx": pd.array(tidx, dtype="int32"),
                "sent_idx": pd.array(sidx, dtype="Int32"),
                "mention": men, "entity_type": etyp,
                "subj": subj, "pred": pred, "obj": obj, "ts": tss,
            })
            yield pdf_out

    return ordered.select("conv_id", "turn_idx", "text", "tool", "ts").mapInPandas(
        run, schema=schemas.EXTRACTED
    )


def mentions_view(extracted: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return extracted.filter(F.col("kind") == "mention").select(
        "conv_id", "turn_idx",
        F.col("sent_idx").cast("int").alias("sent_idx"),
        "mention", "entity_type",
    )


def raw_triples_view(extracted: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return extracted.filter(F.col("kind") == "triple").select(
        "conv_id", "turn_idx", "subj", "pred", "obj", "ts"
    )
