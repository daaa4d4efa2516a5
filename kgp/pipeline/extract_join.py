"""S2, open-vocabulary path — join-based mention detection.

The default extractor (pipeline.extract) broadcasts the surface
vocabulary and scans each sentence with an in-memory matcher — ideal for
a closed gazetteer, impossible for an open vocabulary (10^8 surfaces
breaks the driver collect and the broadcast).  This path replaces the
broadcast with a JOIN, which is scale-free:

1. sentences exploded per turn (JVM: terminator-marker regexp split);
2. every 1..MAX_SURFACE_TOKENS token n-gram generated JVM-side
   (transform over position/size sequences + slice/array_join — no
   Python, no quadratic strings: Σ spans ≈ 5·tokens);
3. candidate spans equi-joined against the surface table on the exact
   cleaned-gram string (broadcast when small, shuffle-hash when huge —
   Catalyst/AQE picks; EITHER WAY no driver collect);
4. leftmost-longest non-overlapping selection + cue-phrase pair rules in
   one grouped-map per turn (tiny groups), mirroring textops.extract_turn
   exactly — pytest asserts bit-identical mentions AND triples vs the
   broadcast path.

The surface table is the same `(surface, entity_id, entity_type)`
relation the vocabulary exposes; `min_by(entity_type, entity_id)` per
surface reproduces the matcher's lowest-id tie-break.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import schemas
from ..textops import (DEFAULT_PAIR_PRED, MAX_SURFACE_TOKENS, MENTION_PRED,
                       TOOL_PRED, _EDGE_PUNCT, find_cues)

_EDGE_RE = "^[" + "".join("\\" + c if c in r"[]\^-" else c for c in _EDGE_PUNCT) + "]+|[" + \
           "".join("\\" + c if c in r"[]\^-" else c for c in _EDGE_PUNCT) + "]+$"


def surface_table(vocab: DataFrame) -> DataFrame:
    """(surface, entity_id, entity_type): one row per distinct surface,
    lowest-id entity wins — the GazetteerMatcher index as a relation."""
    surf = vocab.select(
        "entity_id", "entity_type",
        F.explode(F.concat(F.array("canonical_name"), "aliases")).alias("surface"),
    ).filter(
        (F.size(F.split(F.col("surface"), r"\s+")) <= MAX_SURFACE_TOKENS)
        & (F.length(F.trim(F.col("surface"))) > 0)
    )
    return surf.groupBy("surface").agg(
        F.min("entity_id").alias("entity_id"),
        F.expr("min_by(entity_type, entity_id)").alias("entity_type"),
    )


def _candidate_spans(ordered: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, ts, tool, sent_idx, sentence, start, size, gram)
    — every cleaned token n-gram, entirely JVM expressions."""
    # edge-strip with Java \s (== textops._ASCII_WS), NOT F.trim: trim
    # removes only the space char, so a tab-leading turn would keep the
    # tab, split into an empty first token, and shift every span index
    # off the broadcast path's (pytest asserts bit-identical output)
    edge_stripped = F.regexp_replace(F.col("text"), r"^\s+|\s+$", "")
    # lookbehind split == textops._SENT_SPLIT_RE exactly — NOT a marker
    # char: the previous chr(31) marker collided with \x1f already present
    # in the text (the Python path treats C0 separators as ordinary chars),
    # and a marker-free split cannot collide with anything
    sents = F.filter(
        F.split(edge_stripped, r"(?<=[.!?])\s+"),
        lambda s: F.length(F.regexp_replace(s, r"^\s+|\s+$", "")) > 0,
    )
    # posexplode_OUTER: a whitespace-only turn (order.py's gate strips
    # only spaces) has ZERO sentences but must still reach assemble as a
    # carrier row — the broadcast path emits its EXTRACTED row (with the
    # uses_tool triple) for every ordered turn, and bit-identity requires
    # this path to do the same; the null-sentence row carries ts/tool
    d = ordered.select(
        "conv_id", "turn_idx", "ts", "tool",
        F.posexplode_outer(sents).alias("sent_idx", "sentence"),
    )
    toks = F.transform(
        F.split(F.col("sentence"), r"\s+"),
        lambda t: F.regexp_replace(t, _EDGE_RE, ""),
    )
    d = d.withColumn("toks", toks)
    spans = F.flatten(F.transform(
        F.sequence(F.lit(0), F.size("toks") - 1),
        lambda i: F.transform(
            F.sequence(F.lit(1), F.least(F.lit(MAX_SURFACE_TOKENS), F.size("toks") - i)),
            lambda s: F.struct(
                i.alias("start"), s.alias("size"),
                F.array_join(F.slice("toks", i + 1, s), " ").alias("gram"),
            ),
        ),
    ))
    return (
        d.select("conv_id", "turn_idx", "ts", "tool", "sent_idx", "sentence",
                 F.explode_outer(spans).alias("sp"))
        .select("conv_id", "turn_idx", "ts", "tool", "sent_idx", "sentence",
                F.col("sp.start").alias("start"), F.col("sp.size").alias("size"),
                F.col("sp.gram").alias("gram"))
    )


def extract_join(ordered: DataFrame, surfaces: DataFrame) -> DataFrame:
    """ordered → schemas.EXTRACTED, via the join-based matcher.
    Output is exactly pipeline.extract's (pytest-asserted)."""
    spans = _candidate_spans(ordered)
    # every sentence survives (left join): span-less turns still emit
    # their tool triple, and sentence text rides along for cue detection
    matched = spans.join(
        surfaces.select(F.col("surface").alias("gram"), "entity_type"),
        "gram", "left",
    )
    # only hits + one carrier row per sentence move to the grouped-map
    carrier = (
        matched.withColumn("_hit", F.col("entity_type").isNotNull())
        # null sentence = the zero-sentence turn's carrier row (see
        # _candidate_spans): keep it so the turn still assembles
        .filter(F.col("_hit") | ((F.col("start") == 0) & (F.col("size") == 1))
                | F.col("sentence").isNull())
    )

    def assemble(key, pdf):  # no annotations: applyInPandas infers from them
        conv_id, turn_idx = key[0], int(key[1])
        ts = pdf["ts"].iloc[0]
        tool = pdf["tool"].iloc[0]
        mentions, triples = [], []
        if isinstance(tool, str) and tool:
            triples.append((f"conv:{conv_id}", TOOL_PRED, f"tool:{tool}"))
        for sent_idx, grp in pdf.sort_values("sent_idx").groupby("sent_idx", sort=True):
            sentence = grp["sentence"].iloc[0]
            hits = grp[grp["_hit"]]
            spans_l = sorted(
                zip(hits["start"], hits["size"], hits["gram"], hits["entity_type"]),
                key=lambda t: (t[0], -t[1]),
            )
            picked = []
            pos = 0
            for start, size, gram, etype in spans_l:
                if start >= pos:
                    picked.append((int(start), int(size), gram, etype))
                    pos = start + size
            for start, size, gram, etype in picked:
                mentions.append((int(sent_idx), gram, etype))
                triples.append((f"conv:{conv_id}", MENTION_PRED, f"srf:{gram}"))
            if len(picked) >= 2:
                cues = find_cues(sentence)
                for a, b in zip(picked, picked[1:]):
                    pred = DEFAULT_PAIR_PRED
                    for cpred, cs, ce in cues:
                        if a[0] + a[1] <= cs and ce <= b[0]:
                            pred = cpred
                            break
                    triples.append((f"srf:{a[2]}", pred, f"srf:{b[2]}"))
        return pd.DataFrame({
            "conv_id": [conv_id],
            "turn_idx": pd.array([turn_idx], dtype="int32"),
            "ts": [ts],
            "mentions": [mentions],
            "triples": [triples],
        })

    return carrier.groupBy("conv_id", "turn_idx").applyInPandas(
        assemble, schema=schemas.EXTRACTED)
