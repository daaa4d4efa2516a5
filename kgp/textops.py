"""Pure text-processing core shared by the Spark pipeline and the pandas oracle.

Everything here is a deterministic pure function of its inputs — no wall
clock, no network, no global mutable state (besides an idempotent matcher
cache). The Spark stages call these inside Arrow-batched pandas UDFs; the
oracle calls them row-by-row; parity between the two is therefore by
construction and any divergence is a bug the test suite catches.

Reference semantics mirrored here (see SURVEY.md §2.3, §2.9):
- sentence segmentation per turn    (reference src/data/extract_entities.py:34)
- per-sentence mention detection    (reference src/data/extract_entities.py:38-44,
  flair NER replaced by a deterministic closed-gazetteer matcher so that
  precision/recall vs the oracle is measurable)
- surface-form normalization        (reference notebooks/entity_alias_mapping.ipynb
  cell-13 paren/diacritic cleanup)
- cue-phrase relation extraction    (stand-in for the role-typed edge
  predicates of notebooks/rdf_graph.ipynb cell-14..cell-23)
- minhash/shingle signatures for near-duplicate removal
  (reference src/data/remove_duplicate_paragraphs.py:104-132)
"""

from __future__ import annotations

import re
import unicodedata
from typing import NamedTuple

# ---------------------------------------------------------------------------
# Sentence segmentation (T1)
# ---------------------------------------------------------------------------

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    """Split a turn's text into sentences on terminal punctuation.

    Mirrors the reference's regex split variant
    (src/data/extract_paragraphs_faster.py:31  re.split('[?.]', ...)) but
    keeps the terminator so surface offsets stay meaningful.
    """
    if not text:
        return []
    return [s for s in _SENT_SPLIT_RE.split(text.strip()) if s.strip()]


# ---------------------------------------------------------------------------
# Normalization (P6/P7/P10 analogs)
# ---------------------------------------------------------------------------

_WS_RE = re.compile(r"\s+")
_EDGE_PUNCT = ".,!?;:()\"'«»`´’"


def strip_diacritics(s: str) -> str:
    out = []
    for ch in unicodedata.normalize("NFKD", s):
        if unicodedata.combining(ch):
            continue
        # Nordic letters don't decompose to ASCII under NFKD; map explicitly.
        out.append({"æ": "ae", "ø": "o", "å": "a", "Æ": "Ae", "Ø": "O", "Å": "A", "ß": "ss"}.get(ch, ch))
    return "".join(out)


def normalize_surface(s: str) -> str:
    """Canonical lowercase/diacritic-free/space-collapsed form of a surface."""
    s = strip_diacritics(s).lower()
    s = _WS_RE.sub(" ", s)
    return s.strip(_EDGE_PUNCT + " \t\n\r")


def clean_token(tok: str) -> str:
    """Strip sentence punctuation from token edges (vocab surfaces carry none)."""
    return tok.strip(_EDGE_PUNCT)


# ---------------------------------------------------------------------------
# Gazetteer mention matcher (M1 stand-in)
# ---------------------------------------------------------------------------

MAX_SURFACE_TOKENS = 5


class Mention(NamedTuple):
    # NamedTuple, not dataclass: the matcher allocates one per hit in the
    # corpus-wide hot loop; NamedTuple construction is a C-level tuple
    surface: str          # the vocab surface form that matched (verbatim)
    tok_start: int        # token index in the sentence (inclusive)
    tok_end: int          # token index (exclusive)
    entity_type: str      # type of the lowest-id candidate entity


class GazetteerMatcher:
    """Leftmost-longest exact n-gram matcher over a closed surface vocabulary.

    Deterministic stand-in for the reference's flair/HF NER
    (src/data/extract_entities.py:29-50): tokenizes the sentence, slides
    1..MAX_SURFACE_TOKENS grams left-to-right, prefers the longest match at
    each position, and never emits overlapping mentions.  O(tokens * 5) dict
    lookups per sentence — scales linearly, no per-entity regex alternation,
    and serializes cheaply for broadcast to executors.
    """

    def __init__(self, surface_rows: list[tuple[str, int, str]]):
        """surface_rows: (surface, entity_id, entity_type) — from entity_vocab."""
        index: dict[str, tuple[int, str]] = {}
        max_toks = 1
        for surface, eid, etype in sorted(surface_rows, key=lambda r: (r[0], r[1])):
            ntoks = len(surface.split())
            if ntoks == 0 or ntoks > MAX_SURFACE_TOKENS:
                continue
            max_toks = max(max_toks, ntoks)
            cur = index.get(surface)
            if cur is None or eid < cur[0]:
                index[surface] = (eid, etype)
        self._index = index
        self._max_toks = max_toks

    def find(self, sentence: str) -> list[Mention]:
        raw = sentence.split()
        toks = [clean_token(t) for t in raw]
        n = len(toks)
        out: list[Mention] = []
        i = 0
        while i < n:
            hit = None
            for size in range(min(self._max_toks, n - i), 0, -1):
                gram = " ".join(toks[i : i + size])
                ent = self._index.get(gram)
                if ent is not None:
                    hit = (gram, size, ent)
                    break
            if hit is not None:
                gram, size, (eid, etype) = hit
                out.append(Mention(gram, i, i + size, etype))
                i += size
            else:
                i += 1
        return out


# ---------------------------------------------------------------------------
# Cue-phrase relation detection (rolle-dict predicate analog)
# ---------------------------------------------------------------------------

# (pred, cue phrase) — cue phrases are all-lowercase multi-token literals.
# Analog of the role-typed predicates built from the rolle dimension tables
# (reference notebooks/rdf_graph.ipynb cell-14: rolle.replace(" ", "_")).
PRED_CUES: list[tuple[str, str]] = [
    ("asks_about", "asks about"),
    ("refers_to", "refers to"),
    ("works_with", "works with"),
    ("reports_to", "reports to"),
    ("meets_with", "meets with"),
    ("criticizes", "criticizes"),
]
DEFAULT_PAIR_PRED = "co_occurs_with"
MENTION_PRED = "mentions"
TOOL_PRED = "uses_tool"

_CUE_TOKS = [(pred, tuple(cue.split())) for pred, cue in PRED_CUES]


def find_cues(sentence: str) -> list[tuple[str, int, int]]:
    """Return (pred, tok_start, tok_end) for each cue occurrence."""
    toks = [clean_token(t).lower() for t in sentence.split()]
    n = len(toks)
    hits: list[tuple[str, int, int]] = []
    for i in range(n):
        for pred, cue in _CUE_TOKS:
            k = len(cue)
            if i + k <= n and tuple(toks[i : i + k]) == cue:
                hits.append((pred, i, i + k))
    hits.sort(key=lambda h: (h[1], h[2]))
    return hits


def extract_sentence(sentence: str, matcher: GazetteerMatcher):
    """Extract (mentions, pair_triples) from one sentence.

    Pair rule (deterministic): for each consecutive mention pair (a, b) in
    token order, the predicate is the first cue lying strictly between the
    two spans, else the default ``co_occurs_with``.
    """
    mentions = matcher.find(sentence)
    pairs: list[tuple[str, str, str]] = []
    if len(mentions) >= 2:
        cues = find_cues(sentence)
        for a, b in zip(mentions, mentions[1:]):
            pred = DEFAULT_PAIR_PRED
            for cpred, cs, ce in cues:
                if a.tok_end <= cs and ce <= b.tok_start:
                    pred = cpred
                    break
            pairs.append((a.surface, pred, b.surface))
    return mentions, pairs


# ---------------------------------------------------------------------------
# Turn-level extraction — the single unit of work both engines share
# ---------------------------------------------------------------------------

def extract_turn(conv_id: str, turn_idx: int, text: str, tool: str | None,
                 matcher: GazetteerMatcher):
    """Extract (mention_rows, raw_triple_rows) for one turn.

    mention_rows:    (conv_id, turn_idx, sent_idx, mention, entity_type)
    raw_triple_rows: (conv_id, turn_idx, subj, pred, obj) where subj/obj are
                     either ``conv:<id>`` / ``tool:<name>`` literals or
                     *surface forms* (prefixed ``srf:``) awaiting linking.
    """
    mention_rows = []
    triple_rows = []
    if tool:
        triple_rows.append((conv_id, turn_idx, f"conv:{conv_id}", TOOL_PRED, f"tool:{tool}"))
    for sent_idx, sent in enumerate(split_sentences(text)):
        mentions, pairs = extract_sentence(sent, matcher)
        for m in mentions:
            mention_rows.append((conv_id, turn_idx, sent_idx, m.surface, m.entity_type))
            triple_rows.append((conv_id, turn_idx, f"conv:{conv_id}", MENTION_PRED, f"srf:{m.surface}"))
        for subj, pred, obj in pairs:
            triple_rows.append((conv_id, turn_idx, f"srf:{subj}", pred, f"srf:{obj}"))
    return mention_rows, triple_rows


# ---------------------------------------------------------------------------
# Shingles / minhash signatures (D2 near-dup, J6/J7 LSH blocking)
# ---------------------------------------------------------------------------

# Fixed affine hash parameters (seeded, content-independent) — deterministic
# across processes/executors, unlike Python's salted hash().  The hash
# family is multiply-shift over Z_2^64 (h_i(x) = a_i*x + b_i mod 2^64,
# a_i odd): numpy uint64 arithmetic wraps at exactly 2^64, so the scalar
# and the batch-vectorized signature paths are bit-identical — the reason
# this replaced a Mersenne-prime modular family (whose 122-bit
# intermediates don't fit uint64 and forced per-shingle Python loops).
_MINHASH_A: list[int] = []
_MINHASH_B: list[int] = []
_state = 88172645463325252
for _ in range(64):
    # xorshift64 — deterministic pseudo-random parameter stream
    _state ^= (_state << 13) & 0xFFFFFFFFFFFFFFFF
    _state ^= _state >> 7
    _state ^= (_state << 17) & 0xFFFFFFFFFFFFFFFF
    _MINHASH_A.append(_state | 1)  # odd multiplier
    _state ^= (_state << 13) & 0xFFFFFFFFFFFFFFFF
    _state ^= _state >> 7
    _state ^= (_state << 17) & 0xFFFFFFFFFFFFFFFF
    _MINHASH_B.append(_state)


def _fnv1a(data: str) -> int:
    h = 0xCBF29CE484222325
    for byte in data.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def char_shingles(s: str, k: int = 3) -> set[int]:
    s = normalize_surface(s)
    if len(s) < k:
        return {_fnv1a(s)} if s else set()
    return {_fnv1a(s[i : i + k]) for i in range(len(s) - k + 1)}


def word_bigram_shingles(s: str) -> set[int]:
    """Hashed distinct word-bigram shingles (document-level near-dup unit;
    same shingling as ops.dedup.ngram_jaccard_pairs_sqlable)."""
    s = _WS_RE.sub(" ", (s or "").strip().lower())
    w = s.split(" ")
    if len(w) < 2:
        return {_fnv1a(s)} if s else set()
    return {_fnv1a(f"{a} {b}") for a, b in zip(w, w[1:])}


def shingle_set(s: str, mode: str = "char", k: int = 3) -> set[int]:
    return char_shingles(s, k) if mode == "char" else word_bigram_shingles(s)


def minhash_signature(shingles: set[int] | list[int], num_hashes: int = 16) -> tuple[int, ...]:
    import numpy as np

    if not shingles:
        return tuple([0] * num_hashes)
    x = np.fromiter(shingles, dtype=np.uint64)
    a = np.array(_MINHASH_A[:num_hashes], dtype=np.uint64)
    b = np.array(_MINHASH_B[:num_hashes], dtype=np.uint64)
    # uint64 multiply/add wrap at 2^64 — exactly the hash family definition
    sig = (x[:, None] * a[None, :] + b[None, :]).min(axis=0)
    return tuple(int(v) for v in sig)


def minhash_band_keys(s: str, num_hashes: int = 16, bands: int = 4, k: int = 3,
                      mode: str = "char") -> list[str]:
    """LSH band keys: signature split into ``bands`` rows-per-band groups.

    Two strings sharing any band key are near-dup / link candidates.  Both
    the oracle and the Spark stages use exactly these keys, so candidate
    generation is identical by construction (FIXTURES.md §5 parity note).
    """
    sig = minhash_signature(shingle_set(s, mode, k), num_hashes)
    rows = num_hashes // bands
    return [f"{bi}:" + ",".join(str(x) for x in sig[bi * rows : (bi + 1) * rows]) for bi in range(bands)]


# Near-duplicate boilerplate removal spec (D2): a turn is boilerplate if
# >= MIN_DUP_GROUP turns (itself included) share its dup_key — the
# normalized text with digit runs masked.  Mirrors "drop if >=5 neighbors
# within angular threshold" (reference
# src/data/remove_duplicate_paragraphs.py:117-128) with a deterministic,
# single-groupBy-scalable similarity key instead of a per-row ANN lookup
# (the reference's boilerplate examples differ only in numbers/refs, which
# the mask collapses exactly).
MIN_DUP_GROUP = 6

_DIGITS_RE = re.compile(r"\d+")


def dup_key(text: str) -> str:
    """Near-duplicate grouping key: lowercase, whitespace-collapsed,
    digit runs masked.

    Deliberately NOT diacritic-stripped: boilerplate instances of one
    template share their diacritics, so stripping buys no extra grouping
    while costing a per-char NFKD pass — this exact pipeline is
    vectorizable as pandas ``.str`` ops (see pipeline.order._dup_key),
    ~20× faster per row at corpus scale.
    """
    s = _WS_RE.sub(" ", (text or "").lower()).strip()
    return _DIGITS_RE.sub("#", s)


# ---------------------------------------------------------------------------
# Token counting / quality heuristics (T6 + training-data ops)
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"\w+")


def count_tokens(text: str) -> int:
    """Whitespace token count (reference notebooks/count_tokens.ipynb cell-1)."""
    return len(text.split()) if text else 0


def count_words(text: str) -> int:
    return len(_WORD_RE.findall(text)) if text else 0
