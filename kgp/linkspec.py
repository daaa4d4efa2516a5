"""Entity-linking specification shared by the Spark stage and the oracle.

Defines, as pure functions, exactly which candidate pairs are generated
(blocking) and which survive verification (token_set_ratio >= 85, the
reference's fuzzy-grouping threshold, entity_alias_mapping.ipynb
cell-20..21).  Because BOTH engines call these functions, the resulting
link graph — and therefore the connected components and canonical ids —
are identical by construction; the pytest suite asserts it.

Blocking = union of
  (a) full normalized-surface equality  (same-name linking, cell-29)
  (b) shared name token                 (cheap high-recall block)
  (c) shared char-3gram minhash band    (catches single-char typos in
                                         one-token names that (b) misses)
This is the "MinHash/LSH over normalized surface forms" of the north rule;
at cluster scale each key family is a groupBy-explode, no O(n²) pass.
"""

from __future__ import annotations

from .fuzzy import FUZZY_LINK_THRESHOLD, token_set_ratio
from .textops import minhash_band_keys, normalize_surface

LINK_MINHASH_HASHES = 12
LINK_MINHASH_BANDS = 4


MIN_BLOCK_TOKEN_LEN = 4


def blocking_keys(name: str) -> list[str]:
    """All blocking keys for one (already canonical-cased) entity name.

    Token blocks skip tokens shorter than MIN_BLOCK_TOKEN_LEN: stopword-ish
    tokens ("for", "af") put near-all institutions in one O(n²) block, and
    any pair whose ONLY shared token is such a word scores far below the
    token_set_ratio >= 85 verification bar — the block only generates
    verify work, never surviving links.  Pairs similar at the character
    level despite no shared long token are still caught by the minhash
    band keys.
    """
    norm = normalize_surface(name)
    keys = [f"x:{norm}"]
    keys += [f"t:{tok}" for tok in sorted(set(norm.split())) if len(tok) >= MIN_BLOCK_TOKEN_LEN]
    keys += [f"m:{k}" for k in minhash_band_keys(norm, LINK_MINHASH_HASHES, LINK_MINHASH_BANDS)]
    return keys


def verify_pair(name_a: str, name_b: str) -> bool:
    """Candidate pair survives iff fuzzy score clears the reference threshold."""
    na, nb = normalize_surface(name_a), normalize_surface(name_b)
    if na == nb:
        return True
    return token_set_ratio(na, nb) >= FUZZY_LINK_THRESHOLD
