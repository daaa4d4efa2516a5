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

LINK_MINHASH_HASHES = 16
LINK_MINHASH_BANDS = 8

# Frequency cap for token blocks: a `t:<token>` block with more members is
# dropped entirely (both engines apply the identical cap, so the candidate
# sets stay equal by construction).  Rationale: short/stopword-ish tokens
# used to be excluded by LENGTH — a false premise, since pairs whose only
# shared token is short CAN clear verification (subset names always score
# 100: token_set_ratio('ibm', 'ibm corp') = 100; typo pairs like
# 'eva jensen'/'eva jnsen' score ~95).  Rarity, not length, is what makes
# a token block cheap: a rare token block is a handful of candidates, a
# frequent one ("jensen") is O(df²) verify work that AQE can't save.
# Pairs that lose their only shared-token block to the cap are still
# caught by the 8×2-hash minhash bands (char-3gram J=0.6 → band-collision
# probability 1-(1-0.6²)⁸ ≈ 0.97).
MAX_BLOCK_DF = 64


def blocking_keys(name: str) -> list[str]:
    """All blocking keys for one (already canonical-cased) entity name.

    Token blocks include EVERY token (no length filter — see MAX_BLOCK_DF);
    the frequency cap is applied corpus-wide by the caller on both engines
    (Spark: groupBy(bkey) count + anti-join; oracle: dict len check).
    """
    norm = normalize_surface(name)
    keys = [f"x:{norm}"]
    keys += [f"t:{tok}" for tok in sorted(set(norm.split()))]
    keys += [f"m:{k}" for k in minhash_band_keys(norm, LINK_MINHASH_HASHES, LINK_MINHASH_BANDS)]
    return keys


def block_is_capped(key: str, size: int) -> bool:
    """Shared cap rule: only token blocks are frequency-capped (exact-norm
    blocks are true positives by definition; minhash band keys are content
    hashes, near-uniform by construction)."""
    return key.startswith("t:") and size > MAX_BLOCK_DF


def verify_pair(name_a: str, name_b: str) -> bool:
    """Candidate pair survives iff fuzzy score clears the reference threshold."""
    na, nb = normalize_surface(name_a), normalize_surface(name_b)
    if na == nb:
        return True
    return token_set_ratio(na, nb) >= FUZZY_LINK_THRESHOLD
