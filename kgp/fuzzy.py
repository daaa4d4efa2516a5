"""Pure-python token_set_ratio, mirroring fuzzywuzzy's algorithm.

The reference groups entity names greedily with
``fuzz.token_set_ratio(name_a, name_b) >= 85``
(notebooks/entity_alias_mapping.ipynb cell-20..cell-21).  fuzzywuzzy is not
in this environment, so we implement the same token-set construction on top
of difflib's SequenceMatcher ratio.  Both the oracle and the Spark verify
UDF call THIS function, so the threshold semantics are identical on both
sides regardless of any difference vs the original C Levenshtein ratio.
"""

from __future__ import annotations

from difflib import SequenceMatcher


def _ratio(a: str, b: str) -> float:
    if not a and not b:
        return 100.0
    # SequenceMatcher.ratio is order-dependent; canonicalize operand order
    # so the score (and therefore the link graph) is symmetric
    if b < a:
        a, b = b, a
    return 100.0 * SequenceMatcher(None, a, b).ratio()


def token_set_ratio(a: str, b: str) -> float:
    """fuzzywuzzy-style token_set_ratio in [0, 100].

    sort the unique tokens of each side; compare (intersection,
    intersection+rest_a, intersection+rest_b) pairwise and take the max.
    """
    ta, tb = set(a.split()), set(b.split())
    inter = sorted(ta & tb)
    diff_a = sorted(ta - tb)
    diff_b = sorted(tb - ta)
    s_inter = " ".join(inter)
    s_a = (s_inter + " " + " ".join(diff_a)).strip()
    s_b = (s_inter + " " + " ".join(diff_b)).strip()
    return max(_ratio(s_inter, s_a), _ratio(s_inter, s_b), _ratio(s_a, s_b))


FUZZY_LINK_THRESHOLD = 85.0  # entity_alias_mapping.ipynb cell-20
