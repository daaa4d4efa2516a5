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


def token_set_ratio_ge(a: str, b: str, threshold: float) -> bool:
    """Exactly ``token_set_ratio(a, b) >= threshold``, short-circuited.

    difflib documents real_quick_ratio() >= quick_ratio() >= ratio(), so a
    candidate whose cheap upper bound already misses the threshold never
    pays the O(n²) SequenceMatcher pass.  Equivalence is property-tested
    against the exact form.
    """
    ta, tb = set(a.split()), set(b.split())
    inter = sorted(ta & tb)
    s_inter = " ".join(inter)
    s_a = (s_inter + " " + " ".join(sorted(ta - tb))).strip()
    s_b = (s_inter + " " + " ".join(sorted(tb - ta))).strip()
    for x, y in ((s_inter, s_a), (s_inter, s_b), (s_a, s_b)):
        if not x and not y:
            return True  # _ratio defines empty-vs-empty as 100
        if y < x:
            x, y = y, x
        sm = SequenceMatcher(None, x, y)
        if 100.0 * sm.real_quick_ratio() < threshold:
            continue
        if 100.0 * sm.quick_ratio() < threshold:
            continue
        if 100.0 * sm.ratio() >= threshold:
            return True
    return False
