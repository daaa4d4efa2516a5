"""ABBA re-measure harness for the r3-flagged suspected regressions
(VERDICT r3 "what's wrong" #1): kg_edges_by_pred and t2_segment_sentences.

Runs ONE tree's two queries per process invocation (fresh JVM — no
cross-tree cache pollution) and prints a JSON line; the driver loop in
the recorded verdicts (BENCH/HOST_DRIFT.md "Round-4/Round-5 ABBA
verdict" sections) interleaves invocations across two checkouts per the
repo's noise discipline (interleaved rounds, median of per-round ratios —
single pairs are meaningless on this box, see BENCH/HOST_DRIFT.md).

Usage: python tools/abba_two_queries.py <repo_root> [sf_dir] [repeats] [query ...]

Extra positional args name the registry queries to time (default: the r3
pair kg_edges_by_pred + t2_segment_sentences); the first named query doubles
as the warmup, so per-sf builds (ANN index, ranked corpus) are paid before
any timed run.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(sys.argv[1])
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
QUERIES = sys.argv[4:] or ["kg_edges_by_pred", "t2_segment_sentences"]
sys.path.insert(0, REPO)


def main() -> None:
    from kgp.queries import REGISTRY
    from kgp.session import get_spark

    spark = get_spark(app_name="abba-two")
    times: dict[str, float] = {}
    # warmup: spin executors + load tables + per-sf builds once so no
    # timed run pays them
    REGISTRY[QUERIES[0]].fn(spark, SF_DIR).count()
    for name in QUERIES:
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.time()
            REGISTRY[name].fn(spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
    print(json.dumps({"repo": REPO, "sf_dir": SF_DIR, "times": times}))


if __name__ == "__main__":
    main()
