"""Repeated-execution stability sweep over every registry oracle SQL.

DuckDB 1.0's lambda (``list_reduce``/``list_transform``) and ``unnest``
executors can misassociate rows across a CTE chain — nondeterministically
(~1% of executions) or stably-wrong on specific corpora (see
kgp/ops/docextract.py's hazard notes).  A twin that hash-matches Spark
once can therefore still flake in the driver's gate.  This tool runs each
oracle SQL ``N_RUNS`` times on FRESH connections over the same parquet
views and reports any query whose canonicalized result hash is not
constant across runs.  No Spark involved — it sweeps only the DuckDB side.

Usage: python tools/oracle_sweep.py [sf_dir] [n_runs] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 15
ONLY = set(sys.argv[3:])

from tools._common import create_views  # noqa: E402


def _plain(v):
    """Recursively ndarray→list so repr never hits numpy's '...'-truncated
    print form (which would let two distinct long vectors hash equal)."""
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    return v


def _hash(df) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    cols = [[repr(_plain(v)) for v in df[c]] for c in df.columns]
    rows = sorted(zip(*cols)) if cols else []
    return hashlib.sha256(repr(rows).encode()).hexdigest()


def main() -> int:
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    if ONLY:
        unknown = ONLY - oracles.keys()
        if unknown:
            print("unknown oracle name(s):", ", ".join(sorted(unknown)))
            return 2
        oracles = {k: v for k, v in oracles.items() if k in ONLY}
    flaky: list[str] = []
    for name, sql in oracles.items():
        t0 = time.time()
        seen: set[tuple[int, str]] = set()
        err = None
        for _ in range(N_RUNS):
            con = duckdb.connect()
            try:
                con.execute("SET TimeZone='UTC'")
                create_views(con, SF_DIR)
                df = con.execute(sql).df()
                seen.add((len(df), _hash(df)))
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                err = f"{type(e).__name__}: {e}"
                break
            finally:
                con.close()
        status = ("ERR " + err if err else
                  "ok" if len(seen) == 1 else f"FLAKY({len(seen)} variants)")
        if err or len(seen) != 1:
            flaky.append(name)
        rows = sorted(r for r, _ in seen) if seen else []
        print(f"{name:34s} {status:8s} rows={rows} "
              f"{time.time() - t0:6.1f}s", flush=True)
    print(f"\n{len(oracles) - len(flaky)}/{len(oracles)} stable over "
          f"{N_RUNS} runs at {SF_DIR}")
    if flaky:
        print("UNSTABLE:", ", ".join(flaky))
    return 1 if flaky else 0


if __name__ == "__main__":
    sys.exit(main())
