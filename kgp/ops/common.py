"""Shared physical-layout + transport helpers for CPU-bound UDF operators."""

from __future__ import annotations

import time
from typing import Callable, TypeVar

from pyspark.sql import Column, DataFrame, functions as F

T = TypeVar("T")


def explode_once(df: DataFrame, keep: list[str], arr: Column | str,
                 aliases: list[str], pos: bool = True) -> DataFrame:
    """Explode a Python-UDF-produced array with exactly ONE UDF evaluation.

    A bare inner (pos)explode makes Catalyst infer a ``size(arr) > 0 AND
    isnotnull(arr)`` pre-filter and push it below any exchange between the
    UDF and the Generate — re-evaluating the UDF once for the filter and
    once for the values.  The OUTER generator infers nothing; the
    post-filter on the first generated column restores inner semantics
    (drops the single null row an empty/null array would emit) and cannot
    be pushed below the Generate.  Contract: array ELEMENTS are never null
    (every UDF here emits dense arrays), or they would be dropped too.
    Plan shapes are pinned by tests/test_engine_parity_edges.py."""
    gen = (F.posexplode_outer if pos else F.explode_outer)(arr)
    out = df.select(*keep, gen.alias(*aliases))
    return out.filter(F.col(aliases[0]).isNotNull())


def retry_call(fn: Callable[[], T], max_tries: int,
               sleep_for: Callable[[Exception, int], float] | None = None
               ) -> tuple[T | None, str | None]:
    """(result, error): the transport retry protocol shared by every
    external-call ledger stage (fetch_documents, complete_prompts).

    - up to ``max_tries`` attempts; success returns (result, None);
    - ``NotImplementedError`` re-raises — a stubbed transport is a
      configuration error, not flakiness;
    - any other exception becomes the D4 ledger string after the last
      attempt: (None, "Type: message") — the caller emits an error ROW,
      never a task failure;
    - ``sleep_for(exc, attempt)`` returns the backoff seconds for this
      failure (0/None to skip); it is consulted only while another
      attempt remains — sleeping after the final failure is dead time.

    Single-sourced because the two call sites had already drifted on the
    final-attempt-sleep guard.
    """
    err = None
    for attempt in range(max_tries):
        try:
            return fn(), None
        except NotImplementedError:
            raise
        except Exception as exc:  # noqa: BLE001 — ledger, not crash
            err = f"{type(exc).__name__}: {exc}"
            if sleep_for is not None and attempt + 1 < max_tries:
                s = sleep_for(exc, attempt)
                if s:
                    time.sleep(s)
    return None, err


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow input so CPU-bound (pandas-UDF)
    stages use every core.

    A small corpus arriving as one parquet file scans as ONE partition
    (file-split granularity is row groups), serializing every downstream
    Arrow batch onto a single task.  On a production table the input is
    many splits and this is a no-op; locally it costs one cheap shuffle of
    the narrow input and buys full parallelism for the expensive stage.

    CALLER CONTRACT: pass a scan/local relation, not a derived plan with
    upstream shuffles — under AQE, ``df.rdd`` finalizes the adaptive plan,
    which EXECUTES every upstream shuffle stage at construction time (the
    same trap as localCheckpoint(eager=False); every current call site
    passes a raw table scan or createDataFrame local relation).
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target)
