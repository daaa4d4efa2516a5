"""Shared physical-layout + transport helpers for CPU-bound UDF operators."""

from __future__ import annotations

import time
from typing import Callable, TypeVar

from pyspark.sql import DataFrame

T = TypeVar("T")


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
    ``getNumPartitions`` inspects the plan only — no job is triggered.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target)
