"""Shared physical-layout + transport helpers for CPU-bound UDF operators."""

from __future__ import annotations

import os
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


import threading

_PINNED: list[DataFrame] = []
_PINNED_LOCK = threading.Lock()


def pin(df: DataFrame) -> DataFrame:
    """persist() + registration, so harnesses can release accumulated pins.

    The operator-internal persists (minhash/simhash signature tables,
    rerank scored, retrieval top, ann_recall exact) are lazy optimizer
    barriers with no natural unpersist point inside the operator — the
    consumer materializes AFTER the operator returns.  But CacheManager
    holds every persisted plan until an explicit unpersist, and each
    invocation builds fresh UDF objects → a distinct plan → a NEW cache
    entry, so a gate/bench process running ~100 entries accumulates
    corpus-sized cached tables for the life of the session.  Callers that
    run MANY queries in one process call ``release_pins()`` between
    queries; single-query consumers need to do nothing (app exit frees
    everything).

    The registry is lock-guarded: build_graph plans its linking branch on
    a second driver thread (pipeline/exec.py), so pin()/release_pins()
    can genuinely race list mutation.  Scope caveat (by design): the
    registry is process-global, so release_pins() invalidates the pins of
    ANY earlier-returned DataFrame that has not been materialized yet —
    its consumer then silently recomputes (correct, just unpinned).
    Harnesses therefore materialize each query's result BEFORE releasing;
    a long-lived library session that never releases keeps a strong ref
    to every pinned DataFrame — call release_pins() at batch boundaries."""
    df = df.persist()
    with _PINNED_LOCK:
        _PINNED.append(df)
    return df


def release_pins() -> int:
    """Unpersist every pin registered since the last release (harness
    seam — see pin()).  Safe to call while no pins exist."""
    with _PINNED_LOCK:
        drained = list(_PINNED)
        _PINNED.clear()
    for df in drained:
        try:
            df.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — a stopped session has nothing to free
            pass
    return len(drained)


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


def dataset_tag(sf_dir: str) -> str:
    """Cache key ``{basename}-{pathhash}-{contenthash}`` that identifies the
    DATASET, not just its directory name: the middle segment hashes the
    abspath (so two datasets sharing a basename never collide — or evict
    each other, see _prune_stale_tags), the last hashes (relpath, size,
    mtime) of every file under it, RECURSIVELY — tables are usually
    directories of part files, and an in-place rewrite of a part file
    changes neither the name nor the mtime of its parent dir entry, so a
    top-level-only stat would serve a stale cache for regenerated data at
    the same path.  followlinks=True: table dirs symlinked into a staging
    area must contribute their part files too, else regenerating the
    staged data leaves the tag unchanged (datasets are finite trees we
    control — no symlink cycles)."""
    import hashlib

    p = os.path.abspath(sf_dir.rstrip("/"))
    ph = hashlib.md5(p.encode()).hexdigest()[:8]
    h = hashlib.md5()
    # single-FILE datasets (spark.read.parquet accepts a bare file) and
    # missing paths must not fall through os.walk's zero iterations: the
    # content segment would be md5('') — a constant — so a regenerated
    # single-file --input would keep its tag and resume would serve the
    # OLD dataset's outputs (the exact stale-cache hole this tag closes
    # for directories)
    if os.path.isfile(p):
        st = os.stat(p)
        h.update(f".:{st.st_size}:{st.st_mtime_ns}".encode())
        return f"{os.path.basename(p)}-{ph}-{h.hexdigest()[:12]}"
    if not os.path.isdir(p):
        raise FileNotFoundError(
            f"dataset_tag: {p!r} is neither a file nor a directory — "
            "refusing to mint a content tag for a nonexistent dataset")
    for root, dirs, files in os.walk(p, followlinks=True):
        dirs.sort()
        for name in sorted(files):
            full = os.path.join(root, name)
            rel = os.path.relpath(full, p)
            try:
                st = os.stat(full)
            except OSError:
                # per-FILE, not around the whole walk: a single dangling
                # symlink must not truncate the hash (everything sorted
                # after it would stop contributing — a stale-cache hole);
                # the failure itself is hashed so dangle<->exists flips
                # still change the tag
                h.update(f"{rel}:unstattable".encode())
                continue
            h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    return f"{os.path.basename(p)}-{ph}-{h.hexdigest()[:12]}"


# one full-tree stat sweep per dataset per PROCESS, not per consumer: the
# tag is consumer-independent and the dataset cannot change under a running
# bench/driver loop.  A fresh process (each driver round, each bench run)
# re-walks once and still catches regeneration between runs.
_TAG_MEMO: dict[str, str] = {}


def cached_dataset_tag(sf_dir: str) -> str:
    key = os.path.abspath(sf_dir.rstrip("/"))
    tag = _TAG_MEMO.get(key)
    if tag is None:
        tag = _TAG_MEMO[key] = dataset_tag(sf_dir)
    return tag


def prune_stale_tags(cache_path: str) -> None:
    """Drop sibling cache trees for OTHER content hashes of the same dataset
    identity — same basename AND same path hash (the first two tag
    segments), i.e. regenerated content at the same path.  A different
    dataset that merely shares the basename has a different path hash and
    is left alone (its cache may be live in a concurrent session).  Called
    only on a cache miss — exactly when a rebuild is happening anyway — so
    legitimate regeneration doesn't leak an unbounded series of dead /tmp
    trees."""
    import shutil

    kind_dir, tag = os.path.split(cache_path.rstrip("/"))
    base = tag.rsplit("-", 1)[0]  # "{basename}-{pathhash}"
    try:
        for sib in os.listdir(kind_dir):
            if sib != tag and sib.rsplit("-", 1)[0] == base:
                shutil.rmtree(os.path.join(kind_dir, sib), ignore_errors=True)
    except OSError:
        pass


def canon_col(text_col) -> Column:
    r"""JVM twin of textops.canon_ws (lowercase-free: collapse Java \s runs
    to one space, trim).  Accepts a column name or a Column.  THE one
    Spark-side definition — llm/textseg share it so the cross-engine
    whitespace class cannot drift between modules."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def canon_sql(col: str) -> str:
    r"""DuckDB twin of canon_col.  [\s\v], not \s: RE2's \s lacks \v,
    which the Spark twin's Java \s has — the explicit class closes the
    one gap between the engines' whitespace classes."""
    return f"trim(regexp_replace({col}, '[\\s\\v]+', ' ', 'g'))"
