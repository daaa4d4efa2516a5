"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``kgp.queries`` — the registry mapping every implemented
operator from SURVEY.md §2 to a (Spark callable, DuckDB oracle SQL) pair.
See COVERAGE.md for the operator-by-operator map.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: knowledge-graph edge materialization over the relational
    star schema (role-typed predicates, J1/J12), aggregated per predicate."""
    from kgp.ops.graph import edges_by_pred

    return edges_by_pred(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgp.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from kgp.queries import oracle_sql as _o

    return _o()
