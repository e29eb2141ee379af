"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All three entry points are derived from the central registry in
``sd2_drp_experimentgen_spark.plans.registry``: a query is declared to
the driver exactly when an operator module registers it, and its oracle
SQL lives next to the Spark implementation so they evolve together.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sd2_drp_experimentgen_spark.functions.helpers import (
    advance_persist_generation,
    release_persisted,
)
from sd2_drp_experimentgen_spark.plans import all_specs
from sd2_drp_experimentgen_spark.session import configure_session

_T1_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3 shape 3-way join + top-k) on sf0.001."""
    configure_session(spark)
    return all_specs()["q_join_multiway_topk"].fn(spark, _T1_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            # Release STALE tracked caches before building this query
            # (VERDICT r8 item 2 + ADVICE r9 low): the driver
            # materializes each returned DataFrame after run()
            # returns, so a query's persist must stay live until the
            # driver has collected it — but run() cannot observe the
            # collect. Generation scoping gives each cache one full
            # run()-boundary of grace: frames persisted during the
            # PREVIOUS run() survive this call (the driver may not
            # have collected that DataFrame yet if it interleaves
            # build/collect); frames older than that are released. A
            # full-registry sweep therefore holds at most two queries'
            # bucket tables at a time instead of accumulating all of
            # them — and an interleaved driver can no longer drop a
            # not-yet-materialized cache (which stayed correct, but
            # silently recomputed the persisted pipeline).
            gen = advance_persist_generation()
            release_persisted(session=spark, before_generation=gen - 1)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(spec.fn) for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI SQL oracle per hash-checked query; rows-only ops are
    (deliberately) absent per the driver contract."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
