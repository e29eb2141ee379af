"""Set operations — SURVEY §2.7.

Reference analog: set reconciliation between generated, executed, and
observed experiment-id sets. All over the 1-column schema
``(key BIGINT)``: customer keys that placed orders vs user ids that
produced events.

UNION ALL output is folded through a count groupBy so the hash check is
order-insensitive-safe; EXCEPT is declared with DISTINCT semantics
(df.subtract) — exceptAll's multiset counting diverges cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_events, load_table


def _order_keys(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key")
    )


def _event_keys(spark, sf_dir):
    return load_events(spark, sf_dir).select(F.col("user_id").alias("key"))


@register(
    "q_set_union_all",
    oracle="""
    SELECT key, count(*) AS n
    FROM (
      SELECT o_custkey AS key FROM orders
      UNION ALL
      SELECT user_id AS key FROM events
    )
    GROUP BY key
    """,
    tier="P1",
    doc="UNION ALL of the two key sets + multiplicity count.",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _order_keys(spark, sf_dir).unionAll(_event_keys(spark, sf_dir))
    return u.groupBy("key").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_set_union_distinct",
    oracle="""
    SELECT o_custkey AS key FROM orders
    UNION
    SELECT user_id AS key FROM events
    """,
    tier="P1",
    doc="UNION DISTINCT of the two key sets.",
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _order_keys(spark, sf_dir).union(_event_keys(spark, sf_dir)).distinct()


@register(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey AS key FROM orders
    INTERSECT
    SELECT user_id AS key FROM events
    """,
    tier="P1",
    doc="INTERSECT (distinct): customers that both ordered and have events.",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _order_keys(spark, sf_dir).intersect(_event_keys(spark, sf_dir))


@register(
    "q_set_except",
    oracle="""
    SELECT o_custkey AS key FROM orders
    EXCEPT
    SELECT user_id AS key FROM events
    """,
    tier="P1",
    doc="EXCEPT (distinct): customers with orders but no events. "
    "df.subtract == EXCEPT DISTINCT; exceptAll deliberately avoided "
    "(multiset semantics diverge cross-engine).",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _order_keys(spark, sf_dir).subtract(_event_keys(spark, sf_dir))


@register(
    "q_set_intersect_all",
    oracle="""
    SELECT key, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT o_custkey AS key FROM orders
      INTERSECT ALL
      SELECT user_id AS key FROM events
    )
    GROUP BY key
    """,
    tier="P1",
    doc="INTERSECT ALL (multiset semantics — each key survives "
    "min(count_left, count_right) times, unlike the distinct "
    "INTERSECT): Spark's intersectAll maps directly onto the SQL "
    "standard. Multiplicity is made visible by re-counting the "
    "surviving rows. One shuffle on the key, count-pair state per "
    "key — no row explosion.",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key")
    )
    ev = load_events(spark, sf_dir).select(F.col("user_id").alias("key"))
    return (
        o.intersectAll(ev)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_set_except_all",
    oracle="""
    SELECT key, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT o_custkey AS key FROM orders
      EXCEPT ALL
      SELECT user_id AS key FROM events
    )
    GROUP BY key
    """,
    tier="P1",
    doc="EXCEPT ALL (multiset semantics — each key survives "
    "max(0, count_left - count_right) times): Spark's exceptAll. "
    "The bag-difference reconciliation shape (generated minus "
    "executed runs, counting repeats).",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key")
    )
    ev = load_events(spark, sf_dir).select(F.col("user_id").alias("key"))
    return (
        o.exceptAll(ev)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
