"""Sorts / limits / top-k — SURVEY §2.6.

Reference analog: sample-N selection and report ordering. Global
ORDER BY + LIMIT plans as TakeOrderedAndProject — each partition keeps
only its local top-k and the driver merges k*partitions rows, so top-k
never materializes a full sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "q_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tier="P0",
    doc="Global top-25 by totalprice with unique-key tiebreak "
    "(TakeOrderedAndProject — no full sort).",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "q_sort_multikey_nulls",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, count(*) AS n_items
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderkey, n_items, o_totalprice
    FROM orders LEFT JOIN li ON l_orderkey = o_orderkey
    ORDER BY n_items NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tier="P1",
    doc="Multi-key sort over a nullable left-join column with explicit "
    "NULLS FIRST + total-order tiebreak; ~1.7% of orders have no "
    "lineitems so NULL placement decides the LIMIT set.",
)
def q_sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    li_counts = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    return (
        o.join(li_counts, o.o_orderkey == li_counts.l_orderkey, "left")
        .select("o_orderkey", "n_items", "o_totalprice")
        .orderBy(
            F.asc_nulls_first("n_items"),
            F.desc("o_totalprice"),
            F.asc("o_orderkey"),
        )
        .limit(100)
    )
