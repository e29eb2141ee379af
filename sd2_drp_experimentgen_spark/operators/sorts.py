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
