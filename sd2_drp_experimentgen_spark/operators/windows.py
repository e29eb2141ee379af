"""Window functions — SURVEY §2.5.

Reference analog: top-k candidate selection per group, cumulative dosing
curves, inter-observation timing. Every window ORDER BY carries a
unique-key tiebreaker (SURVEY §5.3 rule 2) so ranks are total-ordered
and cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "q_win_rank_topn",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    tier="P0",
    doc="Top-3 orders per customer via row_number (top-k candidate "
    "selection per group). Single shuffle on the partition key; the "
    "rank filter cannot be pushed below the window, but rn<=3 prunes "
    "before any downstream op.",
)
def q_win_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )
