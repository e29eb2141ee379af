"""Scans / sources / sinks — SURVEY §2.1.

Reference analog: spreadsheet/CSV ingest of chemical-inventory and run
tables. Spark-first shape: lazy parquet scans with projection/filter
expressed declaratively so Catalyst pushes both into the vectorized
reader (check: `.explain` shows ReadSchema with only the selected
columns and PushedFilters for the predicates — at 100 TB this is the
difference between scanning 4 columns and scanning the table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
    tier="P0",
    doc="Parquet scan + 4-column projection of lineitem (column pruning).",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "q_scan_prune_filter",
    oracle="""
    SELECT p_partkey, p_name, p_size
    FROM part
    WHERE p_size > 25
    """,
    tier="P0",
    doc="Projection + filter exercising pushdown into the parquet scan.",
)
def q_scan_prune_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") > 25)
        .select("p_partkey", "p_name", "p_size")
    )
