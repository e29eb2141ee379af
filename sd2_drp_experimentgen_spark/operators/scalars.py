"""Projections, filters, scalar functions — SURVEY §2.2.

Reference analogs: constraint filters on the candidate-experiment
stateset (volume caps), molarity/unit-conversion arithmetic, and the
stateset grid enumeration itself. Everything here is pure Column
expressions inside whole-stage codegen — no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import r4, sql_r
from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "q_filter_pred_q6",
    oracle=f"""
    SELECT {sql_r('sum(l_extendedprice * l_discount)')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tier="P0",
    doc="TPC-H Q6 shape: conjunctive range predicate + single aggregate. "
    "Reference analog: physical-constraint filter over the stateset.",
)
def q_filter_pred_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q_filter_in_like_null",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE (p_brand IN ('Brand#3', 'Brand#7', 'Brand#21')
           OR p_name LIKE 'red%')
      AND p_type IS NOT NULL
    """,
    tier="P0",
    doc="IN-list + LIKE prefix + OR + IS NOT NULL selection "
    "(categorical chemical selection).",
)
def q_filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.where(
        (
            F.col("p_brand").isin("Brand#3", "Brand#7", "Brand#21")
            | F.col("p_name").like("red%")
        )
        & F.col("p_type").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "q_proj_arith_case",
    oracle=f"""
    SELECT
      l_orderkey,
      l_linenumber,
      {sql_r('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS revenue,
      CASE
        WHEN l_extendedprice > 5000 THEN 'HIGH'
        WHEN l_extendedprice > 1000 THEN 'MID'
        ELSE 'LOW'
      END AS price_tier
    FROM lineitem
    """,
    tier="P0",
    doc="Derived arithmetic columns + CASE WHEN tiers "
    "(molarity / unit-conversion arithmetic analog).",
)
def q_proj_arith_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount"))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("revenue"),
        F.when(F.col("l_extendedprice") > 5000, "HIGH")
        .when(F.col("l_extendedprice") > 1000, "MID")
        .otherwise("LOW")
        .alias("price_tier"),
    )


@register(
    "q_gen_stateset_grid",
    oracle="""
    WITH g AS (SELECT x * 50 AS v FROM generate_series(0, 10) t(x))
    SELECT
      CAST(count(*) AS BIGINT) AS n_candidates,
      CAST(sum(v1 * 1000000 + v2 * 1000 + v3) AS BIGINT) AS checksum,
      CAST(max(v1 + v2 + v3) AS BIGINT) AS max_total
    FROM (
      SELECT a.v AS v1, b.v AS v2, c.v AS v3
      FROM g a, g b, g c
      WHERE a.v + b.v + c.v <= 500 AND a.v + b.v + c.v > 0
    )
    """,
    tier="P0",
    doc="Stateset generation — the reference's signature computation: "
    "cross join of three discrete volume grids (0..500 step 50), filtered "
    "by a total-volume cap. Generated with spark.range, never "
    "materialized outside Spark; at scale the grid is generated "
    "distributed and the filter is applied before any shuffle.",
)
def q_gen_stateset_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = spark.range(0, 11).select((F.col("id") * 50).alias("v"))
    g1 = grid.select(F.col("v").alias("v1"))
    g2 = grid.select(F.col("v").alias("v2"))
    g3 = grid.select(F.col("v").alias("v3"))
    total = F.col("v1") + F.col("v2") + F.col("v3")
    return (
        g1.crossJoin(g2)
        .crossJoin(g3)
        .where((total <= 500) & (total > 0))
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(
                F.col("v1") * 1000000 + F.col("v2") * 1000 + F.col("v3")
            ).alias("checksum"),
            F.max(total).alias("max_total"),
        )
    )
