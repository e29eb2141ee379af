"""Aggregations — SURVEY §2.4.

Reference analogs: per-plate rollups, QC thresholds, unique-reagent
counts, and the two signature computations — the volume-weighted mixing
formula (per-well final concentrations) and the wide ML feature table.

Scale notes: Spark's hash aggregation is automatically two-phase
(partial map-side combine before the shuffle), so high-cardinality
groupBys move only one pre-aggregated row per (partition, key) across
the network — exactly what a 100 TB rollup needs. Nothing to hand-tune
beyond shuffle-partition sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import r4, sql_r
from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "q_agg_global",
    oracle=f"""
    SELECT count(*) AS n_rows,
           {sql_r('sum(l_quantity)')} AS sum_qty,
           {sql_r('avg(l_extendedprice)')} AS avg_price,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem
    """,
    tier="P0",
    doc="Global count/sum/avg/min/max dataset summary.",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        r4(F.sum("l_quantity")).alias("sum_qty"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "q_agg_groupby_q1",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_r('sum(l_quantity)')} AS sum_qty,
           {sql_r('sum(l_extendedprice)')} AS sum_base_price,
           {sql_r('sum(l_extendedprice * (1 - l_discount))')} AS sum_disc_price,
           {sql_r('sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))')} AS sum_charge,
           {sql_r('avg(l_quantity)')} AS avg_qty,
           {sql_r('avg(l_extendedprice)')} AS avg_price,
           {sql_r('avg(l_discount)')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tier="P0",
    doc="TPC-H Q1 shape: 2-key groupBy with 8 aggregates (per-plate "
    "rollup analog). Partial aggregation happens map-side automatically.",
)
def q_agg_groupby_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            r4(F.sum(disc_price)).alias("sum_disc_price"),
            r4(F.sum(disc_price * (F.lit(1) + F.col("l_tax")))).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 15
    """,
    tier="P0",
    doc="Group + post-aggregation filter (QC threshold analog).",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") > 15)
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_custs,
           count(DISTINCT date_trunc('month', o_orderdate)) AS n_months,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    """,
    tier="P0",
    doc="Multiple COUNT(DISTINCT) in one aggregate (unique reagent "
    "counts analog). Spark plans this with expand + two-phase agg.",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct(F.date_trunc("month", F.col("o_orderdate"))).alias("n_months"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@register(
    "q_mix_weighted_avg",
    oracle=f"""
    SELECT l_orderkey,
           {sql_r('sum(l_quantity * l_extendedprice) / sum(l_quantity)')}
             AS w_avg_price,
           {sql_r('sum(l_quantity)')} AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    """,
    tier="P0",
    doc="SIGNATURE: volume-weighted mixture mean — the per-well "
    "final-concentration formula of the reference (sum(vol*conc)/sum(vol)) "
    "as a single shuffle-once groupBy.",
)
def q_mix_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        r4(
            F.sum(F.col("l_quantity") * F.col("l_extendedprice"))
            / F.sum("l_quantity")
        ).alias("w_avg_price"),
        r4(F.sum("l_quantity")).alias("total_qty"),
    )
