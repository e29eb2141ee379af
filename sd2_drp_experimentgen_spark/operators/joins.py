"""Joins — SURVEY §2.3.

Reference analogs: reagent <-> chemical-inventory joins, spec <-> observed
outcome joins (with unobserved wells surviving as NULLs), pending-run
anti-joins.

Scale notes (100 TB posture):
- Dimension tables (region/nation/customer/part/supplier) are broadcast —
  explicitly where the hint documents intent, otherwise via
  autoBroadcastJoinThreshold + AQE dynamic conversion.
- Fact-fact joins (orders <-> lineitem) shuffle on the join key; both sides
  are key-partitioned by Spark's sort-merge join, and AQE handles skew.
- Semi/anti joins are expressed as such (left_semi/left_anti) so Spark
  can plan broadcast-semi instead of materializing a distinct + inner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import r4, sql_r
from ..plans.registry import register
from ..sources.tables import load_events, load_table


@register(
    "q_join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON c_custkey = o_custkey
    """,
    tier="P0",
    doc="Inner equi-join orders x customer (reagent x inventory analog).",
)
def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "q_join_broadcast",
    oracle=f"""
    SELECT p_brand,
           {sql_r('sum(l_quantity)')} AS sum_qty,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand
    """,
    tier="P0",
    doc="Fact x small-dim join with an explicit broadcast hint: part is "
    "tiny relative to lineitem at every scale factor, so the hash table "
    "ships to executors and the join is shuffle-free.",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_join_multiway_topk",
    oracle=f"""
    SELECT l_orderkey,
           {sql_r('sum(l_extendedprice * (1 - l_discount))')} AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tier="P0",
    doc="FLAGSHIP (TPC-H Q3 shape): spec x outcomes x details 3-way join "
    "+ group + top-k. customer is broadcast (small side), orders-lineitem "
    "shuffles on the order key; top-10 plans as TakeOrderedAndProject "
    "(no global sort materialization).",
)
def q_join_multiway_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    # customer (post-filter) is always the small side -> broadcast.
    # orders-lineitem is fact-fact: shuffle on the order key and let AQE
    # convert to broadcast at runtime if the filtered side turns out small.
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_join_left_outer",
    oracle=f"""
    SELECT c_custkey,
           count(event_id) AS n_events,
           {sql_r('coalesce(sum(value), 0)')} AS total_value
    FROM customer LEFT JOIN events ON user_id = c_custkey
    GROUP BY c_custkey
    """,
    tier="P0",
    doc="Left outer join customer x events + per-customer counts "
    "including zeros (specs left-join observations; 90% of customers "
    "have no events, so NULL handling is load-bearing).",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    ev = load_events(spark, sf_dir)
    return (
        c.join(ev, c.c_custkey == ev.user_id, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("event_id").alias("n_events"),
            r4(F.coalesce(F.sum("value"), F.lit(0.0))).alias("total_value"),
        )
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
    """,
    tier="P0",
    doc="Left semi join: customers WITH events (runs with observed "
    "outcomes). Plans as a broadcast semi — no row duplication, no "
    "distinct needed.",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    ev = load_events(spark, sf_dir)
    return c.join(ev, c.c_custkey == ev.user_id, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
    """,
    tier="P0",
    doc="Left anti join: customers WITHOUT events (pending/unobserved runs).",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    ev = load_events(spark, sf_dir)
    return c.join(ev, c.c_custkey == ev.user_id, "left_anti").select(
        "c_custkey", "c_name"
    )
