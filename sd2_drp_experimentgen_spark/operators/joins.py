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

from ..functions.helpers import r4, sql_exact_sum, sql_r, sql_sum_units, sql_units
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


@register(
    "q_join_full_outer",
    oracle="""
    SELECT CASE WHEN o_orderkey IS NULL THEN 'right_only'
                WHEN l_orderkey IS NULL THEN 'left_only'
                ELSE 'both' END AS side,
           count(*) AS n
    FROM orders FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    tier="P1",
    doc="Full outer join orders<->lineitem, rows classified "
    "both/left_only/right_only (reconciliation of generated vs "
    "executed runs; ~1.7% of orders have no lineitems).",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "full")
        .select(
            F.when(F.col("o_orderkey").isNull(), "right_only")
            .when(F.col("l_orderkey").isNull(), "left_only")
            .otherwise("both")
            .alias("side")
        )
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    tier="P1",
    doc="Cartesian product of the two smallest dims (grid building "
    "block; 125 pairs).",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "q_join_theta",
    oracle="""
    SELECT s_nationkey AS nationkey, count(*) AS n_pairs
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    GROUP BY s_nationkey
    """,
    tier="P1",
    doc="Theta join: equi on nation + non-equi balance comparison "
    "(threshold pairing analog). The equi component keeps the plan a "
    "hash/sort-merge join with a residual filter — never a pure "
    "nested-loop — so it scales with per-nation cardinality.",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        )
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q_join_interval",
    oracle="""
    SELECT a.user_id, count(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.user_id
    """,
    tier="P1",
    doc="Interval self-join: event pairs per user within (0, 5min] "
    "(time-proximate observation pairing). Implemented with the 100 TB "
    "blocking-key pattern (SURVEY §4.3): probe side explodes to its "
    "5-min bucket and the next, equi-join on (user_id, bucket) bounds "
    "each task's pair candidates, exact range predicate applied after. "
    "OSS Spark has no range-join optimization, so without the bucket "
    "key the equi-on-user join degrades to per-user quadratic scans.",
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    bucket_us = 300 * 1_000_000  # 5 minutes in microseconds
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    a = ev.select(
        F.col("user_id"),
        F.col("us").alias("a_us"),
        F.explode(
            F.array(
                (F.col("us") / bucket_us).cast("long"),
                (F.col("us") / bucket_us).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    b = ev.select(
        F.col("user_id").alias("b_user"),
        F.col("us").alias("b_us"),
        (F.col("us") / bucket_us).cast("long").alias("b_bucket"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.b_user)
            & (a.bucket == b.b_bucket)
            & (b.b_us > a.a_us)
            & (b.b_us <= a.a_us + bucket_us),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q_join_asof",
    oracle="""
    SELECT event_id,
           o_orderkey AS asof_orderkey,
           CAST(o_orderdate AS DATE) AS asof_date
    FROM (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    WHERE rn = 1
    """,
    tier="P1",
    doc="As-of join: for each event, the latest order of that customer "
    "with o_orderdate <= ts (latest-stock-solution-as-of-run-date "
    "lookup). Spark has no native as-of; implemented with the scalable "
    "union-sort pattern: tag both sides, single sort per user on "
    "(time, side, key), last(ignorenulls) carries the most recent "
    "order payload forward — one shuffle, no candidate explosion. "
    "Ties on o_orderdate resolve to max o_orderkey on both engines.",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir).select(
        F.col("user_id").alias("key"),
        F.unix_micros("ts").alias("t_us"),
        F.lit(0).alias("is_order"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t_us"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    # Orders sort before events at equal time (is_order desc) so the
    # as-of is inclusive; equal-date orders resolve to max o_orderkey.
    w = (
        Window.partitionBy("key")
        .orderBy(F.asc("t_us"), F.desc("is_order"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = ev.unionByName(orders)
    return (
        tagged.select(
            "event_id",
            "is_order",
            F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
            F.last("o_orderdate", ignorenulls=True)
            .over(w)
            .cast("date")
            .alias("asof_date"),
        )
        .where(F.col("is_order") == 0)
        # Events with no order dated <= ts have no as-of match; the
        # oracle's inner join drops them, so drop the NULL carry here
        # too (the fixture happens to always match, but semantics must
        # not depend on that invariant).
        .where(F.col("asof_orderkey").isNotNull())
        .select("event_id", "asof_orderkey", "asof_date")
    )


@register(
    "q_sql_q3_shipping",
    oracle=f"""
    SELECT l_orderkey,
           {sql_r("sum(l_extendedprice * (1 - l_discount))")} AS revenue,
           o_orderdate, o_orderpriority
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate  > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tier="P1",
    doc="TPC-H Q3 shape (shipping-priority top-10) through the "
    "spark.sql API: urgent orders placed before a cutoff whose items "
    "ship after it, ranked by open revenue. Adapted to the fixture "
    "schema (o_orderpriority stands in for c_mktsegment). Both date "
    "predicates push into the parquet scans BEFORE the join, and the "
    "top-10 runs as TakeOrderedAndProject — no global sort. Ordering "
    "ranks the ROUNDED revenue with l_orderkey tiebreak so the "
    "LIMIT boundary is engine-independent.",
)
def q_sql_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT l_orderkey,
               floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
                 / 10000 AS revenue,
               o_orderdate, o_orderpriority
        FROM v_orders JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate < TIMESTAMP '1998-07-01'
          AND l_shipdate  > TIMESTAMP '1998-07-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """
    )


@register(
    "q_sql_q5_join_chain",
    oracle=f"""
    SELECT n_name,
           {sql_r(sql_exact_sum("l_extendedprice * (1 - l_discount)"))} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    tier="P1",
    doc="TPC-H Q5 shape through the spark.sql API surface: the 6-table "
    "join chain (region->nation->supplier + customer->orders->lineitem "
    "with the local-supplier constraint) written as SQL over registered "
    "temp views — exercising the parser/analyzer path that DataFrame "
    "queries bypass. Catalyst plans it identically: dimension sides "
    "broadcast, fact side never shuffles twice. Revenue rides "
    "exact_sum (r10): 25 nation groups over an unbounded fact — the "
    "bounded-group money-sum shape whose float sum crosses the 4dp "
    "boundary at large corpora (see q_agg_groupby_q1).",
)
def q_sql_q5_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT n_name,
               floor((CAST(sum(CAST(floor(
                        (l_extendedprice * (1 - l_discount)) * 10000 + 0.5
                      ) AS DECIMAL(38, 0))) AS DOUBLE) / 10000.0)
                     * 10000 + 0.5) / 10000 AS revenue
        FROM v_customer
        JOIN v_orders   ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        JOIN v_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN v_nation   ON s_nationkey = n_nationkey
        JOIN v_region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        """
    )


@register(
    "q_sql_recursive_cte",
    oracle=f"""
    WITH RECURSIVE months(m) AS (
      SELECT date_trunc('month', (SELECT min(o_orderdate) FROM orders))
      UNION ALL
      SELECT m + INTERVAL '1 month' FROM months
      WHERE m + INTERVAL '1 month'
            <= date_trunc('month', (SELECT max(o_orderdate) FROM orders))
    )
    SELECT CAST(floor(epoch(m)) AS BIGINT) AS month_start,
           (SELECT count(*) FROM orders
            WHERE date_trunc('month', o_orderdate) = m) AS n_orders,
           {sql_r('''(CAST(coalesce((SELECT sum(CAST(floor(
                        o_totalprice * 10000 + 0.5) AS BIGINT)) FROM orders
                     WHERE date_trunc('month', o_orderdate) = m), 0)
                     AS DOUBLE) / 10000.0)''')}
             AS sum_price
    FROM months
    """,
    tier="P1",
    doc="Recursive CTE (Spark 4 WITH RECURSIVE) generating the "
    "contiguous month calendar spanning the order history, left-joined "
    "with per-month order rollups — the calendar-dimension pattern "
    "that reports zero-months a plain GROUP BY would drop. Recursion "
    "depth = #months (bounded by data span, not data volume), so the "
    "recursive leg is driver-negligible at any scale; the rollup is "
    "one ordinary shuffled aggregate joined broadcast onto the "
    "calendar.",
)
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
          SELECT date_trunc('month', min(o_orderdate)) AS lo,
                 date_trunc('month', max(o_orderdate)) AS hi
          FROM v_orders
        ),
        months(m, hi) AS (
          SELECT lo, hi FROM bounds
          UNION ALL
          SELECT m + INTERVAL '1' MONTH, hi FROM months
          WHERE m + INTERVAL '1' MONTH <= hi
        ),
        rollup AS (
          SELECT date_trunc('month', o_orderdate) AS m,
                 count(*) AS n_orders,
                 -- exact_sum form (r10): per-month money sums grow with
                 -- corpus density while month count stays bounded
                 sum(CAST(floor(o_totalprice * 10000 + 0.5)
                          AS DECIMAL(38, 0))) AS sum_units
          FROM v_orders GROUP BY 1
        )
        SELECT CAST(cast(m AS TIMESTAMP_LTZ) AS BIGINT) AS month_start,
               coalesce(n_orders, 0) AS n_orders,
               floor((CAST(coalesce(sum_units, 0) AS DOUBLE) / 10000.0)
                     * 10000 + 0.5) / 10000 AS sum_price
        FROM months LEFT JOIN rollup USING (m)
        """
    )


@register(
    "q_sql_pivot_clause",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_r(sql_exact_sum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END"))}
             AS open_total,
           {sql_r(sql_exact_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END"))}
             AS filled_total,
           {sql_r(sql_exact_sum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END"))}
             AS pending_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    tier="P2",
    doc="SQL PIVOT clause (parser surface distinct from DataFrame "
    ".pivot() and from the CASE-WHEN pivot in "
    "q_agg_conditional_pivot): order totals per priority pivoted to "
    "one column per order status, explicit IN list so the output "
    "schema is static. Plans identically to the conditional "
    "aggregate — one partial+final HashAggregate pair.",
)
def q_sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               floor((CAST(open_total AS DOUBLE) / 10000.0)
                     * 10000 + 0.5) / 10000 AS open_total,
               floor((CAST(filled_total AS DOUBLE) / 10000.0)
                     * 10000 + 0.5) / 10000 AS filled_total,
               floor((CAST(pending_total AS DOUBLE) / 10000.0)
                     * 10000 + 0.5) / 10000 AS pending_total
        FROM (
          SELECT o_orderpriority, o_orderstatus,
                 -- exact_sum form (r10): 5 priority groups over all
                 -- orders — bounded-group money sums
                 CAST(floor(o_totalprice * 10000 + 0.5)
                      AS DECIMAL(38, 0)) AS price_units
          FROM v_orders
        )
        PIVOT (
          sum(price_units)
          FOR o_orderstatus IN ('O' AS open_total, 'F' AS filled_total,
                                'P' AS pending_total)
        )
        """
    )


@register(
    "q_join_null_safe",
    oracle="""
    WITH keyed AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_custkey % 100 END AS bucket
      FROM orders
    ),
    dim AS (
      SELECT CASE WHEN g = 100 THEN NULL ELSE g END AS bucket,
             CASE WHEN g = 100 THEN 'unknown'
                  ELSE 'b' || CAST(g AS VARCHAR) END AS label
      FROM (SELECT unnest(generate_series(0, 100)) AS g)
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM keyed JOIN dim ON keyed.bucket IS NOT DISTINCT FROM dim.bucket
    GROUP BY label
    """,
    tier="P1",
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL "
    "bucket keys — the 'uncategorized' rows every dimensional model "
    "accumulates — match the dimension's NULL row instead of silently "
    "dropping out of an inner join. Spark plans eqNullSafe as an "
    "ordinary hash join (NULL hashes like any value under null-safe "
    "semantics), so there is no outer-join-plus-coalesce detour and "
    "the dimension side still broadcasts.",
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_custkey") % 100)
        .alias("bucket"),
    )
    g = spark.range(0, 101).toDF("g")
    dim = g.select(
        F.when(F.col("g") == 100, None).otherwise(F.col("g")).alias("bucket"),
        F.when(F.col("g") == 100, "unknown")
        .otherwise(F.concat(F.lit("b"), F.col("g").cast("string")))
        .alias("label"),
    )
    return (
        keyed.join(F.broadcast(dim), keyed.bucket.eqNullSafe(dim.bucket))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_sql_lateral_topk",
    oracle=f"""
    SELECT c_custkey, t.o_orderkey,
           {sql_r('t.o_totalprice')} AS price
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    WHERE c_mktsegment = 'BUILDING'
    """,
    tier="P1",
    doc="LATERAL correlated derived table (Spark 4 SQL): each BUILDING "
    "customer joined to its own top-2 orders by price — the per-row "
    "dependent subquery the optimizer decorrelates into a ranked "
    "window join (DecorrelateInnerQuery), exercising a planner path "
    "the equivalent row_number() formulation bypasses. Same result, "
    "same plan family, different SQL surface.",
)
def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, t.o_orderkey,
               floor(t.o_totalprice * 10000 + 0.5) / 10000 AS price
        FROM v_customer, LATERAL (
          SELECT o_orderkey, o_totalprice FROM v_orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        WHERE c_mktsegment = 'BUILDING'
        """
    )


@register(
    "q_sql_parameterized",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           floor(sum(o_totalprice) * 10000 + 0.5) / 10000 AS sum_price
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 50000
    GROUP BY o_orderpriority
    """,
    tier="P2",
    doc="Parameterized SQL (spark.sql named-parameter binding, Spark "
    "3.4+): the status/threshold predicates arrive as bound :params, "
    "not string interpolation — the injection-safe templated-report "
    "surface. Binding happens in the parser, so the bound literals "
    "still constant-fold and push down to the parquet scan exactly "
    "like inline literals.",
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_orders_param"
    )
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                    AS DOUBLE) / 10000 AS sum_price
        FROM v_orders_param
        WHERE o_orderstatus = :status AND o_totalprice >= :min_price
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "min_price": 50000},
    )


@register(
    "q_sql_session_variables",
    oracle="""
    SELECT count(*) AS n,
           floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
             / 10000 AS revenue
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 - 0.01 AND 0.05 + 0.01
      AND l_quantity < 24
    """,
    tier="P2",
    doc="SQL session variables (Spark 4 DECLARE VARIABLE / SET VAR): "
    "the Q6 predicate parameterized through typed session-scoped "
    "variables instead of client-side string building — the "
    "multi-statement-script surface. Declared on an isolated "
    "newSession so the variables never leak into concurrent queries "
    "on the caller's session; variable references constant-fold, so "
    "the scan still sees pushed-down literals.",
)
def q_sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.newSession()
    from ..session import configure_session

    configure_session(s)
    load_table(s, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem_var"
    )
    s.sql("DECLARE OR REPLACE VARIABLE target_disc DOUBLE DEFAULT 0.05")
    s.sql("DECLARE OR REPLACE VARIABLE disc_band DOUBLE DEFAULT 0.01")
    s.sql("DECLARE OR REPLACE VARIABLE max_qty DOUBLE")
    s.sql("SET VAR max_qty = 24")
    return s.sql(
        """
        SELECT count(*) AS n,
               floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
                 / 10000 AS revenue
        FROM v_lineitem_var
        WHERE l_discount BETWEEN target_disc - disc_band
                             AND target_disc + disc_band
          AND l_quantity < max_qty
        """
    )


@register(
    "q_sql_group_by_all",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS order_year,
           count(*) AS n,
           CAST(sum({sql_units('o_totalprice')}) AS DOUBLE) / 10000
             AS sum_price
    FROM orders
    GROUP BY o_orderpriority, order_year
    """,
    tier="P2",
    doc="GROUP BY ALL / ORDER BY ALL (Spark 3.4+/4 SQL sugar, also in "
    "DuckDB/Databricks SQL): the parser infers the grouping set as "
    "every non-aggregate select item — the guard against the classic "
    "added-a-column-forgot-the-GROUP-BY bug in wide reports. "
    "Resolves to the identical Aggregate plan as the explicit list "
    "(same partial-agg + exchange), proven by the hash check against "
    "an explicit-GROUP-BY oracle.",
)
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_orders_gball"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               year(o_orderdate) AS order_year,
               count(*) AS n,
               CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                    AS DOUBLE) / 10000 AS sum_price
        FROM v_orders_gball
        GROUP BY ALL
        """
    )


@register(
    "q_sql_exists_in_subqueries",
    oracle="""
    WITH risky AS (
      SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
      FROM customer
    )
    SELECT
      (SELECT count(*) FROM orders o
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey
                        AND c.c_acctbal < 0)) AS n_exists,
      (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey
                            AND c.c_acctbal < 0)) AS n_not_exists,
      (SELECT count(*) FROM orders
        WHERE o_custkey IN (SELECT k FROM risky)) AS n_in,
      (SELECT count(*) FROM orders
        WHERE o_custkey NOT IN (SELECT k FROM risky)) AS n_not_in,
      (SELECT count(*) FROM orders
        WHERE o_custkey NOT IN (SELECT k FROM risky WHERE k IS NOT NULL))
        AS n_not_in_nullsafe
    """,
    tier="P2",
    doc="Correlated-subquery SQL battery: EXISTS / NOT EXISTS "
    "(decorrelated to semi/anti joins by the planner) and IN / "
    "NOT IN against a subquery whose key list CONTAINS NULLs — the "
    "classic three-valued-logic trap: NOT IN over a NULL-bearing "
    "list can match no rows at all (x <> NULL is unknown), which "
    "both engines must reproduce identically, while the NULL-"
    "filtered variant returns the intuitive complement. EXISTS and "
    "NOT EXISTS counts partition the orders exactly. One row of five "
    "BIGINT counts — the regression pin for the subquery planner "
    "paths and the NULL semantics most pipelines get wrong once.",
)
def q_sql_exists_in_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_sq_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_sq_customer"
    )
    return spark.sql(
        """
        WITH risky AS (
          SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
          FROM v_sq_customer
        )
        SELECT
          (SELECT count(*) FROM v_sq_orders o
            WHERE EXISTS (SELECT 1 FROM v_sq_customer c
                          WHERE c.c_custkey = o.o_custkey
                            AND c.c_acctbal < 0)) AS n_exists,
          (SELECT count(*) FROM v_sq_orders o
            WHERE NOT EXISTS (SELECT 1 FROM v_sq_customer c
                              WHERE c.c_custkey = o.o_custkey
                                AND c.c_acctbal < 0)) AS n_not_exists,
          (SELECT count(*) FROM v_sq_orders
            WHERE o_custkey IN (SELECT k FROM risky)) AS n_in,
          (SELECT count(*) FROM v_sq_orders
            WHERE o_custkey NOT IN (SELECT k FROM risky)) AS n_not_in,
          (SELECT count(*) FROM v_sq_orders
            WHERE o_custkey NOT IN (SELECT k FROM risky
                                    WHERE k IS NOT NULL))
            AS n_not_in_nullsafe
        """
    )


SPATIAL_R = 50  # L-infinity radius for the neighbor-pair join
SPATIAL_COORD_MOD = 2000  # coordinate domain [0, 2000)


@register(
    "q_join_spatial_grid",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6)
                  AS BIGINT) % {SPATIAL_COORD_MOD} AS x,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 7, 6)
                  AS BIGINT) % {SPATIAL_COORD_MOD} AS y
      FROM customer
    )
    SELECT a.id AS id_lo, b.id AS id_hi,
           CAST(greatest(abs(a.x - b.x), abs(a.y - b.y)) AS BIGINT) AS dist
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND abs(a.x - b.x) <= {SPATIAL_R}
     AND abs(a.y - b.y) <= {SPATIAL_R}
    """,
    tier="P1",
    doc="Grid-blocked spatial neighbor join — the 2-D analog of the "
    "interval join's blocking-key pattern and the core of every "
    "distributed geospatial/collision query: points (deterministic "
    "md5-derived integer coordinates per customer) land in "
    "radius-sized grid cells; one side explodes to its 3x3 cell "
    "neighborhood, the equi-join runs on cell ids, and the exact "
    "L-infinity predicate refines. Every task sees only its cell's "
    "candidates — the quadratic all-pairs compare the oracle runs "
    "never materializes in Spark; shuffle moves (cell, id, x, y) "
    "tuples. Integer coordinates make distances hash-exact. The "
    "same plan serves geohash/S2/H3 bucketing at planet scale.",
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    r, mod = SPATIAL_R, SPATIAL_COORD_MOD
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    hx = lambda start: (  # noqa: E731
        F.conv(
            F.substring(F.md5(F.col("c_custkey").cast("string")), start, 6),
            16,
            10,
        ).cast("long")
        % mod
    )
    pts = c.select(
        F.col("c_custkey").alias("id"), hx(1).alias("x"), hx(7).alias("y")
    )
    cell = lambda col: (col / F.lit(r)).cast("long")  # noqa: E731
    # probe side: each point replicated to its 3x3 cell neighborhood
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    probe = pts.select(
        F.col("id").alias("a_id"), F.col("x").alias("ax"),
        F.col("y").alias("ay"), offs.alias("o"),
    ).select(
        "a_id", "ax", "ay",
        (cell(F.col("ax")) + F.col("o.dx")).alias("cx"),
        (cell(F.col("ay")) + F.col("o.dy")).alias("cy"),
    )
    build = pts.select(
        F.col("id").alias("b_id"), F.col("x").alias("bx"),
        F.col("y").alias("by"),
        cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"),
    )
    joined = probe.join(build, ["cx", "cy"])
    dx = F.abs(F.col("ax") - F.col("bx"))
    dy = F.abs(F.col("ay") - F.col("by"))
    return (
        joined.where(
            (F.col("a_id") < F.col("b_id")) & (dx <= r) & (dy <= r)
        )
        .select(
            F.col("a_id").alias("id_lo"),
            F.col("b_id").alias("id_hi"),
            F.greatest(dx, dy).alias("dist"),
        )
        .distinct()
    )


@register(
    "q_join_asof_forward",
    oracle="""
    SELECT o_orderkey,
           event_id AS next_event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS next_ts_epoch
    FROM (
      SELECT o.o_orderkey, e.event_id, e.ts,
             row_number() OVER (
               PARTITION BY o.o_orderkey
               ORDER BY e.ts ASC, e.event_id ASC
             ) AS rn
      FROM orders o JOIN events e
        ON e.user_id = o.o_custkey AND e.ts > o.o_orderdate
    )
    WHERE rn = 1
    """,
    tier="P2",
    doc="FORWARD as-of join — each order matched to that customer's "
    "EARLIEST event strictly after it (the next-activity-after-"
    "treatment lookup), completing the as-of direction pair with "
    "q_join_asof's backward match. Same scalable union-sort shape, "
    "mirrored: one sort per key DESCENDING in time with orders "
    "before events at equal instants (strict >), last(ignorenulls) "
    "carries the nearest FUTURE event backward through the "
    "sequence. One shuffle, no candidate explosion; timestamp ties "
    "resolve to min event_id on both engines.",
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_events

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t_us"),
        F.lit(0).alias("is_event"),
        F.col("o_orderkey"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("ev_us"),
    )
    ev = load_events(spark, sf_dir).select(
        F.col("user_id").alias("key"),
        F.unix_micros("ts").alias("t_us"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("event_id"),
        F.unix_micros("ts").alias("ev_us"),
    )
    # Descending time; orders sort BEFORE events at equal t (is_event
    # asc after desc-time) so an event at exactly the order instant is
    # NOT matched (strict >); equal-ts events resolve to min event_id
    # (event_id desc in the walk -> the last carried is the smallest).
    w = (
        Window.partitionBy("key")
        .orderBy(F.desc("t_us"), F.asc("is_event"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = orders.unionByName(ev)
    return (
        tagged.select(
            "o_orderkey",
            "is_event",
            F.last("event_id", ignorenulls=True).over(w).alias(
                "next_event_id"
            ),
            (F.last("ev_us", ignorenulls=True).over(w) / 1_000_000)
            .cast("long")
            .alias("next_ts_epoch"),
        )
        .where(F.col("is_event") == 0)
        .where(F.col("next_event_id").isNotNull())
        .select("o_orderkey", "next_event_id", "next_ts_epoch")
    )


ASOF_TOLERANCE_DAYS = 8400


@register(
    "q_join_asof_tolerance",
    oracle=f"""
    WITH matched AS (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id
       AND o.o_orderdate <= e.ts
       AND o.o_orderdate > e.ts - INTERVAL {ASOF_TOLERANCE_DAYS} DAY
    )
    SELECT event_id,
           o_orderkey AS asof_orderkey,
           CAST(o_orderdate AS DATE) AS asof_date
    FROM matched WHERE rn = 1
    """,
    tier="P2",
    doc="As-of join WITH TOLERANCE — completing the direction/bound "
    "trio (backward q_join_asof, forward q_join_asof_forward): each "
    f"event matches its customer's latest order at most "
    f"{ASOF_TOLERANCE_DAYS} days old (calibrated to the fixture's "
    "2024-events-vs-2001-orders gap so BOTH outcomes — match kept "
    "and match dropped — actually occur); staler matches drop, "
    "exactly pandas merge_asof's tolerance semantics (a stock quote "
    "too old must not fill today's trade). Same one-"
    "shuffle union-sort walk — the tolerance is a post-carry filter "
    "comparing the carried order time against the event time, so no "
    "extra join or window; ties on date resolve to max orderkey on "
    "both engines. The tolerance also BOUNDS the useful state at "
    "100 TB: a time-bucketed variant can partition by (user, "
    "tolerance-sized bucket) and never sort more than two buckets "
    "together.",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_events

    tol_us = ASOF_TOLERANCE_DAYS * 86_400 * 1_000_000
    ev = load_events(spark, sf_dir).select(
        F.col("user_id").alias("key"),
        F.unix_micros("ts").alias("t_us"),
        F.lit(0).alias("is_order"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t_us"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy(F.asc("t_us"), F.desc("is_order"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = ev.unionByName(orders)
    carried = tagged.select(
        "event_id",
        "is_order",
        F.col("t_us").alias("ev_us"),
        F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("asof_ts"),
        F.last(
            F.when(F.col("is_order") == 1, F.col("t_us")), ignorenulls=True
        ).over(w).alias("asof_us"),
    )
    return (
        carried.where(F.col("is_order") == 0)
        .where(
            F.col("asof_orderkey").isNotNull()
            & (F.col("ev_us") - F.col("asof_us") < F.lit(tol_us))
        )
        .select(
            "event_id",
            "asof_orderkey",
            F.col("asof_ts").cast("date").alias("asof_date"),
        )
    )


@register(
    "q_join_lateral_api",
    oracle=f"""
    SELECT c_custkey, c_mktsegment, t.o_orderkey,
           {sql_units("t.o_totalprice", 2)} AS totalprice_cents
    FROM customer,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    """,
    tier="P2",
    doc="DataFrame.lateralJoin (new in Spark 4.0) — the DSL twin of "
    "the SQL LATERAL subquery surface (q_sql_lateral_topk): per "
    "customer, the top-2 orders by price via a correlated subquery "
    "referencing the outer row with Column.outer(). Catalyst "
    "decorrelates the per-row LIMIT into the same ranked-window "
    "shape a hand-written q_win_rank_topn uses, so the API "
    "convenience costs nothing at scale; the LIMIT sits under a "
    "total order (price DESC, orderkey) so ties are deterministic. "
    "Pins the API surface a reference user migrating correlated "
    "queries expects to exist.",
)
def q_join_lateral_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import int_units

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    top2 = (
        o.where(F.col("o_custkey") == F.col("c_custkey").outer())
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(2)
        .select("o_orderkey", "o_totalprice")
    )
    return c.lateralJoin(top2).select(
        "c_custkey",
        "c_mktsegment",
        "o_orderkey",
        int_units(F.col("o_totalprice"), 2).alias("totalprice_cents"),
    )


@register(
    "q_sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount))
                               * 10000 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_units
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    tier="P2",
    doc="SQL pipe syntax (|>, new in Spark 4.0): the same "
    "filter -> EXTEND -> AGGREGATE computation as a pipeline of "
    "stages, parsed by Spark's pipe dialect and planned identically "
    "to the classic form (the oracle IS the classic form — the hash "
    "match proves the dialects agree). Pipe syntax is the API "
    "surface incremental-transform authors use; nothing about the "
    "physical plan changes: predicate still pushes to the scan, "
    "AGGREGATE still partial-aggregates map-side.",
)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "pipe_lineitem"
    )
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate <  TIMESTAMP '1998-01-01'
        |> EXTEND CAST(floor((l_extendedprice * (1 - l_discount))
                             * 10000 + 0.5) AS BIGINT) AS rev_units
        |> AGGREGATE count(*) AS n, sum(rev_units) AS revenue_units
             GROUP BY l_returnflag
        |> SELECT l_returnflag, n, revenue_units
        """
    )


@register(
    "q_sql_scripting",
    oracle="""
    WITH t AS (
      SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ct
      FROM documents
    )
    SELECT ct AS corpus_tokens,
           CAST(ceil(1000000.0 / ct) AS BIGINT) AS epochs,
           CAST(ceil(1000000.0 / ct) AS BIGINT) * ct AS covered_tokens
    FROM t
    """,
    tier="P2",
    doc="SQL scripting (BEGIN/END compound statements, Spark 4.0): a "
    "control-flow script — DECLARE session-local variables, seed one "
    "from a scalar subquery over the corpus, WHILE-loop until the "
    "accumulated token budget is covered — returning the epochs plan "
    "as its final SELECT. The script's loop arithmetic is pure "
    "integer accumulation, so the closed-form oracle (ceil division) "
    "reproduces it exactly; the hash match proves the scripting "
    "dialect's variables and loop semantics agree with the algebraic "
    "form. Scripting is the migration surface for stored-procedure-"
    "style reference workloads; the data pass itself stays ONE "
    "aggregate — control flow never loops over data.",
)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "script_documents"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE ct BIGINT DEFAULT 0;
          DECLARE covered BIGINT DEFAULT 0;
          DECLARE epochs BIGINT DEFAULT 0;
          SET ct = (SELECT sum(size(split(text, ' ')))
                    FROM script_documents);
          WHILE covered < 1000000 DO
            SET covered = covered + ct;
            SET epochs = epochs + 1;
          END WHILE;
          SELECT ct AS corpus_tokens, epochs, covered AS covered_tokens;
        END
        """
    )


@register(
    "q_join_asof_nearest",
    oracle="""
    WITH err AS (
      SELECT user_id, event_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'error'
    ),
    pur AS (
      SELECT user_id, event_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
      SELECT e.event_id, p.event_id AS pid,
             abs(p.us - e.us) AS adiff,
             CASE WHEN p.us < e.us
                    OR (p.us = e.us AND p.event_id < e.event_id)
                  THEN 0 ELSE 1 END AS dir
      FROM err e JOIN pur p ON p.user_id = e.user_id
    ),
    ranked AS (
      SELECT event_id, pid, adiff, dir,
             row_number() OVER (
               PARTITION BY event_id
               ORDER BY adiff, dir,
                        CASE WHEN dir = 0 THEN -pid ELSE pid END
             ) AS rn
      FROM cand
    )
    SELECT event_id, pid AS nearest_purchase_id,
           CAST(adiff // 1000000 AS BIGINT) AS diff_s,
           CAST(dir AS INTEGER) AS dir
    FROM ranked WHERE rn = 1
    """,
    tier="P1",
    doc="NEAREST as-of join (either direction) — the sensor-fusion "
    "alignment semantic completing the as-of trio (backward "
    "q_join_asof, forward q_join_asof_forward): each error event "
    "matches the temporally NEAREST purchase of the same user, ties "
    "to the backward side then to the sort-adjacent candidate. "
    "Implemented as the union-sort pattern run once with TWO frames "
    "over the same per-user sort — last(ignorenulls) over "
    "(unboundedPreceding, -1) carries the latest prior purchase, "
    "first(ignorenulls) over (+1, unboundedFollowing) the next one — "
    "then a scalar nearer-of-two pick: ONE shuffle, no candidate "
    "explosion, vs the oracle's brute-force per-pair ranking. All "
    "comparisons are exact integer microseconds. At 100 TB identical "
    "to the as-of cost model: the sort is the price, both directions "
    "ride it.",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pur_us = F.when(F.col("event_type") == "purchase", F.col("us"))
    pur_id = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    carried = ev.select(
        "event_id",
        "event_type",
        "us",
        F.last(pur_us, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("back_us"),
        F.last(pur_id, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("back_id"),
        F.first(pur_us, ignorenulls=True)
        .over(w.rowsBetween(1, Window.unboundedFollowing))
        .alias("fwd_us"),
        F.first(pur_id, ignorenulls=True)
        .over(w.rowsBetween(1, Window.unboundedFollowing))
        .alias("fwd_id"),
    ).where(F.col("event_type") == "error")
    d_back = F.col("us") - F.col("back_us")
    d_fwd = F.col("fwd_us") - F.col("us")
    use_back = F.col("back_id").isNotNull() & (
        F.col("fwd_id").isNull() | (d_back <= d_fwd)
    )
    picked = carried.where(
        F.col("back_id").isNotNull() | F.col("fwd_id").isNotNull()
    ).select(
        "event_id",
        F.when(use_back, F.col("back_id"))
        .otherwise(F.col("fwd_id"))
        .alias("nearest_purchase_id"),
        F.when(use_back, d_back).otherwise(d_fwd).alias("adiff"),
        F.when(use_back, 0).otherwise(1).cast("int").alias("dir"),
    )
    return picked.select(
        "event_id",
        "nearest_purchase_id",
        F.expr("adiff div 1000000").alias("diff_s"),
        "dir",
    )


@register(
    "q_link_entity_blocking",
    oracle="""
    WITH dirty AS (
      SELECT s_suppkey AS dirty_id, s_nationkey,
             s_suppkey % 25 AS blk,
             replace(lower(s_name), '#', ' no.') AS d_name
      FROM supplier
    ),
    clean AS (
      SELECT s_suppkey AS clean_id, s_nationkey,
             s_suppkey % 25 AS blk,
             lower(s_name) AS c_name
      FROM supplier
    ),
    scored AS (
      SELECT d.dirty_id, c.clean_id,
             levenshtein(d.d_name, c.c_name) AS dist
      FROM dirty d JOIN clean c
        ON d.s_nationkey = c.s_nationkey AND d.blk = c.blk
    ),
    best AS (
      SELECT dirty_id, clean_id, dist,
             row_number() OVER (PARTITION BY dirty_id
                                ORDER BY dist, clean_id) AS rn
      FROM scored
    )
    SELECT dirty_id,
           clean_id AS matched_id,
           CAST(dist AS BIGINT) AS best_distance,
           dist <= 8 AS is_matched,
           clean_id = dirty_id AS is_correct
    FROM best WHERE rn = 1
    """,
    tier="P1",
    doc="Entity resolution / record linkage via block-score-resolve — "
    "the Fellegi-Sunter pipeline shape every master-data and "
    "training-data joinery needs: a dirtied registry (deterministic "
    "corruption: '#' -> ' no.', lowercased — the q_str_edit_distance "
    "trick) is re-linked to the clean registry by (1) BLOCKING on "
    "(nation, key mod 25) so candidate pairs are per-block quadratic "
    "instead of global-quadratic, (2) SCORING candidates with "
    "levenshtein (built into both engines), (3) RESOLVING one best "
    "match per dirty record (row_number over distance, id tiebreak) "
    "with an accept threshold and a ground-truth correctness flag. "
    "At 100 TB blocking IS the scale story — candidates are "
    "sum-of-block² not n², the same confinement as "
    "q_sim_range_search's cells, and a production system swaps the "
    "mod-key for a phonetic/sorted-neighborhood key with identical "
    "plan shape: one shuffle on the block key, a window per dirty "
    "id. The edit-distance scorer stays JVM-side (no UDF).",
)
def q_link_entity_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    dirty = s.select(
        F.col("s_suppkey").alias("dirty_id"),
        "s_nationkey",
        (F.col("s_suppkey") % 25).alias("blk"),
        F.replace(
            F.lower("s_name"), F.lit("#"), F.lit(" no.")
        ).alias("d_name"),
    )
    clean = s.select(
        F.col("s_suppkey").alias("clean_id"),
        F.col("s_nationkey").alias("c_nationkey"),
        (F.col("s_suppkey") % 25).alias("c_blk"),
        F.lower("s_name").alias("c_name"),
    )
    scored = dirty.join(
        clean,
        (F.col("s_nationkey") == F.col("c_nationkey"))
        & (F.col("blk") == F.col("c_blk")),
    ).select(
        "dirty_id",
        "clean_id",
        F.levenshtein("d_name", "c_name").cast("long").alias("dist"),
    )
    w = Window.partitionBy("dirty_id").orderBy(
        F.asc("dist"), F.asc("clean_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "dirty_id",
            F.col("clean_id").alias("matched_id"),
            F.col("dist").alias("best_distance"),
            (F.col("dist") <= 8).alias("is_matched"),
            (F.col("clean_id") == F.col("dirty_id")).alias("is_correct"),
        )
    )


@register(
    "q_sql_qualify",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(row_number() OVER w AS BIGINT) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey)
    QUALIFY rn <= 3
    ORDER BY o_orderpriority, rn
    """,
    tier="P2",
    doc="QUALIFY-clause surface (DuckDB/Snowflake/BigQuery syntax): "
    "top-3 orders per priority by integer cents. Spark SQL has no "
    "QUALIFY keyword; the identical semantics are the canonical "
    "filter-over-window subquery, which Catalyst plans as exactly "
    "the same Window + Filter the QUALIFY engines produce — this "
    "operator documents the 1:1 rewrite a migrating user applies. "
    "rank ties broken by o_orderkey for a total order; cents are "
    "exact int64 so the DESC sort is cross-engine deterministic. "
    "At scale: per-partition window, no global sort; with a large "
    "group count the window shuffle is the only exchange, and "
    "rn<=3 cuts cardinality before anything else touches it.",
)
def q_sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderkey, cents, rn
        FROM (
          SELECT o_orderpriority, o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                 CAST(row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY floor(o_totalprice * 100 + 0.5) DESC,
                            o_orderkey) AS BIGINT) AS rn
          FROM v_orders
        )
        WHERE rn <= 3
        ORDER BY o_orderpriority, rn
        """
    )


@register(
    "q_sql_unpivot_clause",
    oracle="""
    SELECT measure,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS sum_units,
           CAST(min(v) AS BIGINT) AS min_units,
           CAST(max(v) AS BIGINT) AS max_units
    FROM (
      SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_cents,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               AS price_cents,
             CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS disc_x1e4,
             CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) AS tax_x1e4
      FROM lineitem
    ) UNPIVOT (v FOR measure IN (qty_cents, price_cents, disc_x1e4,
                                 tax_x1e4))
    GROUP BY measure
    ORDER BY measure
    """,
    tier="P2",
    doc="SQL-standard UNPIVOT clause surface (Spark 3.4+ and DuckDB "
    "both parse the `UNPIVOT (v FOR measure IN (...))` form "
    "natively — this is the clause twin of q_unpivot_stack's "
    "stack() expression): four integer-unit measures unpivoted to "
    "(measure, v) rows then integrity-rolled-up per measure. "
    "Integer units per the scaler-fit convention keep every "
    "aggregate exact. Plan-wise UNPIVOT is Expand — each input "
    "row emits 4 narrow rows BEFORE the map-side partial "
    "aggregate, so the shuffle carries 4 groups' partials, not "
    "4x the table.",
)
def q_sql_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem_unpivot"
    )
    return spark.sql(
        """
        SELECT measure,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS sum_units,
               CAST(min(v) AS BIGINT) AS min_units,
               CAST(max(v) AS BIGINT) AS max_units
        FROM (
          SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                   AS qty_cents,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   AS price_cents,
                 CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)
                   AS disc_x1e4,
                 CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) AS tax_x1e4
          FROM v_lineitem_unpivot
        ) UNPIVOT (v FOR measure IN (qty_cents, price_cents, disc_x1e4,
                                     tax_x1e4))
        GROUP BY measure
        ORDER BY measure
        """
    )


@register(
    "q_join_bloom_runtime",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_items,
           {sql_sum_units("l_extendedprice * (1 - l_discount)")}
             AS revenue_units
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
    tier="P2",
    doc="Runtime Bloom-filter join pruning (r13) — Catalyst's injected "
    "runtime filter: with broadcast off (both sides 'big'), the "
    "optimizer plants a bloom_filter_agg over the selective build "
    "side (URGENT orders) and a might_contain(...) filter on the "
    "probe side's scan, so ~80% of lineitem rows drop BEFORE the "
    "join exchange instead of shuffling to die at the join — at "
    "100 TB this is the difference between shuffling the whole fact "
    "table and shuffling the matching fifth of it. Runs on an "
    "isolated newSession (broadcast disabled + bloom thresholds "
    "opened) so the conf never leaks into concurrent queries; "
    "tests/test_plans.py asserts might_contain + bloom_filter_agg "
    "land in the optimized plan. Results are conf-independent (the "
    "filter is semantics-preserving), so the oracle is the plain "
    "join SQL.",
)
def q_join_bloom_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import int_units
    from ..session import configure_session

    s = spark.newSession()
    configure_session(s)
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    # local fixtures are far below the production-tuned size gates; the
    # injection decision itself is what this operator exercises
    s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "1GB",
    )
    s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    o = load_table(s, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    li = load_table(s, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # bounded-group unit sum -> decimal(38,0) partials (the r10
            # rule: one priority group accumulates the whole fact side
            # at 100 TB, past int64)
            F.sum(
                int_units(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                ).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("revenue_units"),
        )
    )
