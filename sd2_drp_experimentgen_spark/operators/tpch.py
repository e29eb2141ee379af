"""Adapted TPC-H decision-support battery — SURVEY §2.11.

Completes the TPC-H query-shape coverage started by ``q_agg_groupby_q1``
(Q1), ``q_sql_q3_shipping`` (Q3), ``q_sql_q5_join_chain`` (Q5) and
``q_filter_pred_q6`` (Q6): the remaining query archetypes — EXISTS
semi-joins, nation-pair volume analysis, market share, correlated
threshold subqueries, disjunctive predicate pushdown, multiset anti
patterns — each adapted to the fixture's reduced schema (no partsupp
table, no commit/receipt dates, no shipmode/container). Q2/Q9/Q11
were out of scope through round 8; round 9 closes them by DERIVING
partsupp from lineitem's distinct (l_partkey, l_suppkey) pairs with
deterministic integer attributes (see the block comment at the
derivation), which both engines compute identically.

Determinism recipe (SURVEY §5.3): money flows through per-row integer
units (``int_units``); per-entity unit sums ride int64 (their group
magnitude is bounded by the entity), while BOUNDED-GROUP unit sums —
Q7/Q8/Q14/Q17/Q19/Q22's rollups, Q9's profit, Q11's grand total —
partial-aggregate in decimal(38,0) (r10: Q8's per-year total reaches
~8.5e18 units at sf~1e5, essentially AT the int64 boundary, and Q11's
grand total crosses it; a non-ANSI int64 sum would wrap silently while
DuckDB's HUGEINT stays exact). Quantities are integral doubles cast to
BIGINT; ratio outputs are one IEEE divide of two exact integers; every
LIMIT sits under a total order. All joins declare the small side; Catalyst broadcasts every
dimension (nation/region/supplier/part at 25/5/1e4/2e5 rows per TB of
facts stay broadcast-able at 100 TB — only orders⋈lineitem shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import int_units, sql_units
from ..plans.registry import register
from ..sources.tables import load_table


def _rev_units(price: str = "l_extendedprice", disc: str = "l_discount") -> F.Column:
    """Per-row revenue ``price*(1-disc)`` in exact 1e-4 units (BIGINT).

    price has 2dp and disc 2dp, so the product has exactly 4 decimal
    places — the half-up unit conversion is lossless, and the int64
    SUM is order-independent (a float SUM diverges across reduction
    orders at sf≥0.1; VERDICT r3 int-units note).
    """
    return int_units(F.col(price) * (F.lit(1.0) - F.col(disc)))


_REV_SQL = sql_units("l_extendedprice * (1 - l_discount)")


@register(
    "q_tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
    tier="P1",
    doc="TPC-H Q4 shape (order-priority checking): orders in one "
    "quarter having at least one lineitem shipped >30 days after "
    "order placement (the fixture's late-shipment stand-in for "
    "commitdate<receiptdate), counted per priority. The EXISTS "
    "plans as a LEFT SEMI hash join on l_orderkey with the date "
    "inequality as a join-side filter — each order is counted once "
    "no matter how many items are late, with no distinct step. At "
    "100 TB the quarter predicate prunes the orders scan first, so "
    "the semi-join probe side is already ~1% of the table.",
)
def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q7_NATIONS = ("NATION_3", "NATION_7")


@register(
    "q_tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_units
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = '{_Q7_NATIONS[0]}' AND n2.n_name = '{_Q7_NATIONS[1]}')
        OR (n1.n_name = '{_Q7_NATIONS[1]}' AND n2.n_name = '{_Q7_NATIONS[0]}'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '2000-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tier="P1",
    doc="TPC-H Q7 shape (volume shipping): bilateral trade revenue "
    "between two nations per shipment year and direction. The two "
    "single-nation filters push through the broadcast nation joins "
    "into the supplier/customer dimension scans, so only ~8% of "
    "fact rows (2 nations of 25, either side) survive to the "
    "orders⋈lineitem shuffle — the disjunctive pair condition is "
    "evaluated post-join on two already-filtered dimension columns. "
    "Revenue sums in exact 1e-4 integer units.",
)
def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _Q7_NATIONS
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin(a, b)
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("2000-01-01"))
    )
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            # decimal partials (r10): 8 bounded groups x unbounded fact
            # rows — int64 unit sums sit ~75x from wrap at sf~1e5
            F.sum(_rev_units().cast("decimal(38,0)"))
            .cast("long")
            .alias("revenue_units")
        )
    )


_Q8_REGION, _Q8_NATION, _Q8_TYPE = "EUROPE", "NATION_7", "ECONOMY"


@register(
    "q_tpch_q8_market_share",
    oracle=f"""
    SELECT year(o_orderdate) AS o_year,
           CAST(sum(CASE WHEN n1.n_name = '{_Q8_NATION}'
                    THEN {_REV_SQL} ELSE 0 END) AS BIGINT) AS nation_units,
           CAST(sum({_REV_SQL}) AS BIGINT) AS total_units,
           sum(CASE WHEN n1.n_name = '{_Q8_NATION}'
                    THEN {_REV_SQL} ELSE 0 END) / sum({_REV_SQL})
             AS mkt_share
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region   ON n2.n_regionkey = r_regionkey
    WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}'
    GROUP BY o_year
    """,
    tier="P1",
    doc="TPC-H Q8 shape (national market share): the share of one "
    "supplier nation in a region's yearly revenue for one part type. "
    "8-table join; every dimension side broadcasts, the region and "
    "part-type filters prune customer and part before the fact join, "
    "and the share is ONE IEEE divide of two exact int64 unit sums — "
    "a conditional float SUM ratio would drift across partitionings. "
    "Numerator and denominator are emitted alongside the ratio so "
    "the exactness is itself hash-checked.",
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == _Q8_REGION)
    n2 = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cust_natkey"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_natkey"))
        .select("c_custkey")
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_natkey"), F.col("n_name").alias("supp_nation")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_natkey"))
        .select("s_suppkey", "supp_nation")
    )
    prt = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == _Q8_TYPE
    ).select("p_partkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = _rev_units()
    nation_vol = F.when(F.col("supp_nation") == _Q8_NATION, vol).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(prt), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # decimal partials (r10): 7 year groups over the
            # region-filtered fact — total_units reaches ~8.5e18 at
            # sf~1e5, essentially AT the int64 boundary; a non-ANSI
            # sum would wrap silently exactly at target scale
            F.sum(nation_vol.cast("decimal(38,0)")).cast("long").alias("nation_units"),
            F.sum(vol.cast("decimal(38,0)")).cast("long").alias("total_units"),
        )
        .withColumn(
            "mkt_share", F.col("nation_units") / F.col("total_units")
        )
    )


@register(
    "q_tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_units,
           {sql_units("c_acctbal", 2)} AS acctbal_cents,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, acctbal_cents, n_name
    ORDER BY revenue_units DESC, c_custkey
    LIMIT 20
    """,
    tier="P1",
    doc="TPC-H Q10 shape (returned-item reporting): the 20 customers "
    "who returned the most revenue in one quarter. The returnflag "
    "and quarter predicates push into the two fact scans before "
    "their join; nation broadcasts onto the aggregated (per-customer)"
    " side, not the fact side. Ranking on the exact BIGINT unit sum "
    "with custkey tiebreak makes the LIMIT-20 boundary engine-exact "
    "— a rounded-double rank can tie arbitrarily.",
)
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_rev_units()).alias("revenue_units"))
    )
    return (
        per_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "revenue_units",
            int_units("c_acctbal", 2).alias("acctbal_cents"),
            "n_name",
        )
        .orderBy(F.desc("revenue_units"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                       AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tier="P1",
    doc="TPC-H Q13 shape (customer order-count distribution): a "
    "filtered LEFT OUTER join (the filter lives in the JOIN "
    "condition, not WHERE — moving it would silently drop the "
    "zero-order customers the query exists to count) feeding a "
    "double aggregation. count(o_orderkey) counts non-NULL keys "
    "only, so no-match customers land in the c_count=0 bucket. The "
    "second groupBy is over ≤ a few hundred distinct counts — "
    "near-free at any scale; the first is the standard key shuffle.",
)
def q_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_tpch_q14_promo_revenue",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END)
             AS BIGINT) AS promo_units,
           CAST(sum({_REV_SQL}) AS BIGINT) AS total_units,
           100.0 * (sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END)
                    / sum({_REV_SQL})) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    tier="P1",
    doc="TPC-H Q14 shape (promotion effect): the fraction of one "
    "month's revenue from PROMO-type parts. Part broadcasts (it "
    "carries only partkey+type here — column pruning keeps the "
    "broadcast tiny even with 10^8 parts); the month predicate "
    "prunes the fact scan to ~1.2% of row groups. The percentage is "
    "100.0 * one divide of two exact int64 sums — both operands "
    "emitted so exactness is hash-verified, the ratio is then "
    "deterministic by construction.",
)
def q_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    prt = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    vol = _rev_units()
    return (
        li.join(F.broadcast(prt), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            # decimal partials (r10): single-group month-filtered sums
            # are within ~2.6x of int64 at sf~1e5
            F.sum(
                F.when(F.col("p_type") == "PROMO", vol)
                .otherwise(F.lit(0)).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("promo_units"),
            F.sum(vol.cast("decimal(38,0)")).cast("long").alias("total_units"),
        )
        .withColumn(
            "promo_share_pct",
            F.lit(100.0) * (F.col("promo_units") / F.col("total_units")),
        )
    )


@register(
    "q_tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(sum({_REV_SQL}) AS BIGINT) AS total_units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_units
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_units = (SELECT max(total_units) FROM revenue)
    """,
    tier="P1",
    doc="TPC-H Q15 shape (top supplier): supplier(s) with the maximum "
    "quarterly revenue. The classic view-plus-scalar-subquery form "
    "becomes: per-supplier unit sums (one shuffle), a 1-row max "
    "aggregate broadcast back as a cross join, and an exact BIGINT "
    "equality filter — a window max over an unpartitioned frame "
    "would funnel every supplier through one task at scale. Ties "
    "all surface (no arbitrary pick), and the int64 revenue makes "
    "the max comparison exact where a double max could split ties.",
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_units()).alias("total_units")
    )
    mx = rev.agg(F.max("total_units").alias("max_units"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_units") == F.col("max_units"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_units")
    )


_Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)


@register(
    "q_tpch_q16_supplier_cnt",
    oracle=f"""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN ({", ".join(map(str, _Q16_SIZES))})
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    tier="P1",
    doc="TPC-H Q16 shape (parts/supplier relationship): distinct "
    "supplier counts per (brand, type, size) excluding one brand, "
    "the PROMO type, and black-listed suppliers (negative account "
    "balance stands in for the complaints LIKE — the fixture has no "
    "comment column). Supplier exclusion is a LEFT ANTI broadcast "
    "join (s_suppkey is non-null, so NOT IN ≡ anti-join here); the "
    "part predicates prune the broadcast build side. The exact "
    "distinct expands (brand,type,size,suppkey) then re-aggregates "
    "— two shuffles, both on low-cardinality group keys.",
)
def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    prt = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*_Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_sup = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(prt), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_sup),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q_tpch_q17_small_qty_revenue",
    oracle=f"""
    WITH part_avg AS (
      SELECT l_partkey AS pk, count(*) AS n_li,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT count(*) AS n_small,
           CAST(sum({sql_units("l_extendedprice")}) AS BIGINT) AS revenue_units,
           sum({sql_units("l_extendedprice")}) / 70000.0 AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN part_avg ON l_partkey = pk
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND CAST(l_quantity AS BIGINT) * 5 * n_li < sum_qty
    """,
    tier="P1",
    doc="TPC-H Q17 shape (small-quantity-order revenue): revenue from "
    "lineitems of one brand+type whose quantity is below 20% of that "
    "part's average order quantity. The correlated scalar subquery "
    "is decorrelated into a per-part (count, sum) aggregate joined "
    "back; the threshold 'qty < 0.2*avg' is algebraized to the pure "
    "INTEGER comparison qty*5*n < sum_qty — a float average would "
    "put boundary rows on different sides per engine/partitioning. "
    "GROUP BY () keeps the one aggregate row even over zero inputs "
    "on both engines. At 100 TB the per-part aggregate is the big "
    "shuffle; the brand filter cannot prune it because the average "
    "is over ALL lineitems of the part — exactly TPC-H's semantics.",
)
def q_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("n_li"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )
    prt = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    small = (
        li.join(F.broadcast(prt), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("pk"))
        .where(
            F.col("l_quantity").cast("long") * F.lit(5) * F.col("n_li")
            < F.col("sum_qty")
        )
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small"),
        # decimal partials (r10): one global group — see Q8's note
        F.sum(int_units("l_extendedprice").cast("decimal(38,0)"))
        .cast("long")
        .alias("revenue_units"),
    ).withColumn("avg_yearly", F.col("revenue_units") / F.lit(70000.0))


_Q18_MIN_QTY = 250


@register(
    "q_tpch_q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey AS bk, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > {_Q18_MIN_QTY}
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch,
           {sql_units("o_totalprice", 2)} AS totalprice_cents,
           sum_qty
    FROM big
    JOIN orders   ON bk = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY totalprice_cents DESC, o_orderkey
    LIMIT 100
    """,
    tier="P1",
    doc="TPC-H Q18 shape (large-volume customers): orders whose total "
    "quantity exceeds a threshold, with their customers, top-100 by "
    "order value. The HAVING aggregate runs FIRST (map-side partial "
    "sums shrink the shuffle to one row per order) and its survivors "
    "— ~1% of orders — drive semi-join-like probes into orders and "
    "customer, so the expensive tables are only touched for "
    "qualifying keys. Integral quantities sum as BIGINT; the "
    "top-100 orders on exact cents with orderkey tiebreak.",
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import epoch_seconds

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("bk") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            epoch_seconds(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_epoch"
            ),
            int_units("o_totalprice", 2).alias("totalprice_cents"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice_cents"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_tpch_q19_disjunctive_rev",
    oracle=f"""
    SELECT count(*) AS n_items, CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_units
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tier="P1",
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
    "three OR-ed brand/size/quantity branches across the "
    "lineitem⋈part join. Catalyst extracts the common "
    "per-side conjuncts from the disjunction (part: brand IN + size "
    "≤ 15; lineitem: quantity ≤ 30) and pushes them into both scans "
    "— the full cross-table OR is then a post-join filter on an "
    "already-reduced row set. GROUP BY () pins the one-row result "
    "over empty input. The single-branch-free structure is the "
    "benchmark's test that OR does not defeat pushdown.",
)
def q_tpch_q19_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    prt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15)
           & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(prt), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # decimal partials (r10): one global group — see Q8's note
            F.sum(_rev_units().cast("decimal(38,0)")).cast("long").alias("revenue_units"),
        )
    )


_Q20_PREFIX, _Q20_MIN_QTY = "red", 10


@register(
    "q_tpch_q20_part_promotion",
    oracle=f"""
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '{_Q20_PREFIX}%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > {_Q20_MIN_QTY}
    )
    """,
    tier="P1",
    doc="TPC-H Q20 shape (potential part promotion): suppliers who "
    "moved more than a threshold quantity of one part family (name "
    "prefix) in a year. Without partsupp the availability check "
    "becomes shipped-quantity-over-threshold — same plan skeleton: "
    "the filtered part list broadcasts into lineitem, a per-supplier "
    "BIGINT quantity rollup applies the HAVING, and the surviving "
    "keys drive a LEFT SEMI join into supplier. The supplier table "
    "is never scanned for non-qualifying keys' sake at any scale; "
    "the prefix predicate pushes as a parquet StringStartsWith.",
)
def q_tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    prt = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith(_Q20_PREFIX)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    qualifying = (
        li.join(F.broadcast(prt), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > _Q20_MIN_QTY)
        .select("l_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        sup.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q_tpch_q21_waiting_supplier",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey,
             count(*) AS n_supp,
             sum(is_late) AS n_late_supp,
             max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
      FROM li GROUP BY l_orderkey
    )
    SELECT s_suppkey, s_name, count(*) AS numwait
    FROM per_order JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp > 1 AND n_late_supp = 1
    GROUP BY s_suppkey, s_name
    ORDER BY numwait DESC, s_suppkey
    LIMIT 25
    """,
    tier="P1",
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): for "
    "finalized multi-supplier orders, the supplier who was the ONLY "
    "late shipper (>60 days after placement — the fixture's "
    "receipt-vs-commit stand-in), ranked by offense count. The "
    "EXISTS/NOT-EXISTS pair over the same fact table is algebrized "
    "into ONE per-(order,supplier) rollup + ONE per-order rollup — "
    "two shuffles on the same l_orderkey key (the second is nearly "
    "free under AQE partition reuse) instead of three self-joins of "
    "a 100 TB table. 'Exactly one late supplier' ≡ the NOT EXISTS "
    "(another late) ∧ EXISTS (another) pair; max(CASE) picks that "
    "supplier without a join back.",
)
def q_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_pair = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late_supp"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(sup), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(25)
    )


_Q22_IDLE_SINCE = "2000-01-01"


@register(
    "q_tpch_q22_idle_customers",
    oracle=f"""
    WITH pos AS (
      SELECT count(*) AS n_pos,
             sum({sql_units("c_acctbal", 2)}) AS sum_cents
      FROM customer WHERE {sql_units("c_acctbal", 2)} > 0
    ),
    idle AS (
      SELECT c_custkey, c_nationkey, {sql_units("c_acctbal", 2)} AS bal_cents
      FROM customer, pos
      WHERE {sql_units("c_acctbal", 2)} * n_pos > sum_cents
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '{_Q22_IDLE_SINCE}'
        )
    )
    SELECT c_nationkey % 10 AS cntrycode,
           count(*) AS numcust,
           CAST(sum(bal_cents) AS BIGINT) AS total_cents
    FROM idle
    GROUP BY cntrycode
    """,
    tier="P1",
    doc="TPC-H Q22 shape (global sales opportunity): customers with "
    "above-average positive balances and no recent orders (the "
    "fixture has no 7-year-dormant customers, so dormancy is 'no "
    "order since 2000'), bucketed by country code (nationkey mod 10 "
    "stands in for the phone prefix). The average-balance threshold "
    "is algebrized to the integer comparison cents*n > sum_cents — "
    "exact on both engines where a float average flips boundary "
    "rows. The scalar aggregate broadcasts; NOT EXISTS is a LEFT "
    "ANTI join against the date-pruned orders scan. Both shuffles "
    "are on the small (customer) side — orders is only semi-scanned.",
)
def q_tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", int_units("c_acctbal", 2).alias("bal_cents")
    )
    pos = cust.where(F.col("bal_cents") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        # decimal partials (r10): global sum over every positive
        # balance; the threshold product below also runs wide
        F.sum(F.col("bal_cents").cast("decimal(38,0)")).alias("sum_cents"),
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(_Q22_IDLE_SINCE)
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))
        .where(
            # wide compare (r10, the Q11 lesson): cents x customer
            # count approaches int64 around sf~6e7 — compare in
            # decimal so boundary rows can never wrap
            F.col("bal_cents").cast("decimal(38,0)") * F.col("n_pos")
            > F.col("sum_cents")
        )
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("bal_cents").cast("decimal(38,0)"))
            .cast("long")
            .alias("total_cents"),
        )
    )


# --- Q2 / Q9 / Q11: the partsupp-dependent archetypes (round 9) ------
# The fixture ships no partsupp table, but lineitem carries
# (l_partkey, l_suppkey): the set of pairs actually traded IS this
# dataset's part-supplier catalog. partsupp is therefore DERIVED — the
# distinct traded pairs plus deterministic integer-only cost/quantity
# attributes computed from the keys — identically on both engines, so
# the three remaining TPC-H archetypes (correlated min-cost subquery,
# product-profit rollup, important-stock threshold) become
# hash-checkable instead of out-of-scope. The modular formulas are
# arbitrary but FIXED: pure BIGINT arithmetic, no floats, no hashing —
# bit-identical in Spark and DuckDB at any scale.
#
# Scale: the derivation is one distinct over a compact (long, long)
# key — bounded by |part| x |supplier|, shuffles only 16-byte rows,
# and reuses the partition layout of the consuming join. At 100 TB
# the distinct is the same map-side-combining aggregate every dedup
# rung uses; nothing is data-sized on the driver.

_SQL_PARTSUPP = """
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             CAST((ps_partkey * 7 + ps_suppkey * 131) % 9999 + 1 AS INT)
               AS ps_availqty,
             CAST((ps_partkey * 2969 + ps_suppkey * 3119) % 99901 + 100
                  AS BIGINT) AS ps_supplycost_cents
      FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                            l_suppkey AS ps_suppkey
            FROM lineitem)
    )
"""


def _supplycost_cents(pk: F.Column, sk: F.Column) -> F.Column:
    """The derived supply cost as a pure key function — single-sourced
    so `_partsupp` and Q9's algebraic projection cannot drift."""
    return ((pk * 2969 + sk * 3119) % 99901 + 100).cast("long")


def _partsupp(
    spark: SparkSession, sf_dir: str, by_part: bool = False
) -> DataFrame:
    """Spark twin of ``_SQL_PARTSUPP`` (see block comment above).

    ``by_part=True`` pre-partitions the distinct by ps_partkey ALONE:
    a subset of the dedup key still satisfies the aggregate's
    clustered requirement (same pair -> same part partition), and
    broadcast joins preserve the layout, so a consumer whose
    downstream ops key on the part key (Q2's min window, Q11's
    per-part rollup) runs directly on the distinct's own exchange —
    ONE shuffle of partsupp instead of two (verified in the pinned
    plans: no Exchange between the distinct and the window/rollup).
    Q9 keeps the default (partkey, suppkey) layout because its fact
    join clusters on both keys and reuses that exchange instead."""
    pairs = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    )
    if by_part:
        pairs = pairs.repartition(F.col("ps_partkey")).dropDuplicates(
            ["ps_partkey", "ps_suppkey"]
        )
    else:
        pairs = pairs.distinct()
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 131) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        _supplycost_cents(
            F.col("ps_partkey"), F.col("ps_suppkey")
        ).alias("ps_supplycost_cents"),
    )


_Q2_REGION = "EUROPE"
_Q2_MAX_SIZE = 5


@register(
    "q_tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {_SQL_PARTSUPP},
    eu_supp AS (
      SELECT s_suppkey, s_name, n_name,
             {sql_units("s_acctbal", 2)} AS acctbal_cents
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = '{_Q2_REGION}'
    ),
    cand AS (
      SELECT p_partkey, p_brand, s_name, n_name, acctbal_cents,
             ps_supplycost_cents, ps_suppkey
      FROM part
      JOIN partsupp ON ps_partkey = p_partkey
      JOIN eu_supp ON s_suppkey = ps_suppkey
      WHERE p_size <= {_Q2_MAX_SIZE}
    )
    SELECT p_partkey, p_brand, s_name, n_name, acctbal_cents,
           ps_supplycost_cents AS supplycost_cents
    FROM cand c
    WHERE ps_supplycost_cents = (
      SELECT min(ps_supplycost_cents) FROM cand c2
      WHERE c2.p_partkey = c.p_partkey
    )
    ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey, ps_suppkey
    LIMIT 100
    """,
    tier="P1",
    doc="TPC-H Q2 shape (minimum-cost supplier): for every small part "
    f"(p_size <= {_Q2_MAX_SIZE}), the {_Q2_REGION}-region suppliers "
    "whose derived supply cost equals the part's regional minimum — "
    "the correlated-min-subquery archetype. The oracle keeps the "
    "classic correlated form; the Spark plan algebrizes it as ONE "
    "min window partitioned by p_partkey over the "
    "part⋈partsupp⋈supplier join (no second shuffle: the window "
    "reuses the join's hash partitioning on the part key). "
    "supplier⋈nation⋈region broadcasts (dimension-sized); money "
    "rides as integer cents; the LIMIT sits under a total order "
    "ending in the unique (p_partkey, ps_suppkey).",
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == _Q2_REGION
    )
    eu_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            int_units("s_acctbal", 2).alias("acctbal_cents"),
        )
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") <= _Q2_MAX_SIZE)
        .select("p_partkey", "p_brand")
    )
    cand = (
        _partsupp(spark, sf_dir, by_part=True)
        .join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    min_cost = F.min("ps_supplycost_cents").over(
        Window.partitionBy("p_partkey")
    )
    return (
        cand.withColumn("min_cost", min_cost)
        .where(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .orderBy(
            F.desc("acctbal_cents"),
            "n_name",
            "s_name",
            "p_partkey",
            "ps_suppkey",
        )
        .limit(100)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            "acctbal_cents",
            F.col("ps_supplycost_cents").alias("supplycost_cents"),
        )
    )


_Q9_PART_LIKE = "red"


@register(
    "q_tpch_q9_product_profit",
    oracle=f"""
    WITH {_SQL_PARTSUPP}
    SELECT n_name,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum({_REV_SQL}
                    - ps_supplycost_cents * 100
                      * CAST(l_quantity AS BIGINT)) AS BIGINT)
             AS profit_units
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%{_Q9_PART_LIKE}%'
    GROUP BY n_name, o_year
    """,
    tier="P1",
    doc="TPC-H Q9 shape (product-type profit): profit = revenue minus "
    "derived supply cost, per supplier nation per order year, for "
    f"parts named like '%{_Q9_PART_LIKE}%'. Both profit terms ride "
    "in exact 1e-4-dollar integer units (revenue via int_units; "
    "cents x integral quantity x 100). The GROUP SUM runs in "
    "decimal(38,0) on the Spark side — mirroring DuckDB, whose "
    "sum(BIGINT) widens to HUGEINT — because per-row profit reaches "
    "~1e9 units and a (nation, year) group holds ~1e8-1e9 rows at "
    "sf~1e5 (~100 TB), leaving an int64 sum only ~1-2 orders of "
    "magnitude of headroom that depends on the '%red%' selectivity "
    "(ADVICE r9): a non-ANSI int64 sum would wrap silently exactly "
    "where the engines must agree. 38-digit decimal gives ~1e20x "
    "headroom; the final BIGINT output cast is exact whenever the "
    "TOTAL fits int64 (~9e18 units = ~$9e14 profit per nation-year, "
    "comfortably past 100 TB — same bound shape as Q11's threshold "
    "comment). The ORACLE keeps the classic "
    "partsupp equi-join on (partkey, suppkey); the Spark side "
    "ALGEBRIZES it away: partsupp's attributes are pure key "
    "functions and the pair set is derived FROM lineitem, so every "
    "fact row joins exactly its own (l_partkey, l_suppkey) entry — "
    "the join is the identity, and the supply cost is computed "
    "per-row by the shared _supplycost_cents formula with ZERO "
    "derivation shuffle (the r9 review caught the original form "
    "shuffling every traded pair to recompute f(key)). The "
    "part-name filter prunes the fact scan through the broadcast "
    "part join; supplier/nation/part broadcast, lineitem⋈orders is "
    "the only fact-fact shuffle.",
)
def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like(f"%{_Q9_PART_LIKE}%"))
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cost_cents = _supplycost_cents(F.col("l_partkey"), F.col("l_suppkey"))
    profit = _rev_units() - cost_cents * F.lit(100) * F.col(
        "l_quantity"
    ).cast("long")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "o_year")
        # decimal(38,0) partial+final sums cannot wrap (see doc); the
        # long cast only touches the per-group TOTAL, matching the
        # oracle's CAST(sum(...) AS BIGINT) over DuckDB's HUGEINT.
        .agg(
            F.sum(profit.cast("decimal(38,0)"))
            .cast("long")
            .alias("profit_units")
        )
    )


_Q11_MEAN_MULT = 2  # keep parts holding > 2x the mean per-part value


@register(
    "q_tpch_q11_important_stock",
    oracle=f"""
    WITH {_SQL_PARTSUPP},
    top_nat AS (
      SELECT s_nationkey FROM supplier
      GROUP BY s_nationkey
      ORDER BY count(*) DESC, s_nationkey
      LIMIT 1
    ),
    nat_supp AS (
      SELECT s_suppkey FROM supplier
      WHERE s_nationkey = (SELECT s_nationkey FROM top_nat)
    ),
    vals AS (
      SELECT ps_partkey,
             CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT)
               AS value_cents
      FROM partsupp
      JOIN nat_supp ON nat_supp.s_suppkey = ps_suppkey
      GROUP BY ps_partkey
    )
    SELECT ps_partkey, value_cents
    FROM vals
    WHERE CAST(value_cents AS HUGEINT)
          * (SELECT CAST(count(*) AS BIGINT) FROM vals) >
          {_Q11_MEAN_MULT} *
          (SELECT CAST(sum(value_cents) AS HUGEINT) FROM vals)
    """,
    tier="P1",
    doc="TPC-H Q11 shape (important stock identification): per-part "
    "derived stock value (cost x availqty) held by the suppliers of "
    "the nation with the MOST suppliers (deterministic: count desc, "
    "nationkey tie-break — a name literal selects an empty supplier "
    f"set at sf0.001), keeping parts above {_Q11_MEAN_MULT}x the "
    "MEAN per-part value — the scalar-threshold-subquery archetype. "
    "Classic Q11 divides its fraction by SF because a fixed share "
    "of total selects nothing once the part count grows; comparing "
    "to the mean is the scale-free equivalent and stays a pure "
    "integer comparison (value x n_parts > k x total), so no float "
    "fraction can flip boundary parts across engines (selects "
    "~10-15% of covered parts at every fixture scale). The nation's "
    "supplier list broadcasts; the per-part rollup is one shuffle "
    "of (long, long) rows; the 1-row (total, count) aggregate "
    "broadcasts back — at 100 TB nothing exceeds the per-part "
    "aggregate's key space.",
)
def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    top_nat = (
        sup.groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .orderBy(F.desc("n_supp"), F.asc("s_nationkey"))
        .limit(1)
        .select(F.col("s_nationkey").alias("top_nationkey"))
    )
    nat_supp = (
        sup.crossJoin(F.broadcast(top_nat))
        .where(F.col("s_nationkey") == F.col("top_nationkey"))
        .select("s_suppkey")
    )
    # vals feeds BOTH the threshold scan and the 1-row total — the
    # same dual-consumer shape as the dedup bucket tables, where AQE
    # exchange reuse proved opportunistic (r8): persist so the
    # partsupp distinct evaluates once; harnesses release it between
    # queries.
    from ..functions.helpers import tracked_persist

    vals = tracked_persist(
        _partsupp(spark, sf_dir, by_part=True)
        .join(F.broadcast(nat_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents") * F.col("ps_availqty").cast("long")
            ).alias("value_cents")
        )
    )
    total = vals.agg(
        # decimal partials (r10): the grand total over ~2e10 parts
        # reaches ~8e19 units at 100 TB — it must be summed wide, not
        # merely COMPARED wide (the int64 sum would wrap before the
        # decimal compare below ever saw it)
        F.sum(F.col("value_cents").cast("decimal(38,0)")).alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    # The threshold compare runs in 38-digit decimal on the Spark side
    # and HUGEINT in the oracle: value_cents (~4e9 worst case) times a
    # 100 TB part count (~2e10) overflows int64 exactly for the parts
    # the filter should keep — the comparison must be exact AND wide,
    # never a float fraction (which would flip boundary parts) and
    # never bare int64 (which would raise under ANSI at scale).
    return (
        vals.crossJoin(F.broadcast(total))
        .where(
            F.col("value_cents").cast("decimal(38,0)") * F.col("n_parts")
            > F.lit(_Q11_MEAN_MULT)
            * F.col("total_cents").cast("decimal(38,0)")
        )
        .select("ps_partkey", "value_cents")
    )


# --- Q12 (r13): completes TPC-H 22/22 -----------------------------------

# The fixture schema carries neither shipmode nor commit/receipt dates
# (SURVEY module docstring), so Q12's columns derive from keys with
# pure integer functions both engines compute identically — the same
# recipe that closed Q2/Q9/Q11 via the derived partsupp in r9. The
# shipmode coefficient on l_orderkey must be COPRIME with the 7-mode
# modulus (11 here): the first cut used 7, which vanishes mod 7 and
# silently degenerated shipmode to a pure l_linenumber function
# (caught by the r13 review) — positionally-striped modes instead of
# key-mixed ones.
_Q12_MODES = ("AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK")
_Q12_HIGH = ("1-URGENT", "2-HIGH")


@register(
    "q_tpch_q12_shipmode_priority",
    oracle=f"""
    WITH ext AS (
      SELECT l_orderkey,
             (['AIR','FOB','MAIL','RAIL','REG AIR','SHIP','TRUCK'])
               [CAST((l_orderkey * 11 + l_linenumber * 131) % 7 AS INT) + 1]
               AS l_shipmode,
             l_shipdate + INTERVAL 1 DAY *
               ((l_orderkey * 31 + l_linenumber * 17) % 30 + 1)
               AS l_commitdate,
             l_shipdate + INTERVAL 1 DAY *
               ((l_orderkey * 13 + l_linenumber * 29) % 45 + 1)
               AS l_receiptdate,
             l_shipdate
      FROM lineitem
    )
    SELECT l_shipmode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM ext JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipmode IN ('MAIL', 'SHIP')
      AND l_commitdate < l_receiptdate
      AND l_shipdate < l_commitdate
      AND l_receiptdate >= TIMESTAMP '1998-01-01'
      AND l_receiptdate <  TIMESTAMP '1999-01-01'
    GROUP BY l_shipmode
    """,
    tier="P1",
    doc="TPC-H Q12 (shipping modes / order priority) — the last of the "
    "22 TPC-H archetypes, completing 22/22 coverage: late-line "
    "counting by priority class over two ship modes. shipmode and "
    "commit/receipt dates derive from (l_orderkey, l_linenumber) "
    "with pure integer key functions (the r9 derived-partsupp "
    "recipe), so both engines see identical columns; date arithmetic "
    "is whole-day interval adds on ntz timestamps, exact in both. "
    "Plan: the derived-column filter reduces lineitem ~8x BEFORE the "
    "orders join (priority arrives by one equi-join on orderkey — "
    "AQE broadcasts the filtered side locally; at 100 TB both sides "
    "shuffle once on the join key), then a 2-group conditional "
    "count rollup with map-side partials.",
)
def q_tpch_q12_shipmode_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    modes = F.array(*[F.lit(m) for m in _Q12_MODES])
    ext = li.select(
        "l_orderkey",
        F.element_at(
            modes,
            (
                (F.col("l_orderkey") * 11 + F.col("l_linenumber") * 131) % 7
                + 1
            ).cast("int"),
        ).alias("l_shipmode"),
        F.expr(
            "timestampadd(DAY, CAST((l_orderkey * 31 + l_linenumber * 17) "
            "% 30 + 1 AS INT), l_shipdate)"
        ).alias("l_commitdate"),
        F.expr(
            "timestampadd(DAY, CAST((l_orderkey * 13 + l_linenumber * 29) "
            "% 45 + 1 AS INT), l_shipdate)"
        ).alias("l_receiptdate"),
        "l_shipdate",
    )
    late = ext.where(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_receiptdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return (
        late.join(o, late.l_orderkey == o.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )
