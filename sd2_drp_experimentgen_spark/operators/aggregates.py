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

from ..functions.helpers import (
    _round_halfup,
    exact_sum,
    int_units,
    r4,
    sql_exact_sum,
    sql_r,
    sql_units,
)
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
           {sql_r(sql_exact_sum('l_quantity'))} AS sum_qty,
           {sql_r(sql_exact_sum('l_extendedprice'))} AS sum_base_price,
           {sql_r(sql_exact_sum('l_extendedprice * (1 - l_discount)'))} AS sum_disc_price,
           {sql_r(sql_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6))} AS sum_charge,
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
    "rollup analog). Partial aggregation happens map-side "
    "automatically. The four SUM columns ride exact_sum (r10): six "
    "groups over an unbounded fact means the float sums reach ~1e12 "
    "at a 128x corpus, where one ulp exceeds the 4dp rounding step — "
    "the x128 replication study caught sum_charge differing from "
    "DuckDB in the last decimal with an identical plan. Per-row exact "
    "integer units (scale 6 for charge: 2dp price x 2dp discount x "
    "2dp tax), decimal(38,0) partials, one double divide. The AVG "
    "columns stay float: their magnitude is per-row-sized, so the "
    "sum's couple-ulp noise divides away by n.",
)
def q_agg_groupby_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(exact_sum("l_quantity")).alias("sum_qty"),
            r4(exact_sum("l_extendedprice")).alias("sum_base_price"),
            r4(exact_sum(disc_price)).alias("sum_disc_price"),
            r4(
                exact_sum(disc_price * (F.lit(1) + F.col("l_tax")), 6)
            ).alias("sum_charge"),
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
           {sql_r(f"sum({sql_units('l_quantity * l_extendedprice')})"
                  f" / (100.0 * sum({sql_units('l_quantity', 2)}))")}
             AS w_avg_price,
           sum({sql_units('l_quantity', 2)}) / 100.0 AS total_qty
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
    # int-units sums (helpers.int_units): float sums crossed the 4dp
    # rounding boundary at sf0.1; integer units keep the weighted mean
    # exact and reduction-order-independent at any scale.
    sum_qp = F.sum(int_units(F.col("l_quantity") * F.col("l_extendedprice")))
    sum_q = F.sum(int_units("l_quantity", 2))
    return li.groupBy("l_orderkey").agg(
        r4(sum_qp / (F.lit(100.0) * sum_q)).alias("w_avg_price"),
        (sum_q / F.lit(100.0)).alias("total_qty"),
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
    SELECT count(DISTINCT l_orderkey) AS exact_orders,
           true AS approx_ok
    FROM lineitem
    """,
    tier="P2",
    doc="approx_count_distinct (HyperLogLog++) next to the exact count. "
    "HLL sketch values differ per engine, so the sketch itself cannot "
    "be oracled; instead the query emits the exact count (hash-checked "
    "bit-exact) plus approx_ok = |approx-exact|/exact < 5% — Spark's "
    "HLL++ is deterministic for fixed data+rsd, so the boolean is a "
    "stable, driver-hashable witness that the sketch ran and landed "
    "in-bound (upgrades r1's no_oracle row; VERDICT r3 item 7). At "
    "100 TB the approx path alone is a single pass with fixed memory "
    "and no distinct shuffle; HERE the exact companion mandates the "
    "distinct exchange anyway, so the sketch rides that pass (one "
    "partial HLL per partition) instead of triggering the "
    "distinct-rewrite's per-key sketch buffers.",
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # rsd=0.01: the default 0.05 is a *standard deviation*, so the
    # realized error can exceed 5% at small cardinality (it does at
    # sf0.001); 1% rsd leaves 5x margin under the 5% witness bound.
    #
    # Both aggregates run over ONE distinct() pass (r14): mixing a
    # distinct aggregate (countDistinct) with a non-distinct one in a
    # single agg triggers Spark's distinct-rewrite, whose first phase
    # groups by l_orderkey and builds a ~16 KB rsd=0.01 HLL++ buffer
    # PER DISTINCT KEY (~150k sketches at sf0.1: measured 4.6 s vs
    # 0.9 s). HLL registers depend only on the SET of values, so the
    # sketch over distinct keys is bit-identical to the sketch over
    # the multiset (verified equal at sf0.001/0.01/0.1), and the exact
    # count requires the distinct exchange anyway — the sketch now
    # rides it with 32 partial buffers instead of 150k.
    dk = li.select("l_orderkey").distinct()
    return dk.agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.count(F.lit(1)).alias("exact_orders"),
    ).select(
        "exact_orders",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            / F.col("exact_orders")
            < 0.05
        ).alias("approx_ok"),
    )


@register(
    "q_agg_approx_percentile",
    oracle=f"""
    SELECT l_returnflag,
           {sql_r('quantile_cont(l_extendedprice, 0.5)')} AS exact_p50,
           {sql_r('quantile_cont(l_extendedprice, 0.9)')} AS exact_p90,
           true AS p50_ok,
           true AS p90_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tier="P2",
    doc="approx_percentile (median + p90 of l_extendedprice per return "
    "flag, accuracy 10000) next to the exact interpolated percentile. "
    "GK sketch values differ per engine, so the query emits the exact "
    "percentiles (hash-checked vs DuckDB quantile_cont, shared "
    "linear-interpolation semantics) plus pXX_ok booleans bounding "
    "the sketch's relative error at 1% — deterministic for fixed "
    "data+accuracy, so driver-hashable (upgrades r1's no_oracle row; "
    "VERDICT r3 item 7). At 100 TB the sketch path replaces the full "
    "sort an exact percentile needs: single pass, mergeable "
    "fixed-size state.",
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        F.approx_percentile("l_extendedprice", 0.9, 10000).alias("approx_p90"),
        F.percentile("l_extendedprice", 0.5).alias("exact_p50"),
        F.percentile("l_extendedprice", 0.9).alias("exact_p90"),
    )
    within = lambda p: (  # noqa: E731
        F.abs(F.col(f"approx_{p}") - F.col(f"exact_{p}"))
        / F.col(f"exact_{p}")
        < 0.01
    ).alias(f"{p}_ok")
    return agg.select(
        "l_returnflag",
        r4(F.col("exact_p50")).alias("exact_p50"),
        r4(F.col("exact_p90")).alias("exact_p90"),
        within("p50"),
        within("p90"),
    )


@register(
    "q_agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           {sql_r('stddev_samp(l_discount)', 6)} AS sd_disc,
           {sql_r('var_samp(l_discount)', 6)} AS var_disc,
           {sql_r('corr(l_quantity, l_extendedprice)', 6)} AS corr_qty_price,
           {sql_r('covar_samp(l_quantity, l_discount)', 6)} AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tier="P1",
    doc="Statistical aggregates: stddev/variance/correlation/covariance "
    "per return flag (descriptor statistics analog). Computed over "
    "O(1)-magnitude columns so 6dp rounding absorbs partial-merge "
    "reduction-order noise.",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r6

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.stddev_samp("l_discount")).alias("sd_disc"),
        r6(F.var_samp("l_discount")).alias("var_disc"),
        r6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        r6(F.covar_samp("l_quantity", "l_discount")).alias("cov_qty_disc"),
    )


@register(
    "q_agg_percentile",
    oracle=f"""
    SELECT o_orderstatus,
           {sql_r('quantile_cont(o_totalprice, 0.5)')} AS median_price,
           {sql_r('quantile_cont(o_totalprice, 0.9)')} AS p90_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tier="P1",
    doc="Exact interpolated percentiles (median + p90) per order status "
    "(score-distribution analog). Spark percentile() and DuckDB "
    "quantile_cont share linear-interpolation semantics.",
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        r4(F.percentile("o_totalprice", 0.5)).alias("median_price"),
        r4(F.percentile("o_totalprice", 0.9)).alias("p90_price"),
    )


@register(
    "q_agg_conditional_pivot",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error
    FROM events
    GROUP BY user_id
    """,
    tier="P1",
    doc="SIGNATURE: pivot to one column per category — the robot-file "
    "export shape (one column per reagent). Explicit value list (never "
    "implicit: implicit pivot scans twice and its column order is "
    "data-dependent); missing combos coalesced to 0 to match the "
    "conditional-aggregation oracle.",
)
def q_agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    types = ["click", "view", "purchase", "signup", "error"]
    ev = load_events(spark, sf_dir)
    pv = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .count()
    )
    return pv.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in types
        ],
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           count(*) AS n_custs
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    tier="P1",
    doc="ROLLUP(region, nation) customer counts with the NULL group "
    "labels replaced by 'ALL' on both engines (hierarchical reporting). "
    "Dimension joins broadcast.",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "n_custs",
        )
    )


@register(
    "q_agg_cube",
    oracle=f"""
    SELECT coalesce(c_mktsegment, 'ALL') AS segment,
           coalesce(o_orderstatus, 'ALL') AS status,
           count(*) AS n_orders,
           {sql_r(sql_exact_sum('o_totalprice'))} AS total_price
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    GROUP BY CUBE(c_mktsegment, o_orderstatus)
    """,
    tier="P1",
    doc="CUBE(segment, status) order counts + totals with 'ALL' labels "
    "(cross-tab reporting). total_price rides exact_sum (r10): the "
    "cube's () cell sums EVERY order's price — a bounded-group money "
    "sum that crosses the 4dp float boundary at large corpora (see "
    "q_agg_groupby_q1).",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        joined.cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(exact_sum("o_totalprice")).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "q_agg_grouping_sets",
    oracle="""
    SELECT coalesce(c_mktsegment, 'ALL') AS segment,
           coalesce(o_orderstatus, 'ALL') AS status,
           count(*) AS n_orders
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
    """,
    tier="P2",
    doc="Explicit GROUPING SETS ((segment),(status),()) via Spark SQL "
    "over temp views (the most portable route in PySpark).",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    return spark.sql(
        """
        SELECT coalesce(c_mktsegment, 'ALL') AS segment,
               coalesce(o_orderstatus, 'ALL') AS status,
               count(*) AS n_orders
        FROM gs_orders JOIN gs_customer ON c_custkey = o_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
        """
    )


# The q_train_features_wide oracle, extracted so q_mllib_train_pipeline
# (ml.py) can reuse it as a CTE for its SQL-expressible companion
# columns (n_train = row count, n_features via distinct nations).
FEATURES_WIDE_SQL = f"""
    WITH ord AS (
      SELECT o_custkey,
             count(*) AS n_orders,
             {sql_r('sum(o_totalprice)')} AS total_spend,
             {sql_r('avg(o_totalprice)')} AS avg_spend,
             max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS label
      FROM orders
      GROUP BY o_custkey
    ), li_per_order AS (
      SELECT l_orderkey,
             sum({sql_units("l_discount", 2)}) AS disc_units,
             count(*) AS n_items
      FROM lineitem GROUP BY l_orderkey
    ), li AS (
      SELECT o_custkey,
             {sql_r('sum(disc_units) / (100.0 * sum(n_items))')} AS avg_disc,
             sum(n_items) AS n_items
      FROM li_per_order JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    )
    SELECT c_custkey,
           n_name,
           r_name,
           n_orders,
           total_spend,
           avg_spend,
           coalesce(avg_disc, 0.0) AS avg_disc,
           CAST(coalesce(n_items, 0) AS BIGINT) AS n_items,
           label,
           CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS seg_automobile,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS seg_building,
           CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END AS seg_furniture,
           CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END AS seg_household,
           CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS seg_machinery
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    JOIN ord ON ord.o_custkey = c_custkey
    LEFT JOIN li ON li.o_custkey = c_custkey
    """


@register(
    "q_train_features_wide",
    oracle=FEATURES_WIDE_SQL,
    tier="P1",
    doc="SIGNATURE: the ML training table — one row per customer with a "
    "binary label, engineered spend/discount features, manual one-hot "
    "segment encoding (CASE WHEN so it hash-checks), and dim names "
    "joined in. This is the reference's training-CSV generation step; "
    "the MLlib pipeline (q_mllib_train_pipeline) consumes it.",
)
def q_train_features_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    ord_agg = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("total_spend"),
            r4(F.avg("o_totalprice")).alias("avg_spend"),
            F.max(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("label"),
        )
        .withColumnRenamed("o_custkey", "ord_custkey")
    )
    # Pre-aggregate lineitem per ORDER before touching orders: at 100 TB
    # this collapses the fact-fact join's probe side from one row per
    # item to one row per order (~4x here, ~10x in TPC-H proper) before
    # any wide shuffle, and the discount average is carried as EXACT
    # integer partials (2dp discounts -> cent-units; the final divide is
    # one IEEE op), so the two-phase rollup is bit-deterministic where
    # an avg-of-doubles would drift with reduction order.
    li_per_order = li.groupBy("l_orderkey").agg(
        F.sum(int_units("l_discount", 2)).alias("disc_units"),
        F.count(F.lit(1)).alias("n_items_o"),
    )
    li_agg = (
        li_per_order.join(
            o.select("o_orderkey", "o_custkey"),
            li_per_order.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            r4(
                F.sum("disc_units")
                / (F.lit(100.0) * F.sum("n_items_o"))
            ).alias("avg_disc"),
            F.sum("n_items_o").alias("n_items"),
        )
        .withColumnRenamed("o_custkey", "li_custkey")
    )
    seg = F.col("c_mktsegment")
    onehots = [
        F.when(seg == s, 1).otherwise(0).alias(f"seg_{s.lower()}")
        for s in ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    ]
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(ord_agg, ord_agg.ord_custkey == c.c_custkey)
        .join(li_agg, li_agg.li_custkey == c.c_custkey, "left")
        .select(
            "c_custkey",
            "n_name",
            "r_name",
            "n_orders",
            "total_spend",
            "avg_spend",
            F.coalesce(F.col("avg_disc"), F.lit(0.0)).alias("avg_disc"),
            F.coalesce(F.col("n_items"), F.lit(0)).alias("n_items"),
            "label",
            *onehots,
        )
    )


@register(
    "q_agg_correlated_filter",
    oracle=f"""
    SELECT p.p_partkey, p.p_brand, {sql_r('p.p_retailprice')} AS price,
           {sql_r('b.brand_avg')} AS brand_avg
    FROM part p
    JOIN (
      SELECT p_brand, avg(p_retailprice) AS brand_avg
      FROM part GROUP BY p_brand
    ) b ON p.p_brand = b.p_brand
    WHERE p.p_retailprice > 1.05 * b.brand_avg
    """,
    tier="P1",
    doc="Correlated-subquery shape (parts priced > 1.05x their brand's "
    "average) decorrelated to aggregate + re-join, which is exactly "
    "what Catalyst (and every optimizer) rewrites the subquery to. "
    "The brand-average side is tiny and broadcasts; the fact side "
    "never shuffles. QC-threshold analog: flag outliers vs their "
    "group baseline.",
)
def q_agg_correlated_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    brand_avg = p.groupBy("p_brand").agg(
        F.avg("p_retailprice").alias("brand_avg")
    )
    return (
        p.join(F.broadcast(brand_avg), "p_brand")
        .where(F.col("p_retailprice") > 1.05 * F.col("brand_avg"))
        .select(
            "p_partkey",
            "p_brand",
            r4(F.col("p_retailprice")).alias("price"),
            r4(F.col("brand_avg")).alias("brand_avg"),
        )
    )


@register(
    "q_agg_collect_sets",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|')
             AS segments,
           CAST(count(DISTINCT c_mktsegment) AS INTEGER) AS n_segments
    FROM customer
    GROUP BY c_nationkey
    """,
    tier="P1",
    doc="Set-valued aggregation (array_agg DISTINCT): per nation, the "
    "sorted set of customer market segments. Emitted sorted because "
    "collect_set order is partition-dependent — the determinism rule "
    "for every array-valued aggregate (SURVEY 5.3) — and string-encoded "
    "('|'-joined) because the driver's pandas canonicalizer cannot hash "
    "container cells (r2's one red row: TypeError unhashable 'list'). "
    "Output schemas stay scalar-only repo-wide; "
    "tests/test_output_schemas.py pins the rule.",
)
def q_agg_collect_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("c_mktsegment"))).alias(
            "segments"
        ),
        F.countDistinct("c_mktsegment").cast("int").alias("n_segments"),
    )


@register(
    "q_agg_boolean",
    oracle=f"""
    SELECT c_nationkey,
           CASE WHEN bool_or(c_acctbal < 0) THEN 1 ELSE 0 END AS any_negative,
           CASE WHEN bool_and(c_acctbal > -1000) THEN 1 ELSE 0 END
             AS all_above_floor,
           CAST(count(*) FILTER (c_acctbal < 0) AS BIGINT) AS n_negative,
           {sql_r('avg(CASE WHEN c_acctbal < 0 THEN 1.0 ELSE 0.0 END)')}
             AS neg_share
    FROM customer
    GROUP BY c_nationkey
    """,
    tier="P1",
    doc="Boolean aggregates per nation: any/every (bool_or/bool_and), "
    "filtered count (count_if), and a share — the QC-flag rollup shape "
    "(any well failed / all wells in range). Emitted as 0/1 ints so "
    "the cross-engine hash is boolean-representation-agnostic.",
)
def q_agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    neg = F.col("c_acctbal") < 0
    return c.groupBy("c_nationkey").agg(
        F.when(F.bool_or(neg), 1).otherwise(0).alias("any_negative"),
        F.when(F.bool_and(F.col("c_acctbal") > -1000), 1)
        .otherwise(0)
        .alias("all_above_floor"),
        F.count_if(neg).alias("n_negative"),
        r4(F.avg(F.when(neg, 1.0).otherwise(0.0))).alias("neg_share"),
    )


@register(
    "q_agg_hll_sketch_merge",
    oracle="""
    WITH e AS (
      SELECT date_trunc('day', ts) AS day, event_type, user_id FROM events
    ),
    d AS (
      SELECT day, event_type, count(DISTINCT user_id) AS day_exact
      FROM e GROUP BY day, event_type
    ),
    m AS (
      SELECT event_type, max(day_exact) AS max_day_exact
      FROM d GROUP BY event_type
    ),
    x AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_users
      FROM e GROUP BY event_type
    )
    SELECT x.event_type, x.exact_users, m.max_day_exact,
           true AS est_ok, true AS ge_day_ok
    FROM x JOIN m USING (event_type)
    """,
    tier="P2",
    doc="Re-aggregatable HLL sketches (Spark 3.5+ Datasketches "
    "functions): per-(day, event_type) user sketches built with "
    "hll_sketch_agg, then MERGED across days with hll_union_agg — the "
    "two-level rollup a 100 TB pipeline stores (daily sketch tables "
    "are tiny and re-mergeable to any coarser grain without rescanning "
    "raw events; plain approx_count_distinct cannot re-aggregate). "
    "Binary sketches have no cross-engine twin, so the hash check uses "
    "exact companions + deterministic witnesses: exact_users and "
    "max_day_exact are bit-exact vs SQL, est_ok bounds the merged "
    "estimate's relative error at 5%, ge_day_ok pins union "
    "monotonicity (merged >= 0.95x the largest single day).",
)
def q_agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    day_sketch = ev.groupBy(
        F.date_trunc("DAY", F.col("ts")).alias("day"), "event_type"
    ).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("day_exact"),
    )
    merged = day_sketch.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est_users"),
        F.max("day_exact").alias("max_day_exact"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "exact_users",
        "max_day_exact",
        (
            F.abs(F.col("est_users") - F.col("exact_users"))
            / F.col("exact_users")
            < 0.05
        ).alias("est_ok"),
        (F.col("est_users") >= F.col("max_day_exact") * 0.95).alias(
            "ge_day_ok"
        ),
    )


@register(
    "q_agg_listagg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tier="P1",
    doc="Ordered string aggregation (Spark 4 listagg WITHIN GROUP "
    "(ORDER BY ...) — the SQL:2016 surface; DuckDB twin is "
    "string_agg with ORDER BY): nation names per region as one "
    "deterministic comma string. The explicit WITHIN GROUP order is "
    "what makes concatenation partitioning-independent — unordered "
    "listagg/string_agg output is engine- and shuffle-dependent.",
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).createOrReplaceTempView(
        "v_nation_region"
    )
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        FROM v_nation_region
        GROUP BY r_name
        """
    )


@register(
    "q_agg_grouping_id",
    oracle=f"""
    SELECT coalesce(status, '(null)') AS status,
           coalesce(o_orderpriority, '(all)') AS prio,
           CAST(GROUPING(status) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
           count(*) AS n,
           {sql_r(sql_exact_sum('o_totalprice'))} AS sum_price
    FROM (
      SELECT NULLIF(o_orderstatus, 'P') AS status, o_orderpriority,
             o_totalprice
      FROM orders
    )
    GROUP BY ROLLUP(status, o_orderpriority)
    """,
    tier="P1",
    doc="GROUPING() disambiguation over a rollup whose DATA also "
    "contains NULL key values (status 'P' is nullified to manufacture "
    "the collision): without the grouping flags, a data-NULL group "
    "and a subtotal row are indistinguishable after the usual "
    "coalesce — the classic rollup-report bug. g_status/g_prio "
    "separate them exactly. sum_price rides exact_sum (r10): the "
    "rollup's grand-total row is a bounded-group money sum over every "
    "order (see q_agg_groupby_q1).",
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status"),
        "o_orderpriority",
        "o_totalprice",
    )
    return (
        o.rollup("status", "o_orderpriority")
        .agg(
            F.grouping("status").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
            _round_halfup(exact_sum("o_totalprice"), 4).alias("sum_price"),
        )
        .select(
            F.coalesce(F.col("status"), F.lit("(null)")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)")).alias("prio"),
            "g_status",
            "g_prio",
            "n",
            "sum_price",
        )
    )


@register(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    tier="P1",
    doc="EXACT re-aggregatable distinct via bitmaps (Spark 3.5 bitmap "
    "functions — the roaring-bitmap warehouse pattern): user ids are "
    "bucketed with bitmap_bucket_number, each (type, bucket) builds a "
    "bitmap with bitmap_construct_agg, and per-type totals are "
    "sum(bitmap_count(bitmap)). Unlike approx sketches the counts are "
    "exact, and unlike COUNT(DISTINCT) the per-bucket bitmaps are "
    "storable and re-mergeable (bitmap_or_agg) across days without "
    "rescanning — the exact complement to q_agg_hll_sketch_merge. "
    "Hash-checked against plain COUNT(DISTINCT).",
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    per_bucket = ev.select(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    ).groupBy("event_type", "bucket").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )


@register(
    "q_agg_percentile_disc",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_r("quantile_disc(o_totalprice, 0.5)")} AS p50_disc,
           {sql_r("quantile_disc(o_totalprice, 0.9)")} AS p90_disc,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
    tier="P1",
    doc="percentile_disc WITHIN GROUP — the DISCRETE percentile "
    "(returns an actual data value by rank selection) next to the "
    "continuous interpolating percentile already covered "
    "(q_agg_percentile). Selection never interpolates, so the result "
    "is a row value and hash-checks exactly even where interpolation "
    "arithmetic could drift; the SQL:2008 WITHIN GROUP surface.",
)
def q_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_pd")
    return spark.sql(
        """
        SELECT o_orderpriority,
               floor(percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                     * 10000 + 0.5) / 10000 AS p50_disc,
               floor(percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)
                     * 10000 + 0.5) / 10000 AS p90_disc,
               count(*) AS n
        FROM v_orders_pd
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_agg_count_min_sketch",
    oracle="""
    WITH hot AS (
      SELECT user_id FROM events
      GROUP BY user_id ORDER BY count(*) DESC, user_id LIMIT 3
    ),
    et AS (SELECT DISTINCT event_type FROM events),
    cnt AS (
      SELECT event_type, user_id, count(*) AS n
      FROM events
      WHERE user_id IN (SELECT user_id FROM hot)
      GROUP BY event_type, user_id
    )
    SELECT et.event_type, h.user_id,
           coalesce(cnt.n, 0) AS exact,
           true AS cms_ok
    FROM et CROSS JOIN hot h
    LEFT JOIN cnt ON cnt.event_type = et.event_type
                 AND cnt.user_id = h.user_id
    """,
    tier="P2",
    doc="Count-min sketch heavy-hitter estimation (Spark's built-in "
    "count_min_sketch aggregate): one CMS per event_type over user_id "
    "occurrences, built distributed in a single pass; the driver "
    "collects only the FIVE serialized sketches (the whole point of a "
    "sketch — per-group state is a few KB regardless of row count) "
    "and probes them for the three hottest users via the JVM "
    "CountMinSketch reader. Binary sketches have no cross-engine "
    "twin, so the hash check uses exact companions + a deterministic "
    "witness: exact per-(type, hot-user) counts bit-exact vs SQL, and "
    "cms_ok = exact <= estimate <= exact + 50 (the CMS one-sided "
    "error guarantee; eps*N stays far under 50 at every driver sf, "
    "and the fixed seed makes the estimate reproducible). Completes "
    "the sketch family: HLL (approx distinct, mergeable), bitmap "
    "(exact distinct, mergeable), CMS (frequency, mergeable).",
)
def q_agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    # three hottest users overall (exact, distributed; tiebreak pinned)
    hot = [
        r["user_id"]
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(3)
        .collect()
    ]
    sketches = (
        ev.groupBy("event_type")
        .agg(
            F.expr(
                "count_min_sketch(user_id, 0.001d, 0.99d, 42)"
            ).alias("cms")
        )
        .collect()
    )
    exact = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in ev.where(F.col("user_id").isin(hot))
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    jvm = spark.sparkContext._jvm
    rows = []
    for r in sketches:
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(r["cms"])
        )
        for uid in hot:
            est = int(sk.estimateCount(int(uid)))
            ex = int(exact.get((r["event_type"], uid), 0))
            rows.append(
                (r["event_type"], int(uid), ex, ex <= est <= ex + 50)
            )
    return spark.createDataFrame(
        rows,
        schema="event_type string, user_id long, exact long, cms_ok boolean",
    )


@register(
    "q_agg_bitwise",
    oracle="""
    SELECT o_orderpriority,
           CAST(bit_and(o_orderkey % 4096) AS BIGINT) AS key_and,
           CAST(bit_or(o_orderkey % 4096) AS BIGINT) AS key_or,
           CAST(bit_xor(o_orderkey % 4096) AS BIGINT) AS key_xor
    FROM orders
    GROUP BY o_orderpriority
    """,
    tier="P2",
    doc="Bitwise aggregates (bit_and/bit_or/bit_xor): flag-mask "
    "rollups — which capability bits are shared by ALL rows of a "
    "group (and), present in ANY (or), and the xor parity checksum. "
    "Commutative+associative, so they combine map-side like any sum; "
    "the permission/feature-flag aggregation shape.",
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 4096
    return o.groupBy("o_orderpriority").agg(
        F.bit_and(k).alias("key_and"),
        F.bit_or(k).alias("key_or"),
        F.bit_xor(k).alias("key_xor"),
    )


@register(
    "q_agg_histogram_numeric",
    oracle="""
    SELECT count(*) AS total_mass,
           true AS n_bins_ok,
           true AS range_ok,
           true AS order_ok
    FROM lineitem
    """,
    tier="P2",
    doc="Adaptive histogram sketch (histogram_numeric): 20 "
    "variable-width bins whose centroids adapt to the data "
    "distribution — the one-pass approximate complement to the exact "
    "fixed-bin q_histogram_fixed_bins (which needs the global extent "
    "first). Bin placement is implementation-defined, so the hash "
    "check uses deterministic invariants instead of bin values: "
    "total_mass (sum of bin masses == exact row count — mass "
    "conservation, bit-exact), n_bins_ok (1..20 bins), range_ok "
    "(every centroid inside the exact global [min, max]), order_ok "
    "(centroids strictly increasing).",
)
def q_agg_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    binned = li.agg(
        F.expr("histogram_numeric(l_extendedprice, 20)").alias("bins")
    )
    ext = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    cents = "transform(bins, b -> b.x)"
    return binned.crossJoin(ext).select(
        F.expr("cast(aggregate(bins, 0D, (a, b) -> a + b.y) as long)").alias(
            "total_mass"
        ),
        F.expr("size(bins) between 1 and 20").alias("n_bins_ok"),
        F.expr(
            f"array_min({cents}) >= lo and array_max({cents}) <= hi"
        ).alias("range_ok"),
        F.expr(
            f"{cents} = array_sort({cents}) "
            f"and size(array_distinct({cents})) = size(bins)"
        ).alias("order_ok"),
    )


@register(
    "q_observe_metrics",
    oracle=f"""
    SELECT count(*) AS n_rows,
           {sql_r('sum(l_quantity)')} AS sum_qty,
           {sql_r('min(l_extendedprice)')} AS min_price,
           {sql_r('max(l_extendedprice)')} AS max_price
    FROM lineitem
    WHERE l_discount > 0.02
    """,
    tier="P2",
    doc="Observable metrics (df.observe + Observation): data-quality "
    "counters attached to a REAL query so they ride the same job — at "
    "100 TB the alternative is a second full scan just to know what "
    "the pipeline processed. The observed aggregates (row count, "
    "quantity total, price extrema over the filtered stream) are "
    "collected from the listener after one materializing pass and "
    "returned as a 1-row frame, hash-checked against computing the "
    "same aggregates declaratively. The driver-side collect is the "
    "metrics map only (4 scalars), never data.",
)
def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    # Isolated session (shared SparkContext, own ObservationManager):
    # a registered Observation leaves a non-serializable
    # ObservationManager reference on its session that later poisons
    # closure-cleaning for RDD-based jobs (MLlib evaluators) on the
    # same session. Scoping the observation to a throwaway session
    # keeps the caller's session clean; the returned frame is built on
    # the caller's session from plain Python scalars.
    spark_obs = spark.newSession()
    li = load_table(spark_obs, sf_dir, "lineitem")
    obs = Observation("qc")
    observed = li.where(F.col("l_discount") > 0.02).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    observed.write.format("noop").mode("overwrite").save()  # one real pass
    m = obs.get

    def rh4(x: float) -> float:  # same half-up rounding as the oracle
        import math

        return math.floor(x * 10000 + 0.5) / 10000

    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                rh4(m["sum_qty"]),
                rh4(m["min_price"]),
                rh4(m["max_price"]),
            )
        ],
        schema="n_rows long, sum_qty double, min_price double, "
        "max_price double",
    )


@register(
    "q_agg_theta_sketch_ops",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    pu AS (SELECT user_id FROM tu WHERE event_type = 'purchase'),
    np AS (SELECT count(*) AS n_purchase FROM pu),
    x AS (
      SELECT t.event_type,
             count(*) AS n_users,
             CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_inter
      FROM tu t LEFT JOIN pu p ON p.user_id = t.user_id
      GROUP BY t.event_type
    )
    SELECT event_type,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_purchase AS BIGINT) AS n_purchase,
           CAST(n_users + n_purchase - n_inter AS BIGINT) AS n_union,
           n_inter,
           CAST(n_users - n_inter AS BIGINT) AS n_diff,
           true AS union_ok, true AS inter_ok, true AS diff_ok
    FROM x CROSS JOIN np
    """,
    tier="P2",
    doc="Theta sketches (Spark 4.1 Datasketches): the SET-ALGEBRA "
    "sketch — unlike HLL, theta supports intersection and difference, "
    "the audience-overlap / retention-cross-section queries. Built "
    "two-level like a production sketch table: per-(day, event_type) "
    "user sketches, theta_union_agg rollup to type level, then each "
    "type's sketch intersected/differenced against the purchase "
    "cohort's sketch. Binary sketches have no cross-engine twin, so "
    "the hash check carries exact companions (distinct-user set "
    "algebra in plain SQL, all BIGINT) plus witness booleans bounding "
    "each estimate's error at 5% — below the 4096-entry nominal the "
    "sketch is exact, so the witnesses are deterministically true at "
    "verify scale and probabilistically safe far beyond it.",
)
def q_agg_theta_sketch_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    day_sk = ev.groupBy(
        F.date_trunc("DAY", F.col("ts")).alias("day"), "event_type"
    ).agg(F.theta_sketch_agg("user_id").alias("sk"))
    type_sk = day_sk.groupBy("event_type").agg(
        F.theta_union_agg("sk").alias("sk")
    )
    p_sk = type_sk.where(F.col("event_type") == "purchase").select(
        F.col("sk").alias("psk")
    )
    est = type_sk.crossJoin(F.broadcast(p_sk)).select(
        "event_type",
        F.theta_sketch_estimate(F.theta_union("sk", "psk")).alias("u_est"),
        F.theta_sketch_estimate(F.theta_intersection("sk", "psk")).alias(
            "i_est"
        ),
        F.theta_sketch_estimate(F.theta_difference("sk", "psk")).alias(
            "d_est"
        ),
    )
    tu = ev.select("event_type", "user_id").distinct()
    pu = tu.where(F.col("event_type") == "purchase").select(
        "user_id", F.lit(1).alias("in_p")
    )
    ex = (
        tu.join(F.broadcast(pu), "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce(F.col("in_p"), F.lit(0)))
            .cast("long")
            .alias("n_inter"),
        )
    )
    np_ = pu.agg(F.count(F.lit(1)).alias("n_purchase"))

    def ok(e, x):
        return (F.abs(e - x) <= F.greatest(x * F.lit(0.05), F.lit(2.0))).alias(
            None
        )

    out = est.join(ex, "event_type").crossJoin(F.broadcast(np_))
    n_union = F.col("n_users") + F.col("n_purchase") - F.col("n_inter")
    n_diff = F.col("n_users") - F.col("n_inter")
    return out.select(
        "event_type",
        "n_users",
        "n_purchase",
        n_union.alias("n_union"),
        "n_inter",
        n_diff.alias("n_diff"),
        (F.abs(F.col("u_est") - n_union)
         <= F.greatest(n_union * 0.05, F.lit(2.0))).alias("union_ok"),
        (F.abs(F.col("i_est") - F.col("n_inter"))
         <= F.greatest(F.col("n_inter") * 0.05, F.lit(2.0))).alias("inter_ok"),
        (F.abs(F.col("d_est") - n_diff)
         <= F.greatest(n_diff * 0.05, F.lit(2.0))).alias("diff_ok"),
    )


@register(
    "q_agg_kll_quantiles",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           {sql_r("quantile_disc(value, 0.5)")} AS p50_disc,
           {sql_r("quantile_disc(value, 0.9)")} AS p90_disc,
           true AS n_ok, true AS q50_ok, true AS q90_ok
    FROM events GROUP BY event_type
    """,
    tier="P2",
    doc="KLL quantile sketches (Spark 4.1 Datasketches): MERGEABLE "
    "streaming quantiles — the sketch a 100 TB pipeline stores per "
    "partition/day and rolls up to any grain without re-sorting raw "
    "data, where exact percentiles need a full sort per query. Built "
    "two-level: per-(day, event_type) kll_sketch_agg_double over "
    "event values, kll_merge_agg_double rollup to type level. Hash "
    "check: n from the merged sketch must equal the exact count "
    "(KLL tracks n exactly — n_ok), and the sketch's q50/q90 "
    "estimate must land between the exact discrete quantiles at "
    "±0.07 rank (the value-domain form of a 0.07 rank-error bound — "
    "4x the k=200 sketch's 99% bound, so the witnesses hold "
    "deterministically in practice at any scale). Exact p50/p90 "
    "companions are rank selections, engine-identical.",
)
def q_agg_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    day_sk = ev.groupBy(
        F.date_trunc("DAY", F.col("ts")).alias("day"), "event_type"
    ).agg(F.kll_sketch_agg_double(F.col("value")).alias("sk"))
    merged = day_sk.groupBy("event_type").agg(
        F.kll_merge_agg_double("sk").alias("sk")
    )
    ev.createOrReplaceTempView("v_events_kll")
    # the sketch reader takes only FOLDABLE ranks, so the witness is
    # inverted into the value domain: the sketch's q50/q90 estimate
    # must land between the exact discrete quantiles at +-0.07 rank —
    # equivalent to bounding the sketch's rank error at 0.07.
    ex = spark.sql(
        """
        SELECT event_type,
               count(*) AS n,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50_raw,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90_raw,
               percentile_disc(0.43) WITHIN GROUP (ORDER BY value) AS p43_raw,
               percentile_disc(0.57) WITHIN GROUP (ORDER BY value) AS p57_raw,
               percentile_disc(0.83) WITHIN GROUP (ORDER BY value) AS p83_raw,
               percentile_disc(0.97) WITHIN GROUP (ORDER BY value) AS p97_raw
        FROM v_events_kll GROUP BY event_type
        """
    )
    j = merged.join(ex, "event_type")
    q50_est = F.kll_sketch_get_quantile_double("sk", F.lit(0.5))
    q90_est = F.kll_sketch_get_quantile_double("sk", F.lit(0.9))
    return j.select(
        "event_type",
        "n",
        r4(F.col("p50_raw")).alias("p50_disc"),
        r4(F.col("p90_raw")).alias("p90_disc"),
        (F.kll_sketch_get_n_double("sk") == F.col("n")).alias("n_ok"),
        ((q50_est >= F.col("p43_raw")) & (q50_est <= F.col("p57_raw"))).alias(
            "q50_ok"
        ),
        ((q90_est >= F.col("p83_raw")) & (q90_est <= F.col("p97_raw"))).alias(
            "q90_ok"
        ),
    )


@register(
    "q_agg_weighted_percentile",
    oracle=f"""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS v,
             sum(l_quantity) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cw,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           {sql_r("min(CASE WHEN cw >= 0.5 * tw THEN v END)")} AS wp50,
           {sql_r("min(CASE WHEN cw >= 0.9 * tw THEN v END)")} AS wp90,
           CAST(count(*) AS BIGINT) AS n
    FROM w GROUP BY l_returnflag
    """,
    tier="P1",
    doc="EXACT weighted percentiles (quantity-weighted price p50/p90 "
    "per return flag) — the inventory/revenue-weighted distribution "
    "cut that plain percentile cannot express and Spark has no "
    "built-in for. Implemented as the canonical cumulative-weight "
    "selection: one window cumsum over (value, unique tiebreak), "
    "threshold at q*total, take the minimum qualifying value. "
    "Selection (never interpolation) keeps it engine-exact; the "
    "total-ordered tiebreak makes per-row cumulative weights "
    "identical on any engine or partitioning, and the fixture's "
    "integer-valued quantities sum exactly in doubles, so the "
    "threshold comparison cannot drift with aggregation order. One "
    "shuffle on the group key serves both windows and the final "
    "aggregate.",
)
def q_agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    wo = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum("l_quantity").over(wo).alias("cw"),
        F.sum("l_quantity").over(wt).alias("tw"),
    )
    return w.groupBy("l_returnflag").agg(
        r4(F.min(F.when(F.col("cw") >= 0.5 * F.col("tw"), F.col("v")))).alias(
            "wp50"
        ),
        r4(F.min(F.when(F.col("cw") >= 0.9 * F.col("tw"), F.col("v")))).alias(
            "wp90"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_pivot_multi",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) FILTER (l_linestatus = 'F') AS BIGINT) AS f_n,
           CAST(sum({sql_units('l_quantity', 2)})
                FILTER (l_linestatus = 'F') AS BIGINT)
             AS f_qty_units,
           CAST(count(*) FILTER (l_linestatus = 'O') AS BIGINT) AS o_n,
           CAST(sum({sql_units('l_quantity', 2)})
                FILTER (l_linestatus = 'O') AS BIGINT)
             AS o_qty_units
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tier="P2",
    doc="Multi-aggregate pivot — the n-values x m-measures column "
    "explosion (.pivot() with an EXPLICIT value list and several "
    "aggregates per cell) that completes the pivot matrix beside "
    "the single-measure conditional pivot and the SQL PIVOT clause. "
    "The explicit IN list matters at scale: implicit pivot runs an "
    "extra distinct-values job and yields data-dependent column "
    "order. One shuffle, map-side partials per (flag, status) cell; "
    "quantities summed in integer hundredth-units so every cell is "
    "exact at any scale.",
)
def q_agg_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(int_units("l_quantity", 2)).alias("qty_units"),
        )
    )
    return wide.select(
        "l_returnflag",
        F.col("F_n").alias("f_n"),
        F.col("F_qty_units").alias("f_qty_units"),
        F.col("O_n").alias("o_n"),
        F.col("O_qty_units").alias("o_qty_units"),
    )


_ENTROPY_TYPES = ("view", "click", "purchase", "signup", "error")


def _entropy_sql() -> str:
    counts = ", ".join(
        f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in _ENTROPY_TYPES
    )
    # fixed expression order: term(view) + term(click) + ... so the
    # float sum is bit-identical across engines
    terms = " + ".join(
        f"CASE WHEN n_{t} > 0 THEN n_{t} * ln(n_{t}) ELSE 0 END"
        for t in _ENTROPY_TYPES
    )
    return counts, terms


@register(
    "q_agg_entropy_profile",
    oracle=f"""
    WITH c AS (
      SELECT user_id, {_entropy_sql()[0]}, count(*) AS n
      FROM events GROUP BY user_id
    )
    SELECT user_id, n,
           {", ".join(f"n_{t}" for t in _ENTROPY_TYPES)},
           floor((ln(n) - ({_entropy_sql()[1]}) / n) * 10000 + 0.5) / 10000
             AS entropy
    FROM c
    """,
    tier="P2",
    doc="Behavioral-diversity profile: Shannon entropy of each user's "
    "event-type distribution (0 = does one thing, ln(5) = uniform "
    "mix) — a standard segmentation/anomaly feature. Entropy = "
    "ln(n) - (1/n)*SUM n_i*ln(n_i), computed from exact integer "
    "counts with the per-type terms written in a FIXED order, so "
    "the float expression is bit-identical across engines and "
    "hash-checks without tolerance. One conditional-aggregate pass; "
    "the exact counts ship alongside so the feature is auditable.",
)
def q_agg_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    c = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.count_if(F.col("event_type") == t).alias(f"n_{t}")
            for t in _ENTROPY_TYPES
        ],
    )
    terms = None
    for t in _ENTROPY_TYPES:
        nt = F.col(f"n_{t}")
        term = F.when(nt > 0, nt * F.log(nt.cast("double"))).otherwise(0.0)
        terms = term if terms is None else terms + term
    entropy = F.log(F.col("n").cast("double")) - terms / F.col("n")
    return c.select(
        "user_id",
        "n",
        *[f"n_{t}" for t in _ENTROPY_TYPES],
        _round_halfup(entropy, 4).alias("entropy"),
    )


@register(
    "q_agg_gini_concentration",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS k,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS units
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT seg, units,
             row_number() OVER (PARTITION BY seg ORDER BY units, k) AS i,
             count(*) OVER (PARTITION BY seg) AS n
      FROM spend
    )
    SELECT seg,
           CAST(max(n) AS BIGINT) AS n_customers,
           CAST(sum(units) AS BIGINT) AS total_units,
           floor(CAST(sum((2 * i - n - 1) * units) AS DOUBLE)
                 / (CAST(max(n) AS DOUBLE) * CAST(sum(units) AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS gini
    FROM ranked
    GROUP BY seg
    """,
    tier="P2",
    doc="Gini concentration index of customer spend per market "
    "segment — the revenue-concentration / inequality metric "
    "(0 = evenly spread, ->1 = one whale). Uses the rank formula "
    "G = SUM((2i - n - 1) * x_i) / (n * SUM x) over a TOTAL order "
    "(spend, custkey), with spend in integer hundredth-units: both "
    "big sums are exact int64 (headroom to ~1e18; beyond that, "
    "switch the numerator to DECIMAL or the pairwise mean-difference "
    "form), then one double divide — hash-exact. Plan: one "
    "custkey aggregate, broadcast segment join, one rank window and "
    "the final aggregate sharing the segment shuffle.",
)
def q_agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(int_units("o_totalprice", 2)).alias("units"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("k"), "units")
    )
    w = Window.partitionBy("seg").orderBy("units", "k")
    ranked = spend.select(
        "seg",
        "units",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("seg")).alias("n"),
    )
    num = F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("units"))
    return ranked.groupBy("seg").agg(
        F.max("n").alias("n_customers"),
        F.sum("units").alias("total_units"),
        _round_halfup(
            num.cast("double")
            / (F.max("n").cast("double") * F.sum("units").cast("double")),
            4,
        ).alias("gini"),
    )


@register(
    "q_agg_period_over_period",
    oracle="""
    WITH monthly AS (
      SELECT c_mktsegment AS segment,
             CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS m,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY segment, date_trunc('month', o_orderdate)
    )
    SELECT segment, m AS month_epoch, cents,
           lag(cents) OVER (PARTITION BY segment ORDER BY m) AS prev_cents,
           CASE WHEN lag(cents) OVER (PARTITION BY segment ORDER BY m)
                     IS NOT NULL
                THEN CAST(floor((cents - lag(cents) OVER (
                         PARTITION BY segment ORDER BY m))
                       * 10000.0 / lag(cents) OVER (
                         PARTITION BY segment ORDER BY m) + 0.5) AS BIGINT)
           END AS growth_bps
    FROM monthly
    """,
    tier="P1",
    doc="Period-over-period growth — the month-over-month revenue "
    "delta per segment every BI dashboard leads with: monthly exact-"
    "cent rollups, lag() along each segment's month series, and the "
    "growth rate in basis points as ONE divide of exact integers "
    "rounded half-up (a float percent would wobble in the last "
    "decimal). First month per segment emits NULL growth — absence "
    "of a prior period is data, not zero. Two shuffles (rollup, "
    "then segment-partitioned window over ~80 rows per segment); "
    "at 100 TB the rollup is the only real cost and the window "
    "rides its output.",
)
def q_agg_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("month", F.col("o_orderdate").cast("timestamp"))
            .cast("long")
            .alias("month_epoch"),
        )
        .agg(F.sum(int_units("o_totalprice", 2)).alias("cents"))
    )
    w = Window.partitionBy("segment").orderBy("month_epoch")
    prev = F.lag("cents").over(w)
    return monthly.select(
        "segment",
        "month_epoch",
        "cents",
        prev.alias("prev_cents"),
        F.when(
            prev.isNotNull(),
            F.floor(
                (F.col("cents") - prev) * F.lit(10000.0) / prev + F.lit(0.5)
            ).cast("long"),
        ).alias("growth_bps"),
    )


BLOOM_BITS = 4096
BLOOM_HASHES = 3


def _bloom_pos_sql(key: str, i: int) -> str:
    return (
        f"CAST('0x' || substr(md5('bf{i}-' || CAST({key} AS VARCHAR)),"
        f" 1, 12) AS BIGINT) % {BLOOM_BITS}"
    )


@register(
    "q_agg_bloom_membership",
    oracle=f"""
    WITH base AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 10 <> 0
    ),
    probes AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 10 = 0
    ),
    bits AS (
      SELECT DISTINCT pos FROM (
        SELECT {_bloom_pos_sql('o_custkey', 0)} AS pos FROM base
        UNION ALL SELECT {_bloom_pos_sql('o_custkey', 1)} FROM base
        UNION ALL SELECT {_bloom_pos_sql('o_custkey', 2)} FROM base
      )
    ),
    probe_pos AS (
      SELECT DISTINCT o_custkey, pos FROM (
        SELECT o_custkey, {_bloom_pos_sql('o_custkey', 0)} AS pos FROM probes
        UNION ALL SELECT o_custkey, {_bloom_pos_sql('o_custkey', 1)} FROM probes
        UNION ALL SELECT o_custkey, {_bloom_pos_sql('o_custkey', 2)} FROM probes
      )
    ),
    verdicts AS (
      SELECT pp.o_custkey,
             count(*) AS n_pos,
             count(b.pos) AS n_present,
             count(*) = count(b.pos) AS maybe,
             EXISTS (SELECT 1 FROM base ba
                     WHERE ba.o_custkey = pp.o_custkey) AS is_member
      FROM probe_pos pp LEFT JOIN bits b ON b.pos = pp.pos
      GROUP BY pp.o_custkey
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_base_keys,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
             AS n_maybe,
           CAST(sum(CASE WHEN NOT maybe THEN 1 ELSE 0 END) AS BIGINT)
             AS n_definitely_new,
           CAST(sum(CASE WHEN maybe AND NOT is_member THEN 1 ELSE 0 END)
             AS BIGINT) AS n_false_positives,
           CAST(sum(CASE WHEN NOT maybe AND is_member THEN 1 ELSE 0 END)
             AS BIGINT) AS n_false_negatives
    FROM verdicts
    """,
    tier="P1",
    doc="Bloom-filter membership — the runtime-filter primitive under "
    "Spark's own bloom-join pruning and every 'have we crawled this "
    f"key before' ingest gate, built exactly: a {BLOOM_BITS}-bit "
    f"filter over the base custkeys ({BLOOM_HASHES} md5-derived hash "
    "positions per key, the repo's integer-exact hash family), then "
    "every delta custkey probed — maybe iff ALL its positions are "
    "set. The emitted audit carries the filter's whole truth table: "
    "bit fill, maybe/definitely-new split, measured FALSE POSITIVES "
    "against exact membership, and the structurally-zero false "
    "negatives — so the hash check proves both the construction AND "
    "the bloom guarantee. Everything is bounded relational algebra: "
    "bit positions are (key, int) pairs, the 'filter' is a DISTINCT "
    "position table, probing is a left join on pos. At 100 TB the "
    "bit table broadcasts (4 KB) and the probe side never shuffles — "
    "exactly how a bloom runtime filter prunes a fact scan before an "
    "expensive join; the md5 family makes it reproducible on any "
    "engine, which rand()-seeded filters are not.",
)
def q_agg_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = o.where(F.col("o_orderkey") % 10 != 0).select("o_custkey").distinct()
    probes = (
        o.where(F.col("o_orderkey") % 10 == 0).select("o_custkey").distinct()
    )

    def pos(i: int):
        h = F.md5(
            F.concat(F.lit(f"bf{i}-"), F.col("o_custkey").cast("string"))
        )
        return F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % BLOOM_BITS

    def positions(df: DataFrame) -> DataFrame:
        return df.select(
            "o_custkey",
            F.explode(
                F.array(*[pos(i) for i in range(BLOOM_HASHES)])
            ).alias("pos"),
        ).distinct()

    bits = positions(base).select("pos").distinct()
    probe_pos = positions(probes)
    present = probe_pos.join(
        F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left"
    )
    member = probes.join(
        base.withColumn("m", F.lit(True)), "o_custkey", "left"
    ).select("o_custkey", F.coalesce("m", F.lit(False)).alias("is_member"))
    verdicts = (
        present.groupBy("o_custkey")
        .agg(
            (F.count(F.lit(1)) == F.sum(F.coalesce("hit", F.lit(0)))).alias(
                "maybe"
            )
        )
        .join(member, "o_custkey")
    )
    summary = verdicts.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("maybe"), 1).otherwise(0)).alias("n_maybe"),
        F.sum(F.when(~F.col("maybe"), 1).otherwise(0)).alias(
            "n_definitely_new"
        ),
        F.sum(
            F.when(F.col("maybe") & ~F.col("is_member"), 1).otherwise(0)
        ).alias("n_false_positives"),
        F.sum(
            F.when(~F.col("maybe") & F.col("is_member"), 1).otherwise(0)
        ).alias("n_false_negatives"),
    )
    counts = base.agg(F.count(F.lit(1)).alias("n_base_keys")).crossJoin(
        bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    )
    return counts.crossJoin(F.broadcast(summary)).select(
        "n_base_keys",
        "n_bits_set",
        "n_probes",
        "n_maybe",
        "n_definitely_new",
        "n_false_positives",
        "n_false_negatives",
    )


# Per-feature integer unit scales for the scaler fit. Chosen so the
# int64 SUM OF SQUARES stays far below 2^63 at any plausible scale:
# price in whole dollars (1e5 max -> sq 1e10; 1e8 rows -> 1e18), the
# small-domain rates at 1e4 units (1e3 max -> sq 1e6).
SCALER_FEATURES = [
    ("l_quantity", 1),
    ("l_extendedprice", 1),
    ("l_discount", 10_000),
    ("l_tax", 10_000),
]


@register(
    "q_ml_feature_scaler_fit",
    oracle="""
    WITH u AS (
      SELECT feature, units FROM (
        SELECT 'l_quantity' AS feature,
               CAST(floor(l_quantity * 1 + 0.5) AS BIGINT) AS units
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice',
               CAST(floor(l_extendedprice * 1 + 0.5) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount',
               CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_tax', CAST(floor(l_tax * 10000 + 0.5) AS BIGINT)
        FROM lineitem
      )
    )
    SELECT feature,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(units) AS BIGINT) AS min_units,
           CAST(max(units) AS BIGINT) AS max_units,
           CAST(sum(units) AS BIGINT) AS sum_units,
           CAST(sum(units * units) AS BIGINT) AS sum_sq_units,
           floor((CAST(sum(units) AS DOUBLE) / count(*)) * 1000000 + 0.5)
             / 1000000 AS mean_units,
           floor(sqrt(CAST(sum(units * units) AS DOUBLE) / count(*)
                      - (CAST(sum(units) AS DOUBLE) / count(*))
                        * (CAST(sum(units) AS DOUBLE) / count(*)))
                 * 1000000 + 0.5) / 1000000 AS std_units
    FROM u GROUP BY feature
    """,
    tier="P1",
    doc="Feature-scaler FIT — the standardization/min-max parameter "
    "table every training pipeline materializes before normalizing "
    "features (StandardScaler/MinMaxScaler fit, persisted as a tiny "
    "artifact the serving path reuses): per feature the count, "
    "extrema, exact first and second moments, mean and population "
    "std. Determinism recipe: each feature quantizes to a "
    "documented integer unit scale chosen so SUM(units²) stays in "
    "int64 headroom at 100 TB row counts (dollars for price, 1e-4 "
    "units for rates) — both moments are then exact "
    "order-independent integer sums, and mean/std are fixed IEEE "
    "chains (divide, multiply, sqrt) from those exact ints, never a "
    "float aggregation. The unpivot is a stack projection; one "
    "groupBy(feature) over 4n rows, map-side combined — a single "
    "pass whatever the table size, and the emitted table is "
    "KB-sized. Per-feature unit scales are part of the fitted "
    "artifact, exactly like a real scaler's.",
)
def q_ml_feature_scaler_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    stacked = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        F.floor(F.col(name) * scale + F.lit(0.5))
                        .cast("long")
                        .alias("units"),
                    )
                    for name, scale in SCALER_FEATURES
                ]
            )
        ).alias("s")
    ).select("s.feature", "s.units")
    n = F.count(F.lit(1))
    su = F.sum("units")
    sq = F.sum(F.col("units") * F.col("units"))
    mean = su.cast("double") / n
    return stacked.groupBy("feature").agg(
        n.alias("n"),
        F.min("units").alias("min_units"),
        F.max("units").alias("max_units"),
        su.alias("sum_units"),
        sq.alias("sum_sq_units"),
        (F.floor(mean * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000)).alias(
            "mean_units"
        ),
        (
            F.floor(
                F.sqrt(sq.cast("double") / n - mean * mean)
                * F.lit(1000000)
                + F.lit(0.5)
            )
            / F.lit(1000000)
        ).alias("std_units"),
    )


@register(
    "q_ml_quantile_binning",
    oracle="""
    WITH edges AS (
      SELECT percentile_disc(0.2) WITHIN GROUP (ORDER BY o_totalprice) AS e1,
             percentile_disc(0.4) WITHIN GROUP (ORDER BY o_totalprice) AS e2,
             percentile_disc(0.6) WITHIN GROUP (ORDER BY o_totalprice) AS e3,
             percentile_disc(0.8) WITHIN GROUP (ORDER BY o_totalprice) AS e4
      FROM orders
    ),
    binned AS (
      SELECT CASE WHEN o_totalprice <= e1 THEN 0
                  WHEN o_totalprice <= e2 THEN 1
                  WHEN o_totalprice <= e3 THEN 2
                  WHEN o_totalprice <= e4 THEN 3
                  ELSE 4 END AS bin,
             o_totalprice
      FROM orders CROSS JOIN edges
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_orders,
           floor(min(o_totalprice) * 100 + 0.5) / 100 AS lo,
           floor(max(o_totalprice) * 100 + 0.5) / 100 AS hi
    FROM binned GROUP BY bin
    """,
    tier="P1",
    doc="Equal-frequency (quantile) binning FIT + APPLY — the "
    "QuantileDiscretizer artifact: 5 bins of o_totalprice with edges "
    "at the exact 20/40/60/80th percentile_disc ORDER STATISTICS. "
    "Discrete percentiles are actual data values (no interpolation "
    "arithmetic), so the edges are bit-identical across engines by "
    "construction, the bin assignment is pure comparison, and the "
    "per-bin counts + [lo, hi] ranges hash-check exactly — the "
    "contrast with interpolated/approximate percentiles (see "
    "q_agg_percentile / q_agg_approx_percentile) is deliberate. "
    "Plan: one percentile aggregate (Spark sorts within the "
    "aggregate buffer), the 1-row edge table broadcast into a "
    "projection, one groupBy(bin). At 100 TB the fit step switches "
    "to approx_percentile with documented error (the KLL/sketch "
    "family) while the apply stays identical — the artifact "
    "contract (edges table) does not change.",
)
def q_ml_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    edges = o.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias(f"e{i}")
            for i, p in enumerate([0.2, 0.4, 0.6, 0.8], start=1)
        ]
    )
    binned = o.crossJoin(F.broadcast(edges)).select(
        F.when(F.col("o_totalprice") <= F.col("e1"), 0)
        .when(F.col("o_totalprice") <= F.col("e2"), 1)
        .when(F.col("o_totalprice") <= F.col("e3"), 2)
        .when(F.col("o_totalprice") <= F.col("e4"), 3)
        .otherwise(4)
        .cast("long")
        .alias("bin"),
        "o_totalprice",
    )
    r2 = lambda c: F.floor(c * 100 + F.lit(0.5)) / 100  # noqa: E731
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_orders"),
        r2(F.min("o_totalprice")).alias("lo"),
        r2(F.max("o_totalprice")).alias("hi"),
    )


@register(
    "q_ml_auc_rank",
    oracle="""
    WITH u AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT score,
             CAST(sum(pos) AS BIGINT) AS pos_s,
             CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
      FROM u GROUP BY score
    ),
    c AS (
      SELECT score, pos_s, neg_s,
             CAST(sum(neg_s) OVER (ORDER BY score
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - neg_s AS BIGINT)
               AS neg_before
      FROM h
    )
    SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
           CAST(sum(neg_s) AS BIGINT) AS n_neg,
           CAST(sum(pos_s * (2 * neg_before + neg_s)) AS BIGINT) AS u2,
           floor(CAST(sum(pos_s * (2 * neg_before + neg_s)) AS DOUBLE)
                 / (2.0 * sum(pos_s) * sum(neg_s)) * 1000000 + 0.5)
             / 1000000 AS auc
    FROM c
    """,
    tier="P1",
    doc="Exact ROC-AUC via the Mann-Whitney rank-sum identity — the "
    "model-eval aggregate every training pipeline runs on scored "
    "holdouts ('does n_chars separate lang=en docs?'). NOT computed "
    "by ranking rows: the score column is first collapsed to a "
    "per-distinct-score histogram of (positive, negative) counts — "
    "a plain map-side-combined groupBy — and AUC is recovered from "
    "the histogram's prefix sums: 2U = sum_s pos_s*(2*neg_before_s "
    "+ neg_s) (the tie term neg_s gives the standard 1/2 credit "
    "without any fractional arithmetic). All counts are exact "
    "int64; the only float op is the final single divide, an "
    "identical IEEE expression on both engines. At 100 TB the "
    "window runs over |distinct scores| rows (bounded, e.g. 313 "
    "here), not |rows| — the global sort a naive rank-based AUC "
    "needs never happens.",
)
def q_ml_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("pos"),
    )
    h = u.groupBy("score").agg(
        F.sum("pos").alias("pos_s"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("neg_s"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    c = h.withColumn("neg_before", F.sum("neg_s").over(w) - F.col("neg_s"))
    u2 = F.sum(
        F.col("pos_s") * (F.lit(2) * F.col("neg_before") + F.col("neg_s"))
    )
    n_pos = F.sum("pos_s")
    n_neg = F.sum("neg_s")
    return c.agg(
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        u2.alias("u2"),
        F.floor(
            u2.cast("double")
            / (F.lit(2.0) * n_pos * n_neg)
            * F.lit(1000000)
            + F.lit(0.5)
        ).cast("double").alias("_f"),
    ).select(
        "n_pos",
        "n_neg",
        "u2",
        (F.col("_f") / F.lit(1000000)).alias("auc"),
    )


@register(
    "q_ml_target_encoding",
    oracle="""
    WITH u AS (
      SELECT o_orderpriority AS category,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    cat AS (
      SELECT category,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(min(cents) AS BIGINT) AS min_x,
             CAST(max(cents) AS BIGINT) AS max_x
      FROM u GROUP BY category
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(cents) AS BIGINT) AS s_g
      FROM u
    )
    SELECT category, n, sum_cents,
           CASE WHEN n > 1 THEN
             floor((CAST(sum_cents - max_x AS DOUBLE) / (n - 1))
                   * 10000 + 0.5) / 10000
           ELSE NULL END AS loo_min_cents,
           CASE WHEN n > 1 THEN
             floor((CAST(sum_cents - min_x AS DOUBLE) / (n - 1))
                   * 10000 + 0.5) / 10000
           ELSE NULL END AS loo_max_cents,
           floor(((CAST(sum_cents AS DOUBLE)
                   + 100.0 * (CAST(s_g AS DOUBLE) / n_g))
                  / (n + 100))
                 * 10000 + 0.5) / 10000 AS enc_smooth_cents
    FROM cat CROSS JOIN g
    """,
    tier="P1",
    doc="Target encoding FIT — the categorical-feature encoder table "
    "(category -> smoothed target mean) a training pipeline "
    "materializes once and joins onto both train and serve paths. "
    "Per category: exact integer-cents target mass, the smoothed "
    "encoding (sum + m*global_mean)/(n + m) with prior weight "
    "m=100, and the leave-one-out envelope [min,max] of the per-row "
    "LOO encodings (S - x_i)/(n-1) — computed WITHOUT a per-row "
    "pass, since the extreme LOO values are reached at the extreme "
    "targets (monotone in x_i), so min/max aggregates suffice. The "
    "mean of the LOO encodings is algebraically S/n (plain mean), "
    "which is why the envelope, not the mean, is the useful "
    "leakage-audit output. A singleton category (n=1) has no "
    "leave-one-out at all — its LOO columns are a documented NULL "
    "on both engines, never (S-x)/0. All inputs to the three IEEE "
    "divides are exact int64 sums; one groupBy plus a broadcast "
    "1-row global — the encoder table stays |categories|-sized at "
    "any data scale.",
)
def q_ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    u = o.select(
        F.col("o_orderpriority").alias("category"),
        int_units("o_totalprice", 2).alias("cents"),
    )
    cat = u.groupBy("category").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.min("cents").alias("min_x"),
        F.max("cents").alias("max_x"),
    )
    g = u.agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("cents").alias("s_g")
    )
    return cat.crossJoin(F.broadcast(g)).select(
        "category",
        "n",
        "sum_cents",
        # A 1-row category makes the LOO divisor n-1 = 0: emit a
        # documented NULL (no leave-one-out exists for a singleton)
        # instead of x/0, where ANSI Spark and DuckDB diverge.
        # Mirrored by the CASE guards in the oracle.
        F.when(
            F.col("n") > 1,
            r4(
                (F.col("sum_cents") - F.col("max_x")).cast("double")
                / (F.col("n") - F.lit(1))
            ),
        ).alias("loo_min_cents"),
        F.when(
            F.col("n") > 1,
            r4(
                (F.col("sum_cents") - F.col("min_x")).cast("double")
                / (F.col("n") - F.lit(1))
            ),
        ).alias("loo_max_cents"),
        r4(
            (
                F.col("sum_cents").cast("double")
                + F.lit(100.0) * (F.col("s_g").cast("double") / F.col("n_g"))
            )
            / (F.col("n") + F.lit(100))
        ).alias("enc_smooth_cents"),
    )


@register(
    "q_ml_confusion_threshold",
    oracle="""
    WITH u AS (
      SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pred,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS actual
      FROM documents
    )
    SELECT CAST(sum(pred * actual) AS BIGINT) AS tp,
           CAST(sum(pred * (1 - actual)) AS BIGINT) AS fp,
           CAST(sum((1 - pred) * actual) AS BIGINT) AS fn,
           CAST(sum((1 - pred) * (1 - actual)) AS BIGINT) AS tn,
           floor(CAST(sum(pred * actual) + sum((1 - pred) * (1 - actual))
                      AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
             AS accuracy,
           floor(CAST(sum(pred * actual) AS DOUBLE)
                 / (sum(pred * actual) + sum(pred * (1 - actual)))
                 * 1000000 + 0.5) / 1000000 AS precision_,
           floor(CAST(sum(pred * actual) AS DOUBLE)
                 / (sum(pred * actual) + sum((1 - pred) * actual))
                 * 1000000 + 0.5) / 1000000 AS recall_,
           floor(CAST(2 * sum(pred * actual) AS DOUBLE)
                 / (2 * sum(pred * actual) + sum(pred * (1 - actual))
                    + sum((1 - pred) * actual))
                 * 1000000 + 0.5) / 1000000 AS f1
    FROM u
    """,
    tier="P1",
    doc="Classifier confusion matrix + threshold metrics at a fixed "
    "operating point (n_chars >= 300 predicts lang=en) — the "
    "eval-harness companion to q_ml_auc_rank: TP/FP/FN/TN exact "
    "int64 counts in ONE pass (indicator products, no joins), and "
    "accuracy/precision/recall/F1 each as a SINGLE IEEE divide of "
    "exact integers (F1 via 2tp/(2tp+fp+fn) — never the "
    "2PR/(P+R) chain of already-rounded ratios). precision_/"
    "recall_ trailing underscore avoids reserved-word collisions. "
    "Map-side-combined global aggregate; constant output at any "
    "scale.",
)
def q_ml_confusion_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).cast("long")
        .alias("pred"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long")
        .alias("actual"),
    )
    tp = F.sum(F.col("pred") * F.col("actual"))
    fp = F.sum(F.col("pred") * (F.lit(1) - F.col("actual")))
    fn = F.sum((F.lit(1) - F.col("pred")) * F.col("actual"))
    tn = F.sum((F.lit(1) - F.col("pred")) * (F.lit(1) - F.col("actual")))
    n = F.count(F.lit(1))

    def r6d(x):
        return F.floor(x * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000)

    return u.agg(
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        tn.alias("tn"),
        r6d((tp + tn).cast("double") / n).alias("accuracy"),
        r6d(tp.cast("double") / (tp + fp)).alias("precision_"),
        r6d(tp.cast("double") / (tp + fn)).alias("recall_"),
        r6d((F.lit(2) * tp).cast("double") / (F.lit(2) * tp + fp + fn))
        .alias("f1"),
    )


@register(
    "q_ml_calibration_bins",
    oracle="""
    WITH g AS (
      SELECT CAST(min(n_chars) AS BIGINT) AS mn,
             CAST(max(n_chars) AS BIGINT) AS mx
      FROM documents
    ),
    u AS (
      SELECT (CAST(n_chars AS BIGINT) - mn) * 10 // (mx - mn + 1) AS bin,
             CAST(n_chars AS BIGINT) AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents CROSS JOIN g
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(score) AS BIGINT) AS sum_score,
           floor(CAST(sum(pos) AS DOUBLE) / count(*) * 1000000 + 0.5)
             / 1000000 AS pos_rate,
           floor(CAST(sum(score) AS DOUBLE) / count(*) * 10000 + 0.5)
             / 10000 AS mean_score
    FROM u GROUP BY bin ORDER BY bin
    """,
    tier="P1",
    doc="Calibration / reliability table — the per-bin (observed "
    "positive rate vs mean score) rollup behind a reliability "
    "diagram and ECE computation, over 10 fixed-width score bins "
    "spanning the observed [min,max]. Determinism recipe: the bin "
    "id is EXACT integer arithmetic (score-mn)*10 div (mx-mn+1) — "
    "Spark div == DuckDB // (both truncate; operands nonnegative), "
    "so no float binning boundary exists to disagree on; per-bin "
    "rate and mean are single IEEE divides of exact int64 sums. "
    "Plan: broadcast 1-row [min,max] global, then one map-side-"
    "combined 10-group rollup — two passes total at any scale.",
)
def q_ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    g = d.agg(
        F.min("n_chars").cast("long").alias("mn"),
        F.max("n_chars").cast("long").alias("mx"),
    )
    u = d.crossJoin(F.broadcast(g)).select(
        F.expr("(CAST(n_chars AS BIGINT) - mn) * 10 div (mx - mn + 1)")
        .alias("bin"),
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long")
        .alias("pos"),
    )
    return (
        u.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pos").alias("n_pos"),
            F.sum("score").alias("sum_score"),
            (
                F.floor(
                    F.sum("pos").cast("double")
                    / F.count(F.lit(1))
                    * F.lit(1000000)
                    + F.lit(0.5)
                )
                / F.lit(1000000)
            ).alias("pos_rate"),
            (
                F.floor(
                    F.sum("score").cast("double")
                    / F.count(F.lit(1))
                    * F.lit(10000)
                    + F.lit(0.5)
                )
                / F.lit(10000)
            ).alias("mean_score"),
        )
        .orderBy("bin")
    )


@register(
    "q_agg_higher_moments",
    oracle="""
    WITH u AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
      FROM lineitem
    ),
    m AS (
      SELECT flag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q) AS BIGINT) AS s1,
             CAST(sum(q * q) AS BIGINT) AS s2,
             CAST(sum(q * q * q) AS BIGINT) AS s3,
             CAST(sum(q * q * q * q) AS BIGINT) AS s4
      FROM u GROUP BY flag
    )
    SELECT flag, n, s1, s2, s3, s4,
           floor((CAST(s3 AS DOUBLE) / n
                  - 3.0 * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s2 AS DOUBLE) / n)
                  + 2.0 * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n)
                       * (CAST(s1 AS DOUBLE) / n))
                    * sqrt(CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                             * (CAST(s1 AS DOUBLE) / n)))
                 * 1000000 + 0.5) / 1000000 AS skewness,
           floor(((CAST(s4 AS DOUBLE) / n
                   - 4.0 * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s3 AS DOUBLE) / n)
                   + 6.0 * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s2 AS DOUBLE) / n)
                   - 3.0 * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n))
                  / ((CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n))
                     * (CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n)
                          * (CAST(s1 AS DOUBLE) / n)))
                  - 3.0)
                 * 1000000 + 0.5) / 1000000 AS excess_kurtosis
    FROM m ORDER BY flag
    """,
    tier="P1",
    doc="Higher central moments — population skewness (g1) and excess "
    "kurtosis (g2) per returnflag, the distribution-shape QC a "
    "feature pipeline runs before assuming normality. Determinism "
    "recipe: l_quantity is integer-valued, so the four raw power "
    "sums s1..s4 are EXACT int64 (q<=50 -> q^4<=6.25e6; 6e9 rows "
    "of headroom), and g1/g2 are fixed IEEE chains (the expanded "
    "central-moment identities m3 = E[x^3]-3*E[x]*E[x^2]+2*E[x]^3 "
    "etc.) evaluated identically on both engines from those exact "
    "integers — never a float^3 aggregation whose partial order "
    "could drift. One map-side-combined groupBy; Spark's builtin "
    "skewness()/kurtosis() use streaming float central moments "
    "(order-dependent in the last ULPs), which is exactly why the "
    "exact-power-sum form is the cross-engine-reproducible one.",
)
def q_agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    u = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("q"),
    )
    q = F.col("q")
    m = u.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    n = F.col("n")
    e1 = F.col("s1").cast("double") / n
    e2 = F.col("s2").cast("double") / n
    e3 = F.col("s3").cast("double") / n
    e4 = F.col("s4").cast("double") / n
    var = e2 - e1 * e1
    # var*sqrt(var), not pow(var,1.5): sqrt is correctly rounded by
    # IEEE mandate on both engines; pow is not guaranteed to be
    skew = (
        e3 - F.lit(3.0) * e1 * e2 + F.lit(2.0) * e1 * e1 * e1
    ) / (var * F.sqrt(var))
    kurt = (
        e4
        - F.lit(4.0) * e1 * e3
        + F.lit(6.0) * e1 * e1 * e2
        - F.lit(3.0) * e1 * e1 * e1 * e1
    ) / (var * var) - F.lit(3.0)

    def r6d(x):
        return F.floor(x * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000)

    return m.select(
        "flag", "n", "s1", "s2", "s3", "s4",
        r6d(skew).alias("skewness"),
        r6d(kurt).alias("excess_kurtosis"),
    ).orderBy("flag")


@register(
    "q_ml_gini_stump",
    oracle="""
    WITH u AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT score, CAST(sum(pos) AS BIGINT) AS pos_s,
             CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
      FROM u GROUP BY score
    ),
    c AS (
      SELECT score,
             CAST(sum(pos_s) OVER w AS BIGINT) AS pl,
             CAST(sum(neg_s) OVER w AS BIGINT) AS nl
      FROM h
      WINDOW w AS (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    tot AS (
      SELECT CAST(sum(pos_s) AS BIGINT) AS p,
             CAST(sum(neg_s) AS BIGINT) AS n
      FROM h
    ),
    cand AS (
      SELECT score AS threshold,
             pl + nl AS tl, (p + n) - (pl + nl) AS tr,
             pl, nl, p - pl AS pr, n - nl AS nr, p, n
      FROM c CROSS JOIN tot
      WHERE (p + n) - (pl + nl) > 0
    ),
    scored AS (
      SELECT threshold, tl, tr, pl, pr, p, n,
             ((tl - CAST(pl * pl + nl * nl AS DOUBLE) / tl)
              + (tr - CAST(pr * pr + nr * nr AS DOUBLE) / tr))
             / (p + n) AS split_raw
      FROM cand
    )
    SELECT CAST(threshold AS BIGINT) AS threshold,
           CAST(tl AS BIGINT) AS n_left,
           CAST(tr AS BIGINT) AS n_right,
           CAST(pl AS BIGINT) AS pos_left,
           CAST(pr AS BIGINT) AS pos_right,
           floor((1.0 - CAST(p * p + n * n AS DOUBLE)
                        / (CAST(p + n AS DOUBLE) * (p + n)))
                 * 1000000 + 0.5) / 1000000 AS gini_parent,
           floor(split_raw * 1000000 + 0.5) / 1000000 AS gini_split,
           floor(((1.0 - CAST(p * p + n * n AS DOUBLE)
                         / (CAST(p + n AS DOUBLE) * (p + n)))
                  - split_raw) * 1000000 + 0.5) / 1000000 AS gain
    FROM scored
    ORDER BY CAST(floor(split_raw * 1000000000 + 0.5) AS BIGINT),
             threshold
    LIMIT 1
    """,
    tier="P1",
    doc="Decision-stump learning — the best Gini split of a numeric "
    "feature against a binary target, the inner loop of every "
    "tree/GBDT learner and the strongest single-feature baseline "
    "an eval harness reports: every distinct score is a candidate "
    "threshold, scored by weighted Gini impurity computed from the "
    "SAME per-score histogram + prefix sums that power "
    "q_ml_auc_rank (counts exact int64; pl^2 fits comfortably to "
    "~3e9 positives — beyond that take the squares in double, "
    "documented not silent). The argmin is made cross-engine "
    "deterministic by sorting on the 1e-9-quantized split score "
    "with the threshold as tiebreak — never a raw-double "
    "total order. Plan: one map-side-combined groupBy at "
    "|distinct scores| cardinality, a window over that bounded "
    "histogram, TakeOrdered(1) — the full feature scan happens "
    "exactly once regardless of candidate count.",
)
def q_ml_gini_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long")
        .alias("pos"),
    )
    h = u.groupBy("score").agg(
        F.sum("pos").alias("pos_s"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("neg_s"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    c = h.select(
        "score",
        F.sum("pos_s").over(w).alias("pl"),
        F.sum("neg_s").over(w).alias("nl"),
    )
    tot = h.agg(F.sum("pos_s").alias("p"), F.sum("neg_s").alias("n"))
    cand = (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.col("score").alias("threshold"),
            (F.col("pl") + F.col("nl")).alias("tl"),
            (F.col("p") + F.col("n") - F.col("pl") - F.col("nl")).alias("tr"),
            "pl",
            "nl",
            (F.col("p") - F.col("pl")).alias("pr"),
            (F.col("n") - F.col("nl")).alias("nr"),
            "p",
            "n",
        )
        .where(F.col("tr") > 0)
    )
    split_raw = (
        (
            F.col("tl")
            - (F.col("pl") * F.col("pl") + F.col("nl") * F.col("nl"))
            .cast("double")
            / F.col("tl")
        )
        + (
            F.col("tr")
            - (F.col("pr") * F.col("pr") + F.col("nr") * F.col("nr"))
            .cast("double")
            / F.col("tr")
        )
    ) / (F.col("p") + F.col("n"))
    parent = F.lit(1.0) - (
        F.col("p") * F.col("p") + F.col("n") * F.col("n")
    ).cast("double") / ((F.col("p") + F.col("n")).cast("double") * (F.col("p") + F.col("n")))

    def r6d(x):
        return F.floor(x * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000)

    return (
        cand.select(
            "threshold",
            F.col("tl").alias("n_left"),
            F.col("tr").alias("n_right"),
            F.col("pl").alias("pos_left"),
            F.col("pr").alias("pos_right"),
            r6d(parent).alias("gini_parent"),
            r6d(split_raw).alias("gini_split"),
            r6d(parent - split_raw).alias("gain"),
            F.floor(split_raw * F.lit(1000000000) + F.lit(0.5))
            .cast("long")
            .alias("_key"),
        )
        .orderBy(F.asc("_key"), F.asc("threshold"))
        .limit(1)
        .drop("_key")
    )


@register(
    "q_ml_pr_curve_points",
    oracle="""
    WITH u AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT score, CAST(sum(pos) AS BIGINT) AS pos_s,
             CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
      FROM u GROUP BY score
    ),
    c AS (
      SELECT score,
             CAST(sum(pos_s) OVER w AS BIGINT) AS pge,
             CAST(sum(neg_s) OVER w AS BIGINT) AS nge
      FROM h
      WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW)
    ),
    tot AS (SELECT CAST(sum(pos_s) AS BIGINT) AS p FROM h)
    SELECT CAST(score AS BIGINT) AS threshold,
           pge AS tp, nge AS fp,
           CAST(p - pge AS BIGINT) AS fn,
           floor(CAST(pge AS DOUBLE) / (pge + nge) * 1000000 + 0.5)
             / 1000000 AS precision_,
           floor(CAST(pge AS DOUBLE) / p * 1000000 + 0.5)
             / 1000000 AS recall_
    FROM c CROSS JOIN tot
    ORDER BY threshold
    """,
    tier="P1",
    doc="Full precision-recall curve — one (precision, recall) point "
    "per distinct threshold 'predict positive iff score >= t', the "
    "operating-characteristic table behind threshold selection "
    "(q_ml_confusion_threshold freezes ONE of these rows). The "
    "descending prefix sums over the per-score histogram give "
    "every point's exact int64 TP/FP/FN in a single window pass — "
    "|distinct scores| rows of output however many examples, "
    "precision/recall each one IEEE divide. Same "
    "sufficient-statistic discipline as the AUC: the curve costs "
    "one groupBy + one bounded window, never a per-threshold "
    "re-scan (the naive form is |thresholds| passes over the "
    "table).",
)
def q_ml_pr_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long")
        .alias("pos"),
    )
    h = u.groupBy("score").agg(
        F.sum("pos").alias("pos_s"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("neg_s"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = h.select(
        "score",
        F.sum("pos_s").over(w).alias("pge"),
        F.sum("neg_s").over(w).alias("nge"),
    )
    tot = h.agg(F.sum("pos_s").alias("p"))

    def r6d(x):
        return F.floor(x * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000)

    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.col("score").alias("threshold"),
            F.col("pge").alias("tp"),
            F.col("nge").alias("fp"),
            (F.col("p") - F.col("pge")).alias("fn"),
            r6d(F.col("pge").cast("double") / (F.col("pge") + F.col("nge")))
            .alias("precision_"),
            r6d(F.col("pge").cast("double") / F.col("p")).alias("recall_"),
        )
        .orderBy("threshold")
    )


@register(
    "q_ml_ks_statistic",
    oracle="""
    WITH u AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT score, CAST(sum(pos) AS BIGINT) AS pos_s,
             CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
      FROM u GROUP BY score
    ),
    c AS (
      SELECT score,
             CAST(sum(pos_s) OVER w AS BIGINT) AS pl,
             CAST(sum(neg_s) OVER w AS BIGINT) AS nl
      FROM h
      WINDOW w AS (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    tot AS (
      SELECT CAST(sum(pos_s) AS BIGINT) AS p,
             CAST(sum(neg_s) AS BIGINT) AS n
      FROM h
    )
    SELECT CAST(score AS BIGINT) AS threshold,
           CAST(abs(pl * n - nl * p) AS BIGINT) AS ks_num,
           p AS n_pos, n AS n_neg,
           floor(CAST(abs(pl * n - nl * p) AS DOUBLE) / (p * n)
                 * 1000000 + 0.5) / 1000000 AS ks
    FROM c CROSS JOIN tot
    ORDER BY CAST(abs(pl * n - nl * p) AS BIGINT) DESC, threshold
    LIMIT 1
    """,
    tier="P1",
    doc="Kolmogorov-Smirnov separation statistic — max over thresholds "
    "of |F_pos(t) - F_neg(t)|, the credit-scoring/model-separation "
    "metric reported beside AUC. The CDF difference is kept as the "
    "EXACT integer cross-product |pl*n - nl*p| (common denominator "
    "p*n), so the argmax over thresholds is a pure int64 ordering "
    "with threshold tiebreak — no float enters until the single "
    "final divide. Same bounded-histogram plan as its siblings: "
    "one groupBy at |distinct scores|, one prefix window, "
    "TakeOrdered(1). int64 headroom: pl*n needs pos*neg counts "
    "below ~3e9 each; beyond that scale the divide moves inside "
    "(documented, not silent).",
)
def q_ml_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long")
        .alias("pos"),
    )
    h = u.groupBy("score").agg(
        F.sum("pos").alias("pos_s"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("neg_s"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    c = h.select(
        "score",
        F.sum("pos_s").over(w).alias("pl"),
        F.sum("neg_s").over(w).alias("nl"),
    )
    tot = h.agg(F.sum("pos_s").alias("p"), F.sum("neg_s").alias("n"))
    ks_num = F.abs(
        F.col("pl") * F.col("n") - F.col("nl") * F.col("p")
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.col("score").alias("threshold"),
            ks_num.alias("ks_num"),
            F.col("p").alias("n_pos"),
            F.col("n").alias("n_neg"),
            (
                F.floor(
                    ks_num.cast("double")
                    / (F.col("p") * F.col("n"))
                    * F.lit(1000000)
                    + F.lit(0.5)
                )
                / F.lit(1000000)
            ).alias("ks"),
        )
        .orderBy(F.desc("ks_num"), F.asc("threshold"))
        .limit(1)
    )


@register(
    "q_ml_lift_gains",
    oracle="""
    WITH u AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT score, CAST(count(*) AS BIGINT) AS n_s,
             CAST(sum(pos) AS BIGINT) AS pos_s
      FROM u GROUP BY score
    ),
    c AS (
      SELECT score, n_s, pos_s,
             CAST(sum(n_s) OVER w AS BIGINT) AS cum_n,
             CAST(sum(pos_s) OVER w AS BIGINT) AS cum_pos
      FROM h
      WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW)
    ),
    tot AS (
      SELECT CAST(sum(n_s) AS BIGINT) AS n_g,
             CAST(sum(pos_s) AS BIGINT) AS p_g
      FROM h
    ),
    dec AS (
      SELECT (cum_n - 1) * 10 // n_g AS decile,
             n_s, pos_s, cum_n, cum_pos, n_g, p_g
      FROM c CROSS JOIN tot
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(sum(n_s) AS BIGINT) AS n_rows,
           CAST(sum(pos_s) AS BIGINT) AS n_pos,
           CAST(max(cum_n) AS BIGINT) AS cum_rows,
           CAST(max(cum_pos) AS BIGINT) AS cum_pos,
           floor(CAST(max(cum_pos) AS DOUBLE) / max(p_g)
                 * 1000000 + 0.5) / 1000000 AS gain,
           floor((CAST(max(cum_pos) AS DOUBLE) / max(cum_n))
                 / (CAST(max(p_g) AS DOUBLE) / max(n_g))
                 * 1000000 + 0.5) / 1000000 AS lift
    FROM dec GROUP BY decile ORDER BY decile
    """,
    tier="P1",
    doc="Cumulative gains / lift table — the campaign-targeting "
    "report ('contact the top-k-scored decile, capture what share "
    "of positives?') over score-descending deciles: each distinct "
    "score group lands in the decile where its cumulative row "
    "range ENDS ((cum_n-1)*10 div N — exact integer arithmetic, "
    "whole tie-groups never split, Spark div == DuckDB //), then "
    "per decile exact counts, the cumulative capture rate (gain) "
    "and lift vs the base rate, each one IEEE chain from int64 "
    "sums. Same bounded-histogram plan as the PR curve: one "
    "groupBy at |distinct scores|, one prefix window, a 10-group "
    "rollup.",
)
def q_ml_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long")
        .alias("pos"),
    )
    h = u.groupBy("score").agg(
        F.count(F.lit(1)).alias("n_s"), F.sum("pos").alias("pos_s")
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = h.select(
        "score",
        "n_s",
        "pos_s",
        F.sum("n_s").over(w).alias("cum_n"),
        F.sum("pos_s").over(w).alias("cum_pos"),
    )
    tot = h.agg(F.sum("n_s").alias("n_g"), F.sum("pos_s").alias("p_g"))
    dec = c.crossJoin(F.broadcast(tot)).select(
        F.expr("(cum_n - 1) * 10 div n_g").alias("decile"),
        "n_s", "pos_s", "cum_n", "cum_pos", "n_g", "p_g",
    )

    def r6d(x):
        return F.floor(x * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000)

    return (
        dec.groupBy("decile")
        .agg(
            F.sum("n_s").alias("n_rows"),
            F.sum("pos_s").alias("n_pos"),
            F.max("cum_n").alias("cum_rows"),
            F.max("cum_pos").alias("cum_pos"),
            r6d(
                F.max("cum_pos").cast("double") / F.max("p_g")
            ).alias("gain"),
            r6d(
                (F.max("cum_pos").cast("double") / F.max("cum_n"))
                / (F.max("p_g").cast("double") / F.max("n_g"))
            ).alias("lift"),
        )
        .orderBy("decile")
    )


@register(
    "q_stat_spearman",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT hr,
             CAST(2 * rank() OVER (ORDER BY x)
                  + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx2,
             CAST(2 * rank() OVER (ORDER BY y)
                  + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry2
      FROM b
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(rx2 * ry2) AS BIGINT) AS sxy2,
           CAST(sum(rx2 * rx2) AS BIGINT) AS sxx2,
           CAST(sum(ry2 * ry2) AS BIGINT) AS syy2,
           floor((CAST(count(*) * sum(rx2 * ry2)
                       - sum(rx2) * sum(ry2) AS DOUBLE)
                  / sqrt(CAST(count(*) * sum(rx2 * rx2)
                              - sum(rx2) * sum(rx2) AS DOUBLE)
                         * CAST(count(*) * sum(ry2 * ry2)
                                - sum(ry2) * sum(ry2) AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000 AS spearman_rho
    FROM r
    """,
    tier="P1",
    doc="Spearman rank correlation between hourly event volume and "
    "hourly value mass — the monotone-association test (robust to "
    "outliers and nonlinearity, unlike Pearson on raw values) a "
    "metrics pipeline runs between activity and revenue series. "
    "Determinism recipe: rho = Pearson over AVERAGE ranks with "
    "tie correction, and 2*avg_rank = 2*min_rank + tie_count - 1 "
    "keeps every rank an exact INTEGER (the q_ml_auc_rank tie "
    "trick) — the doubled scale cancels in the correlation, so "
    "all five sums are exact int64 and the only float ops are the "
    "final product-moment divide and one sqrt (double multiply "
    "inside sqrt: the int64 products would overflow, documented). "
    "Plan: one map-side hourly rollup over raw events, then ranks "
    "+ moments over the |hours|-bounded series.",
)
def q_stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    b = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(
            F.floor(F.col("value") * F.lit(1000000) + F.lit(0.5)).cast("long")
        ).alias("y"),
    )
    r = b.select(
        (
            F.lit(2) * F.rank().over(Window.orderBy("x"))
            + F.count(F.lit(1)).over(Window.partitionBy("x"))
            - F.lit(1)
        )
        .cast("long")
        .alias("rx2"),
        (
            F.lit(2) * F.rank().over(Window.orderBy("y"))
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - F.lit(1)
        )
        .cast("long")
        .alias("ry2"),
    )
    n = F.count(F.lit(1))
    sx, sy = F.sum("rx2"), F.sum("ry2")
    sxy = F.sum(F.col("rx2") * F.col("ry2"))
    sxx = F.sum(F.col("rx2") * F.col("rx2"))
    syy = F.sum(F.col("ry2") * F.col("ry2"))
    return r.agg(
        n.alias("n"),
        sxy.alias("sxy2"),
        sxx.alias("sxx2"),
        syy.alias("syy2"),
        (
            F.floor(
                (n * sxy - sx * sy).cast("double")
                / F.sqrt(
                    (n * sxx - sx * sx).cast("double")
                    * (n * syy - sy * sy).cast("double")
                )
                * F.lit(1000000)
                + F.lit(0.5)
            )
            / F.lit(1000000)
        ).alias("spearman_rho"),
    )


@register(
    "q_stat_welch_ttest",
    oracle="""
    WITH u AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
             CAST(n_chars AS BIGINT) AS x
      FROM documents
    ),
    m AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2
      FROM u GROUP BY grp
    ),
    w AS (
      SELECT max(CASE WHEN grp = 1 THEN n END) AS n1,
             max(CASE WHEN grp = 1 THEN s1 END) AS sa1,
             max(CASE WHEN grp = 1 THEN s2 END) AS sa2,
             max(CASE WHEN grp = 0 THEN n END) AS n0,
             max(CASE WHEN grp = 0 THEN s1 END) AS sb1,
             max(CASE WHEN grp = 0 THEN s2 END) AS sb2
      FROM m
    )
    SELECT CAST(n1 AS BIGINT) AS n_en,
           CAST(n0 AS BIGINT) AS n_other,
           floor((CAST(sa1 AS DOUBLE) / n1) * 10000 + 0.5) / 10000
             AS mean_en,
           floor((CAST(sb1 AS DOUBLE) / n0) * 10000 + 0.5) / 10000
             AS mean_other,
           floor((CAST(sa1 AS DOUBLE) / n1 - CAST(sb1 AS DOUBLE) / n0)
                 / sqrt((CAST(sa2 AS DOUBLE) / n1
                         - (CAST(sa1 AS DOUBLE) / n1)
                           * (CAST(sa1 AS DOUBLE) / n1))
                        / (n1 - 1)
                        + (CAST(sb2 AS DOUBLE) / n0
                           - (CAST(sb1 AS DOUBLE) / n0)
                             * (CAST(sb1 AS DOUBLE) / n0))
                          / (n0 - 1))
                 * 1000000 + 0.5) / 1000000 AS t_stat,
           floor(((CAST(sa2 AS DOUBLE) / n1
                   - (CAST(sa1 AS DOUBLE) / n1)
                     * (CAST(sa1 AS DOUBLE) / n1)) / (n1 - 1)
                  + (CAST(sb2 AS DOUBLE) / n0
                     - (CAST(sb1 AS DOUBLE) / n0)
                       * (CAST(sb1 AS DOUBLE) / n0)) / (n0 - 1))
                 * ((CAST(sa2 AS DOUBLE) / n1
                     - (CAST(sa1 AS DOUBLE) / n1)
                       * (CAST(sa1 AS DOUBLE) / n1)) / (n1 - 1)
                    + (CAST(sb2 AS DOUBLE) / n0
                       - (CAST(sb1 AS DOUBLE) / n0)
                         * (CAST(sb1 AS DOUBLE) / n0)) / (n0 - 1))
                 / (((CAST(sa2 AS DOUBLE) / n1
                      - (CAST(sa1 AS DOUBLE) / n1)
                        * (CAST(sa1 AS DOUBLE) / n1)) / (n1 - 1))
                    * ((CAST(sa2 AS DOUBLE) / n1
                        - (CAST(sa1 AS DOUBLE) / n1)
                          * (CAST(sa1 AS DOUBLE) / n1)) / (n1 - 1))
                    / (n1 - 1)
                    + ((CAST(sb2 AS DOUBLE) / n0
                        - (CAST(sb1 AS DOUBLE) / n0)
                          * (CAST(sb1 AS DOUBLE) / n0)) / (n0 - 1))
                      * ((CAST(sb2 AS DOUBLE) / n0
                          - (CAST(sb1 AS DOUBLE) / n0)
                            * (CAST(sb1 AS DOUBLE) / n0)) / (n0 - 1))
                      / (n0 - 1))
                 * 10000 + 0.5) / 10000 AS welch_df
    FROM w
    """,
    tier="P1",
    doc="Welch's unequal-variance t-test — 'is mean doc length "
    "different for en vs non-en?', the A/B-test aggregate run "
    "without the equal-variance assumption: group means, the t "
    "statistic, and the Welch-Satterthwaite effective degrees of "
    "freedom. Determinism recipe: per-group exact int64 moment "
    "sums (n, s1, s2) from ONE map-side-combined pass; sample "
    "variances, t, and df are fixed IEEE chains from those six "
    "integers — the variance term se_i = (E[x^2] - E[x]^2)/(n-1) "
    "is written with the identical expression nesting on both "
    "engines so every intermediate double agrees bit-for-bit. "
    "Constant-size output at any scale; the 2-group pivot is a "
    "1-row conditional aggregate, no join.",
)
def q_stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
        F.col("n_chars").cast("long").alias("x"),
    )
    m = u.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    w = m.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("s1"))).alias("sa1"),
        F.max(F.when(F.col("grp") == 1, F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("s1"))).alias("sb1"),
        F.max(F.when(F.col("grp") == 0, F.col("s2"))).alias("sb2"),
    )
    ma = F.col("sa1").cast("double") / F.col("n1")
    mb = F.col("sb1").cast("double") / F.col("n0")
    va = (F.col("sa2").cast("double") / F.col("n1") - ma * ma) / (
        F.col("n1") - 1
    )
    vb = (F.col("sb2").cast("double") / F.col("n0") - mb * mb) / (
        F.col("n0") - 1
    )

    def rq(x, p):
        return F.floor(x * F.lit(p) + F.lit(0.5)) / F.lit(p)

    return w.select(
        F.col("n1").alias("n_en"),
        F.col("n0").alias("n_other"),
        rq(ma, 10000).alias("mean_en"),
        rq(mb, 10000).alias("mean_other"),
        rq((ma - mb) / F.sqrt(va + vb), 1000000).alias("t_stat"),
        rq(
            (va + vb)
            * (va + vb)
            / (
                va * va / (F.col("n1") - 1)
                + vb * vb / (F.col("n0") - 1)
            ),
            10000,
        ).alias("welch_df"),
    )


@register(
    "q_ml_auc_by_group",
    oracle="""
    WITH u AS (
      SELECT source AS grp, n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT grp, score,
             CAST(sum(pos) AS BIGINT) AS pos_s,
             CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
      FROM u GROUP BY grp, score
    ),
    c AS (
      SELECT grp, pos_s, neg_s,
             CAST(sum(neg_s) OVER (PARTITION BY grp ORDER BY score
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - neg_s AS BIGINT)
               AS nb
      FROM h
    )
    SELECT grp,
           CAST(sum(pos_s) AS BIGINT) AS n_pos,
           CAST(sum(neg_s) AS BIGINT) AS n_neg,
           CAST(sum(pos_s * (2 * nb + neg_s)) AS BIGINT) AS u2,
           floor(CAST(sum(pos_s * (2 * nb + neg_s)) AS DOUBLE)
                 / (2.0 * sum(pos_s) * sum(neg_s)) * 1000000 + 0.5)
             / 1000000 AS auc
    FROM c GROUP BY grp ORDER BY grp
    """,
    tier="P1",
    doc="Sliced (per-segment) AUC — the fairness/cohort eval every "
    "model report needs beside the global number: the exact "
    "Mann-Whitney histogram construction of q_ml_auc_rank computed "
    "per source group in ONE pass, with the prefix window "
    "PARTITIONED by group (so unlike the global AUC there is no "
    "single-partition window at all — each group's histogram sorts "
    "independently, the fully parallel shape). A segment whose AUC "
    "collapses while the global holds is the classic hidden-"
    "regression signature. Exact int64 2U per group; one divide "
    "per output row.",
)
def q_ml_auc_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        F.col("source").alias("grp"),
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long")
        .alias("pos"),
    )
    h = u.groupBy("grp", "score").agg(
        F.sum("pos").alias("pos_s"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("neg_s"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = h.withColumn("nb", F.sum("neg_s").over(w) - F.col("neg_s"))
    u2 = F.sum(F.col("pos_s") * (F.lit(2) * F.col("nb") + F.col("neg_s")))
    n_pos, n_neg = F.sum("pos_s"), F.sum("neg_s")
    return (
        c.groupBy("grp")
        .agg(
            n_pos.alias("n_pos"),
            n_neg.alias("n_neg"),
            u2.alias("u2"),
            (
                F.floor(
                    u2.cast("double")
                    / (F.lit(2.0) * n_pos * n_neg)
                    * F.lit(1000000)
                    + F.lit(0.5)
                )
                / F.lit(1000000)
            ).alias("auc"),
        )
        .orderBy("grp")
    )


@register(
    "q_ml_cost_threshold",
    oracle="""
    WITH u AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT score, CAST(sum(pos) AS BIGINT) AS pos_s,
             CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
      FROM u GROUP BY score
    ),
    c AS (
      SELECT score,
             CAST(sum(pos_s) OVER w AS BIGINT) AS pge,
             CAST(sum(neg_s) OVER w AS BIGINT) AS nge
      FROM h
      WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW)
    ),
    tot AS (SELECT CAST(sum(pos_s) AS BIGINT) AS p FROM h)
    SELECT CAST(score AS BIGINT) AS threshold,
           nge AS fp, CAST(p - pge AS BIGINT) AS fn,
           CAST(1 * nge + 5 * (p - pge) AS BIGINT) AS total_cost
    FROM c CROSS JOIN tot
    ORDER BY 1 * nge + 5 * (p - pge), score
    LIMIT 1
    """,
    tier="P1",
    doc="Cost-optimal operating point — argmin over thresholds of the "
    "asymmetric misclassification cost 1*FP + 5*FN (the fraud/"
    "moderation setting where a miss costs 5x a false alarm), "
    "chosen from the same descending-prefix histogram as the PR "
    "curve: every candidate's FP/FN are exact int64, so the cost "
    "is an exact integer and the argmin is a pure integer ordering "
    "with threshold tiebreak — the whole sweep never touches a "
    "float. One groupBy at |distinct scores| + one bounded window "
    "+ TakeOrdered(1); the cost weights are part of the operator "
    "contract like the scaler's unit scales.",
)
def q_ml_cost_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long")
        .alias("pos"),
    )
    h = u.groupBy("score").agg(
        F.sum("pos").alias("pos_s"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("neg_s"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = h.select(
        "score",
        F.sum("pos_s").over(w).alias("pge"),
        F.sum("neg_s").over(w).alias("nge"),
    )
    tot = h.agg(F.sum("pos_s").alias("p"))
    cost = F.lit(1) * F.col("nge") + F.lit(5) * (F.col("p") - F.col("pge"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.col("score").alias("threshold"),
            F.col("nge").alias("fp"),
            (F.col("p") - F.col("pge")).alias("fn"),
            cost.alias("total_cost"),
        )
        .orderBy(F.asc("total_cost"), F.asc("threshold"))
        .limit(1)
    )


@register(
    "q_ml_mcnemar",
    oracle="""
    WITH u AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pa,
             CASE WHEN len(string_split(text, ' ')) >= 55 THEN 1
                  ELSE 0 END AS pb
      FROM documents
    )
    SELECT CAST(sum(CASE WHEN pa = y AND pb = y THEN 1 ELSE 0 END)
                AS BIGINT) AS both_right,
           CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                AS BIGINT) AS only_a,
           CAST(sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
                AS BIGINT) AS only_b,
           CAST(sum(CASE WHEN pa <> y AND pb <> y THEN 1 ELSE 0 END)
                AS BIGINT) AS both_wrong,
           CASE WHEN sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                     + sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0
                           END) > 0 THEN
             floor((CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0
                             END)
                         - sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0
                               END) AS DOUBLE))
                   * (CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0
                               END)
                           - sum(CASE WHEN pa <> y AND pb = y THEN 1
                                 ELSE 0 END) AS DOUBLE))
                   / (sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                      + sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0
                            END))
                   * 1000000 + 0.5) / 1000000
           ELSE NULL END AS mcnemar_chi2
    FROM u
    """,
    tier="P1",
    doc="McNemar's paired-classifier test — 'is classifier A (char "
    "threshold) actually better than classifier B (token-count "
    "threshold) on the SAME examples?': the 2x2 agreement matrix "
    "(both right / only A / only B / both wrong) and the McNemar "
    "chi-square (b-c)^2/(b+c) over the discordant cells — the "
    "correct paired test where two independent accuracy numbers "
    "mislead. ONE indicator pass builds all four cells as exact "
    "int64 sums; the statistic is a single IEEE chain, emitted as a "
    "documented NULL when b+c=0 (no discordant pairs — the test is "
    "undefined, and x/0 diverges between ANSI Spark and DuckDB). "
    "Constant output at any scale; the eval-harness companion to "
    "the per-classifier metrics (q_ml_confusion_threshold).",
)
def q_ml_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("pa"),
        F.when(F.size(F.split("text", " ")) >= 55, 1).otherwise(0)
        .alias("pb"),
    )
    both_right = F.sum(
        F.when((F.col("pa") == F.col("y")) & (F.col("pb") == F.col("y")), 1)
        .otherwise(0)
    ).cast("long")
    only_a = F.sum(
        F.when((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y")), 1)
        .otherwise(0)
    ).cast("long")
    only_b = F.sum(
        F.when((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y")), 1)
        .otherwise(0)
    ).cast("long")
    both_wrong = F.sum(
        F.when((F.col("pa") != F.col("y")) & (F.col("pb") != F.col("y")), 1)
        .otherwise(0)
    ).cast("long")
    diff = only_a.cast("double") - only_b.cast("double")
    # Zero discordant pairs (b+c=0) means the test is undefined — emit
    # a documented NULL rather than hitting x/0, where Spark (ANSI) and
    # DuckDB disagree; mirrored by the CASE guard in the oracle.
    return u.agg(
        both_right.alias("both_right"),
        only_a.alias("only_a"),
        only_b.alias("only_b"),
        both_wrong.alias("both_wrong"),
        F.when(
            (only_a + only_b) > 0,
            F.floor(
                diff * diff / (only_a + only_b) * F.lit(1000000) + F.lit(0.5)
            )
            / F.lit(1000000),
        ).alias("mcnemar_chi2"),
    )
