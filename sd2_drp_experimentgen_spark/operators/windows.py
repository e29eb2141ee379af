"""Window functions — SURVEY §2.5.

Reference analog: top-k candidate selection per group, cumulative dosing
curves, inter-observation timing. Every window ORDER BY carries a
unique-key tiebreaker (SURVEY §5.3 rule 2) so ranks are total-ordered
and cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.helpers import sql_r
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


@register(
    "q_win_running",
    oracle=f"""
    SELECT event_id,
           user_id,
           {sql_r("sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id"
                  " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")}
             AS running_sum,
           {sql_r("avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id"
                  " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)")}
             AS mov_avg4
    FROM events
    """,
    tier="P1",
    doc="Running sum + 4-row moving average of event value per user "
    "(cumulative dosing curves analog). Emits event_id, never raw ts; "
    "frame order is total (ts, event_id).",
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4
    from ..sources.tables import load_events

    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        r4(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0))).alias(
            "running_sum"
        ),
        r4(F.avg("value").over(w.rowsBetween(-3, 0))).alias("mov_avg4"),
    )


@register(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id,
           user_id,
           (epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000 AS gap_s,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tier="P1",
    doc="Per-user inter-event gap in whole seconds via lag over "
    "microsecond epochs (integer floor-division — both engines see "
    "identical µs after the truncating ns ingest), plus lead of the "
    "next event type.",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.floor((us - F.lag(us).over(w)) / 1000000).alias("gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_win_ntile_firstlast",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           ntile(4) OVER w AS quartile,
           first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS first_k,
           last_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS last_k
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tier="P2",
    doc="ntile(4) quartile binning per order status + first/last_value "
    "with an explicit full-partition ROWS frame (quartile binning "
    "analog). Partitioned by status so no global single-partition "
    "window exists at scale.",
)
def q_win_ntile_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_orderkey").over(wfull).alias("first_k"),
        F.last("o_orderkey").over(wfull).alias("last_k"),
    )


@register(
    "q_win_range_frame",
    oracle=f"""
    SELECT o_orderkey,
           o_custkey,
           {sql_r('''sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1990-01-01',
                                CAST(o_orderdate AS DATE))
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)''')} AS spend_30d
    FROM orders
    """,
    tier="P1",
    doc="Value-based RANGE window frame: per customer, rolling 30-day "
    "spend ordered by order date expressed as integer days. RANGE "
    "frames bound by VALUE distance (all orders within 30 days), not "
    "row count — the correct semantics for irregular time series, and "
    "peers with equal dates aggregate together identically on both "
    "engines (no tiebreaker needed, unlike ROWS frames). Partitioned "
    "by customer so the window state stays per-key at scale.",
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import _round_halfup

    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        _round_halfup(F.sum("o_totalprice").over(w), 4).alias("spend_30d"),
    )


@register(
    "q_win_percent_rank",
    oracle=f"""
    SELECT o_orderkey,
           o_orderstatus,
           {sql_r('percent_rank() OVER w', 6)} AS pct_rank,
           {sql_r('cume_dist() OVER w', 6)} AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
    tier="P1",
    doc="Relative-rank window functions: percent_rank and cume_dist "
    "per order status with a total order (price, key) — the "
    "score-normalization shape for cross-plate comparability.",
)
def q_win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import _round_halfup

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        _round_halfup(F.percent_rank().over(w), 6).alias("pct_rank"),
        _round_halfup(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q_win_moving_median",
    oracle=f"""
    SELECT user_id, event_id,
           {sql_r("median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)")}
             AS med5
    FROM events
    """,
    tier="P1",
    doc="Moving median of value over each user's last 5 events (rows "
    "frame, unique (ts, event_id) ordering) — the robust rolling "
    "baseline of sensor QC. percentile() as a window aggregate shares "
    "DuckDB median's linear-interpolation semantics; one shuffle on "
    "user_id, frame evaluation is per-partition.",
)
def q_win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        r4(F.expr("percentile(value, 0.5)").over(w)).alias("med5"),
    )


@register(
    "q_agg_mode_deterministic",
    oracle="""
    SELECT user_id, event_type AS top_event, n
    FROM (
      SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (
               PARTITION BY user_id ORDER BY count(*) DESC, event_type
             ) AS rn
      FROM events
      GROUP BY user_id, event_type
    )
    WHERE rn = 1
    """,
    tier="P1",
    doc="Deterministic per-group mode: each user's most frequent event "
    "type with a lexicographic tiebreak — never the engine's mode() "
    "whose tie behavior is unspecified. groupBy count aggregates "
    "map-side first; the window then ranks at most |event_types| rows "
    "per user, so the second shuffle is tiny.",
)
def q_agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event"), "n")
    )


@register(
    "q_win_rolling_distinct",
    oracle="""
    SELECT event_id,
           CAST(len(list_distinct(types_win)) AS INTEGER) AS distinct_types
    FROM (
      SELECT event_id,
             list(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW
             ) AS types_win
      FROM events
    )
    """,
    tier="P1",
    doc="Rolling distinct count over a window: distinct event types "
    "within each user's trailing 6 events, via size(collect_set) "
    "over a rows frame (COUNT(DISTINCT) OVER is unsupported in both "
    "engines; the set-collect form is the standard workaround and "
    "bounds per-row state to the frame). The burst-diversity / "
    "variety-monitoring shape.",
)
def q_win_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, 0)
    )
    return ev.select(
        "event_id",
        F.size(F.collect_set("event_type").over(w)).cast("int").alias(
            "distinct_types"
        ),
    )


@register(
    "q_win_range_interval",
    oracle="""
    SELECT event_id,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour
    FROM events
    """,
    tier="P1",
    doc="Event-time RANGE frame with a calendar interval: each event's "
    "count of same-user events in the trailing hour — frame membership "
    "is decided by TIMESTAMP DISTANCE, not row position (a burst of "
    "100 events in a minute all share ~the same frame; a quiet user's "
    "frame may hold one row). The rate-limiting / burst-detection "
    "window shape; rows-frames cannot express it.",
)
def q_win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    ev.createOrReplaceTempView("v_events_ri")
    return spark.sql(
        """
        SELECT event_id,
               count(*) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS n_last_hour
        FROM v_events_ri
        """
    )


EWMA_ALPHA = 0.8  # decay per step
EWMA_K = 5  # bounded trailing window


def _ewma_terms_sql() -> str:
    num = " + ".join(
        f"COALESCE(lag(value, {j}) OVER w * {EWMA_ALPHA ** j!r}, 0)"
        for j in range(EWMA_K)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL"
        f" THEN {EWMA_ALPHA ** j!r} ELSE 0 END"
        for j in range(EWMA_K)
    )
    return f"({num}) / ({den})"


@register(
    "q_win_ewma_bounded",
    oracle=f"""
    SELECT user_id, event_id,
           floor(({_ewma_terms_sql()}) * 10000 + 0.5) / 10000 AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tier="P2",
    doc="Bounded exponentially-weighted moving average per user (the "
    "time-series smoothing primitive): EWMA over each event's "
    "trailing 5 observations with per-step decay 0.8, normalized "
    "over the weights actually present so early rows smooth over "
    "their shorter history. The unbounded recursive EWMA cannot be "
    "expressed (or cross-checked) in window SQL; the bounded form "
    "is the standard streaming-feature approximation and is written "
    "as a FIXED sum of lag() terms — identical expression order on "
    "both engines, so the float arithmetic is bit-identical and the "
    "result hash-checks. One shuffle + one sort per user serves all "
    "five lags.",
)
def q_win_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import _round_halfup

    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for j in range(EWMA_K):
        lagv = F.lag("value", j).over(w)
        term = F.coalesce(lagv * F.lit(EWMA_ALPHA**j), F.lit(0.0))
        wgt = F.when(lagv.isNotNull(), F.lit(EWMA_ALPHA**j)).otherwise(
            F.lit(0.0)
        )
        num = term if num is None else num + term
        den = wgt if den is None else den + wgt
    return ev.select(
        "user_id",
        "event_id",
        _round_halfup(num / den, 4).alias("ewma"),
    )


@register(
    "q_win_max_drawdown",
    oracle="""
    WITH cum AS (
      SELECT user_id, ts, event_id,
             sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)
                 * CASE WHEN event_type = 'error' THEN -1 ELSE 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS bal
      FROM events
    ),
    dd AS (
      SELECT user_id, bal,
             max(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) - bal AS drawdown
      FROM cum
    )
    SELECT user_id,
           count(*) AS n_events,
           CAST(max(drawdown) AS BIGINT) AS max_drawdown_units,
           CAST(max(bal) AS BIGINT) AS peak_units,
           CAST(sum(CASE WHEN drawdown = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_at_peak
    FROM dd
    GROUP BY user_id
    """,
    tier="P1",
    doc="Maximum drawdown per user — the running-peak-to-trough metric "
    "of finance and SLO analytics, over a signed running balance "
    "(error events debit, everything else credits): cumulative sum, "
    "running max, drawdown = peak - current, all in exact integer "
    "units over the total order (ts, event_id) so an inherently "
    "PATH-DEPENDENT statistic still hash-checks bit-for-bit — "
    "float cumulative sums would make every downstream value "
    "order-sensitive. Both windows and the final rollup share ONE "
    "user_id shuffle and sort; n_at_peak (rows with zero drawdown) "
    "rides along as the time-at-high-water companion metric.",
)
def q_win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import int_units
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        (
            int_units("value")
            * F.when(F.col("event_type") == "error", -1).otherwise(1)
        ).alias("delta"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ev.select(
        "user_id", F.sum("delta").over(w).alias("bal"), "ts", "event_id"
    )
    dd = cum.select(
        "user_id",
        "bal",
        (F.max("bal").over(w) - F.col("bal")).alias("drawdown"),
    )
    return dd.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("drawdown").alias("max_drawdown_units"),
        F.max("bal").alias("peak_units"),
        F.sum(F.when(F.col("drawdown") == 0, 1).otherwise(0)).alias(
            "n_at_peak"
        ),
    )


@register(
    "q_win_nth_cume",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           nth_value(o_orderkey, 3) OVER (
             PARTITION BY o_orderstatus
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_key,
           floor(cume_dist() OVER (
             PARTITION BY o_orderstatus
             ORDER BY o_totalprice DESC, o_orderkey
           ) * 1000000 + 0.5) / 1000000 AS cume
    FROM orders
    """,
    tier="P2",
    doc="nth_value + cume_dist — the two window navigation/ranking "
    "functions the battery (rank/ntile/first/last/lag/lead/"
    "percent_rank) had not yet exercised: the 3rd-highest-price "
    "order key per status via an explicit full-partition ROWS frame, "
    "and each row's cumulative distribution. The window order ends "
    "in the unique key so both are tie-deterministic; cume_dist is "
    "a ratio of two exact integers (rank position / partition "
    "count), rounded 6dp identically on both engines. Same "
    "one-sort-per-partition execution as every ranked window.",
)
def q_win_nth_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r6

    o = load_table(spark, sf_dir, "orders")
    order = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    w_full = (
        Window.partitionBy("o_orderstatus")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w = Window.partitionBy("o_orderstatus").orderBy(*order)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.nth_value("o_orderkey", 3).over(w_full).alias("third_key"),
        r6(F.cume_dist().over(w)).alias("cume"),
    )
