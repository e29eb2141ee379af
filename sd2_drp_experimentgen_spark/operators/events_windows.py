"""Time-window queries over the events stream table — SURVEY §2.10,
batch form. The Structured Streaming twins (same operators with
watermarks, readStream sources) live in ``streaming/``; the driver's
oracle can only hash batch output, so these run the identical window
expressions in batch mode.

The nanosecond-timestamp ingest hazard is handled centrally in
sources.tables.load_events (integer-truncation to µs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import epoch_seconds, r4, sql_r
from ..plans.registry import register
from ..sources.tables import load_events


@register(
    "q_stream_tumbling_1h",
    oracle=f"""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
             AS window_start,
           event_type,
           count(*) AS n,
           {sql_r('sum(value)')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tier="P0",
    doc="1-hour tumbling window counts + value sums per event type, "
    "window start emitted as epoch seconds (raw timestamps are never "
    "emitted — SURVEY §5.3 rule 3). Streaming twin adds a 2h watermark.",
)
def q_stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            epoch_seconds(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "q_stream_sliding_1h_15m",
    oracle=f"""
    SELECT CAST(epoch(time_bucket(INTERVAL '15 minutes', ts)
                      - ks.k * INTERVAL '15 minutes') AS BIGINT)
             AS window_start,
           event_type,
           count(*) AS n,
           {sql_r('sum(value)')} AS sum_value
    FROM events
    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks
    GROUP BY 1, 2
    """,
    tier="P1",
    doc="Sliding window 1h length / 15min slide per event type. Spark "
    "aligns sliding windows to the epoch; the oracle reproduces that by "
    "generating each event's 4 covering windows (bucket15(ts) - k*15min "
    "for k=0..3). Streaming twin uses the same F.window with watermark.",
)
def q_stream_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            epoch_seconds(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "q_stream_session_30m",
    oracle="""
    WITH gapped AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, us,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_idx
      FROM gapped
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           count(*) AS n_events,
           (max(us) - min(us)) // 1000000 AS dur_s
    FROM sessions
    GROUP BY user_id, session_idx
    """,
    tier="P1",
    doc="Sessionization with a 30-min inactivity gap via the "
    "lag+cumsum construction (deterministic cross-engine; session "
    "boundaries compared in integer microseconds). Emits one row per "
    "(user, session): event count + duration in whole seconds. The "
    "streaming twin uses F.session_window; a pytest self-check asserts "
    "its boundaries equal this construction.",
)
def q_stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1800 * 1_000_000
    gapped = ev.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = gapped.select(
        "user_id",
        "event_id",
        "us",
        F.sum("is_new").over(wc).alias("session_idx"),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(us) - min(us)) div 1000000").alias("dur_s"),
    )


@register(
    "q_stream_dedup",
    oracle="""
    SELECT event_type, count(DISTINCT event_id) AS n
    FROM events
    GROUP BY event_type
    """,
    tier="P1",
    doc="Duplicate-event drop by event_id + per-type counts (batch twin "
    "of streaming dropDuplicatesWithinWatermark). event_id is unique in "
    "the fixtures so survivor choice cannot diverge; the streaming twin "
    "is exercised by a self-test with injected duplicates.",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_event_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (event_type = 'view') AS t_view,
             min(ts) FILTER (event_type = 'click') AS t_click,
             min(ts) FILTER (event_type = 'purchase') AS t_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT
      CAST(count(*) FILTER (t_view IS NOT NULL) AS BIGINT) AS step1_view,
      CAST(count(*) FILTER (t_view IS NOT NULL AND t_click > t_view)
           AS BIGINT) AS step2_click,
      CAST(count(*) FILTER (t_view IS NOT NULL AND t_click > t_view
                            AND t_purchase > t_click)
           AS BIGINT) AS step3_purchase
    FROM firsts
    """,
    tier="P1",
    doc="Ordered event funnel: users counted at each step only if the "
    "step's FIRST occurrence follows the previous step's first "
    "occurrence (view -> click -> purchase). One groupBy computing "
    "three conditional mins, then a single-row conditional count — "
    "the canonical conversion-funnel shape; per-user state is three "
    "timestamps regardless of event volume, so it scales to any "
    "events-per-user skew.",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count_if(s1).alias("step1_view"),
        F.count_if(s2).alias("step2_click"),
        F.count_if(s3).alias("step3_purchase"),
    )


@register(
    "q_retention_cohort",
    oracle="""
    WITH activity AS (
      SELECT user_id,
             CAST(floor(date_diff('day', TIMESTAMP '2024-01-01', ts) / 7)
                  AS INTEGER) AS week
      FROM events
      GROUP BY user_id, 2
    ),
    cohorts AS (
      SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY user_id
    )
    SELECT c.cohort_week,
           a.week - c.cohort_week AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY c.cohort_week, week_offset
    """,
    tier="P1",
    doc="Cohort retention matrix: users bucketed by first-activity "
    "week (cohort), counted in each later week they return — the "
    "(cohort_week, week_offset) -> users triangle. Two aggregations "
    "plus one equi-join on user_id; at 100 TB the distinct-user "
    "dedup happens inside the first groupBy so the join moves one "
    "row per (user, week), not raw events.",
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    week = F.floor(
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp")) / 7
    ).cast("int")
    activity = ev.select("user_id", week.alias("week")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "q_agg_window_distinct",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
             AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY 1
    """,
    tier="P1",
    doc="Exact distinct users per 1-hour tumbling window next to raw "
    "event counts — the windowed-cardinality shape every ingest "
    "dashboard needs. Spark plans countDistinct as a two-phase "
    "aggregate (partial dedup on (window, user) before the final "
    "count), so the shuffle carries one row per distinct pair, not "
    "per event; the approximate twin at scale is approx_count_distinct "
    "(q_agg_approx_distinct documents the HLL contract).",
)
def q_agg_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_users",
            "n_events",
        )
    )


@register(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    tier="P1",
    doc="Markov transition counts: for each user's event sequence "
    "(unique (ts, event_id) ordering), count (current -> next) "
    "event-type pairs — the path-analysis primitive behind funnels "
    "and next-action models. One shuffle on user_id for the lead "
    "window, then a tiny |types|² aggregate.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_time_downsample_ohlc",
    oracle=f"""
    WITH r AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id,
           CAST(epoch(hour) AS BIGINT) AS hour_start,
           {sql_r("max(CASE WHEN rn_a = 1 THEN value END)")} AS open,
           {sql_r("max(value)")} AS high,
           {sql_r("min(value)")} AS low,
           {sql_r("max(CASE WHEN rn_d = 1 THEN value END)")} AS close,
           count(*) AS n_events
    FROM r GROUP BY user_id, hour
    """,
    tier="P1",
    doc="OHLC time-series downsample: per (user, hour) bar of open/"
    "high/low/close/count — the hypertable-rollup shape for metric "
    "telemetry. First/last are tiebroken by (ts, event_id) so the bar "
    "is deterministic under any partitioning; every output float is a "
    "SELECTED row value or min/max (exact selection, never a float "
    "accumulation). One window pass + one groupBy on the same keys — "
    "a single shuffle; at 100 TB the hour bucket bounds state and the "
    "per-key window sort is the per-partition sort Spark already does.",
)
def q_time_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    r = ev.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "ts",
        "event_id",
        "value",
    )
    w_a = Window.partitionBy("user_id", "hour").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    w_d = Window.partitionBy("user_id", "hour").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = r.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    return (
        r.groupBy("user_id", "hour")
        .agg(
            r4(F.max(F.when(F.col("rn_a") == 1, F.col("value")))).alias("open"),
            r4(F.max("value")).alias("high"),
            r4(F.min("value")).alias("low"),
            r4(F.max(F.when(F.col("rn_d") == 1, F.col("value")))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            epoch_seconds(F.col("hour")).alias("hour_start"),
            "open", "high", "low", "close", "n_events",
        )
    )


@register(
    "q_win_gap_islands",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rnt
      FROM events
    )
    SELECT user_id, event_type,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS island_start,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS island_end,
           count(*) AS n_events
    FROM seq
    GROUP BY user_id, event_type, rn - rnt
    """,
    tier="P1",
    doc="Gaps-and-islands: maximal runs of consecutive same-type "
    "events per user via the classic difference-of-row_numbers "
    "grouping key (rn over user minus rn over (user, type) is "
    "constant exactly within a run). Pure integer/timestamp op — "
    "hash-exact. Both windows partition by user_id, so one shuffle "
    "colocates everything and the second window reuses the sort; the "
    "per-user sequence-analysis shape for session/burst mining.",
)
def q_win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    w_u = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    w_ut = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_u) - F.row_number().over(w_ut)).alias("island"),
    )
    return (
        seq.groupBy("user_id", "event_type", "island")
        .agg(
            epoch_seconds(F.min("ts")).alias("island_start"),
            epoch_seconds(F.max("ts")).alias("island_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id", "event_type", "island_start", "island_end", "n_events"
        )
    )


@register(
    "q_interval_sweepline",
    oracle="""
    WITH pts AS (
      SELECT user_id, ts AS t, 1 AS delta, event_id FROM events
      UNION ALL
      SELECT user_id, ts + INTERVAL 30 MINUTE, -1, event_id FROM events
    ),
    swept AS (
      SELECT user_id,
             sum(delta) OVER (PARTITION BY user_id
                              ORDER BY t, delta, event_id) AS live
      FROM pts
    )
    SELECT user_id,
           CAST(max(live) AS BIGINT) AS max_concurrent
    FROM swept GROUP BY user_id
    """,
    tier="P1",
    doc="Sweep-line interval concurrency: each event opens a 30-minute "
    "activity interval; the classic +1/-1 boundary-point trick with a "
    "per-user running sum yields the maximum number of simultaneously "
    "open intervals. Boundary ties close-before-open (delta ascending) "
    "with event_id tiebreak, so the result is partitioning-"
    "independent. The overlap-analytics primitive (concurrent "
    "sessions, instrument occupancy); per-user partitioning keeps the "
    "sweep distributed — one shuffle, no global order.",
)
def q_interval_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    opens = ev.select(
        "user_id", F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    closes = ev.select(
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    pts = opens.unionAll(closes)
    w = Window.partitionBy("user_id").orderBy("t", "delta", "event_id")
    swept = pts.select("user_id", F.sum("delta").over(w).alias("live"))
    return swept.groupBy("user_id").agg(
        F.max("live").cast("long").alias("max_concurrent")
    )


@register(
    "q_event_attribution",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, event_type, value, ts, event_id,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS touch
      FROM events
    )
    SELECT coalesce(touch, 'none') AS touch,
           CAST(count(*) AS BIGINT) AS n_purchases,
           {sql_r('sum(value)')} AS attributed_value
    FROM tagged
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tier="P1",
    doc="Last-touch attribution: each purchase credits the user's most "
    "recent PRECEDING non-purchase event (ignore-nulls last_value over "
    "a trailing frame — the single-table carry-forward shape, same "
    "machinery as the as-of join but without a second relation). "
    "Purchases with no prior touch fall to 'none'. One per-user "
    "window then a tiny groupBy — a single shuffle; the "
    "marketing/conversion-credit primitive.",
)
def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    tagged = ev.select(
        "user_id", "event_type", "value", touch.alias("touch")
    )
    return (
        tagged.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("none")).alias("touch"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            r4(F.sum("value")).alias("attributed_value"),
        )
    )


@register(
    "q_event_journey_pipeline",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER win IS NULL
                    OR ts - lag(ts) OVER win > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_np
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(new_sess) AS BIGINT) AS n_sessions,
           CAST(CASE
             WHEN min(ts) FILTER (event_type = 'view') IS NOT NULL
              AND min(ts) FILTER (event_type = 'click')
                  > min(ts) FILTER (event_type = 'view')
              AND min(ts) FILTER (event_type = 'purchase')
                  > min(ts) FILTER (event_type = 'click')
             THEN 3
             WHEN min(ts) FILTER (event_type = 'view') IS NOT NULL
              AND min(ts) FILTER (event_type = 'click')
                  > min(ts) FILTER (event_type = 'view')
             THEN 2
             WHEN min(ts) FILTER (event_type = 'view') IS NOT NULL
             THEN 1 ELSE 0 END AS BIGINT) AS funnel_stage,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
             AS n_purchases,
           CAST(count(*) FILTER (event_type = 'purchase'
                                 AND prev_np = 'click') AS BIGINT)
             AS n_attr_click
    FROM w GROUP BY user_id
    """,
    tier="P1",
    doc="SIGNATURE composition for the event-analytics leg — the "
    "per-user journey table a product team actually reads, built as "
    "ONE Catalyst plan: 30-min-gap sessionization (lag + boundary "
    "count), ordered view->click->purchase funnel stage (conditional "
    "first-timestamp comparison), and last-touch click attribution "
    "per purchase (ignore-nulls last_value over a trailing frame), "
    "all folded into a single wide row per user. Both window specs "
    "and the final groupBy share ONE user_id shuffle — composing the "
    "three analyses costs no more data movement than any one of "
    "them, the point of declaring the whole journey in one plan. "
    "Every output is a count or a small integer stage: hash-exact.",
)
def q_event_journey_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(win)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > 1800),
        1,
    ).otherwise(0)
    prev_np = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(win.rowsBetween(Window.unboundedPreceding, -1))
    rows = ev.select(
        "user_id",
        "ts",
        "event_type",
        new_sess.alias("new_sess"),
        prev_np.alias("prev_np"),
    )

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    agg = rows.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("new_sess").alias("n_sessions"),
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count_if(
            (F.col("event_type") == "purchase") & (F.col("prev_np") == "click")
        ).alias("n_attr_click"),
    )
    stage = (
        F.when(
            F.col("t_view").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
            & (F.col("t_purchase") > F.col("t_click")),
            3,
        )
        .when(
            F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")),
            2,
        )
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return agg.select(
        "user_id",
        "n_events",
        "n_sessions",
        stage.cast("long").alias("funnel_stage"),
        "n_purchases",
        "n_attr_click",
    )


FUNNEL_WINDOW_HOURS = 24


@register(
    "q_event_funnel_bounded",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT f.user_id, f.first_view,
             min(e.ts) AS first_purchase_in_window
      FROM firsts f
      LEFT JOIN events e
        ON e.user_id = f.user_id
       AND e.event_type = 'purchase'
       AND e.ts > f.first_view
       AND e.ts <= f.first_view + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY f.user_id, f.first_view
    )
    SELECT count(*) AS n_users,
           count(first_view) AS n_viewed,
           count(first_purchase_in_window) AS n_converted,
           CAST(floor(CAST(count(first_purchase_in_window) AS DOUBLE)
                      / count(first_view) * 10000 + 0.5) AS BIGINT)
             AS conversion_bps
    FROM conv
    """,
    tier="P1",
    doc="TIME-BOUNDED conversion funnel — the attribution-window form "
    f"of q_event_funnel: a user converts only if a purchase follows "
    f"their first view within {FUNNEL_WINDOW_HOURS} hours (unbounded "
    "funnels overstate conversion forever; every product-analytics "
    "tool bounds the window). The purchase search is a range-"
    "predicate join back to events keyed on user_id — one co-"
    "partitioned shuffle — and the report is exact integer counts "
    "plus one basis-point divide. At 100 TB the same plan holds "
    "with the join's time predicate doubling as a partition-pruning "
    "filter when events are date-partitioned.",
)
def q_event_funnel_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        firsts.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("first_view"))
            & (
                F.col("p_ts")
                <= F.col("first_view")
                + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
            ),
            "left",
        )
        .groupBy("user_id", "first_view")
        .agg(F.min("p_ts").alias("first_purchase_in_window"))
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewed"),
        F.count("first_purchase_in_window").alias("n_converted"),
        F.floor(
            F.count("first_purchase_in_window").cast("double")
            / F.count("first_view")
            * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("conversion_bps"),
    )


@register(
    "q_events_seq_examples",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type, 1) OVER w AS prev1,
             lag(event_type, 2) OVER w AS prev2,
             lag(event_type, 3) OVER w AS prev3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT prev3 || '>' || prev2 || '>' || prev1 AS context,
           event_type AS label,
           count(*) AS n_examples,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM ordered
    WHERE prev3 IS NOT NULL
    GROUP BY context, label
    """,
    tier="P1",
    doc="Sequence-training-example generation from event logs — the "
    "SEQUENTIAL counterpart of the tabular q_train_features_wide: "
    "each event becomes one (context, label) example where the "
    "context is the user's previous 3 event types (lag window over "
    "the per-user total order) and the label is the current type; "
    "the rollup is the transition table a next-event model (or an "
    "n-gram behavioral LM) trains on, with per-cell support counts "
    "and distinct-user counts (the leakage check: a cell supported "
    "by one user is memorization, not signal). One per-user "
    "sort/shuffle shared by all three lags; output cardinality is "
    "bounded by |types|^4 regardless of event volume — at 100 TB "
    "the examples themselves would be written from the same window "
    "projection (one pass), and this table is its audit.",
)
def q_events_seq_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        F.col("event_type").alias("label"),
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
        F.lag("event_type", 3).over(w).alias("prev3"),
    ).where(F.col("prev3").isNotNull())
    return (
        lagged.select(
            F.concat_ws(">", "prev3", "prev2", "prev1").alias("context"),
            "label",
            "user_id",
        )
        .groupBy("context", "label")
        .agg(
            F.count(F.lit(1)).alias("n_examples"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@register(
    "q_ts_seasonality_profile",
    oracle="""
    WITH u AS (
      SELECT EXTRACT(hour FROM ts) AS hour_of_day,
             (EXTRACT(isodow FROM ts) - 1) >= 5 AS is_weekend,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS units
      FROM events
    ),
    cell AS (
      SELECT hour_of_day, is_weekend,
             count(*) AS n_events,
             CAST(sum(units) AS BIGINT) AS sum_units
      FROM u GROUP BY hour_of_day, is_weekend
    ),
    tot AS (
      SELECT count(*) AS n_g, CAST(sum(units) AS BIGINT) AS sum_g FROM u
    )
    SELECT CAST(hour_of_day AS BIGINT) AS hour_of_day, is_weekend,
           CAST(n_events AS BIGINT) AS n_events, sum_units,
           floor((CAST(sum_units AS DOUBLE) / 1000000 / n_events)
                 * 1000000 + 0.5) / 1000000 AS mean_value,
           CAST(floor((CAST(sum_units AS DOUBLE) / n_events)
                      / (CAST(sum_g AS DOUBLE) / n_g)
                      * 1000000 + 0.5) AS BIGINT) AS seasonal_idx_x1e6
    FROM cell CROSS JOIN tot
    """,
    tier="P1",
    doc="Calendar-seasonality profile — the S component of an STL-lite "
    "decomposition over the event stream: per (hour-of-day, "
    "weekend/weekday) cell, event volume, exact integer value mass, "
    "mean, and the seasonal index (cell mean / global mean, ppm) "
    "that a forecaster or anomaly detector divides out before "
    "looking at residuals. Determinism recipe: per-row 1e-6 integer "
    "units (int_units pattern) so every SUM is exact and "
    "order-independent; the index is computed from the four exact "
    "integers with the identical IEEE divide/divide/floor expression "
    "on both engines — never a float sum, never a mean of means. "
    "Spark weekday() == DuckDB isodow-1 (the documented cross-engine "
    "dow convention, scalars.py). One groupBy over a projection plus "
    "a broadcast of the 1-row global — at 100 TB the profile is a "
    "constant-size (48-cell) rollup whatever the event volume, and "
    "the same two-level exact-partials shape maintains incrementally "
    "(q_etl_incremental_agg's fold).",
)
def q_ts_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import int_units, r6

    ev = load_events(spark, sf_dir)
    u = ev.select(
        F.hour("ts").cast("long").alias("hour_of_day"),
        (F.weekday("ts") >= 5).alias("is_weekend"),
        int_units("value", 6).alias("units"),
    )
    cell = u.groupBy("hour_of_day", "is_weekend").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("units").alias("sum_units"),
    )
    tot = u.agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("units").alias("sum_g")
    )
    return cell.crossJoin(F.broadcast(tot)).select(
        "hour_of_day",
        "is_weekend",
        "n_events",
        "sum_units",
        r6(
            F.col("sum_units").cast("double")
            / F.lit(1000000)
            / F.col("n_events")
        ).alias("mean_value"),
        F.floor(
            (F.col("sum_units").cast("double") / F.col("n_events"))
            / (F.col("sum_g").cast("double") / F.col("n_g"))
            * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("seasonal_idx_x1e6"),
    )


@register(
    "q_win_session_cap",
    oracle="""
    WITH gapped AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, us,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_idx
      FROM gapped
    ),
    capped AS (
      SELECT user_id, session_idx, us,
             (us - min(us) OVER (PARTITION BY user_id, session_idx))
               // CAST(7200000000 AS BIGINT) AS sub_idx
      FROM sessions
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           CAST(sub_idx AS BIGINT) AS sub_idx,
           count(*) AS n_events,
           (max(us) - min(us)) // 1000000 AS dur_s
    FROM capped
    GROUP BY user_id, session_idx, sub_idx
    """,
    tier="P1",
    doc="Capped sessionization — the gap-session operator with a "
    "maximum-duration cap (the billing/abuse-control variant: an "
    "idle gap closes a session AND a marathon session is split at "
    "2 h so no session key accumulates unbounded state): 30-min gap "
    "sessions via the lag+cumsum construction, then each session's "
    "events split into fixed 2 h sub-windows anchored at the "
    "session's first event (offset div — exact integer "
    "microseconds, cross-engine). Every sub-session's duration is "
    "structurally < 2 h, which is precisely the bound a streaming "
    "state store needs to evict deterministically "
    "(q_stream_session_30m's session_window carries the same gap "
    "semantics; the cap is what production adds). One per-user "
    "sort shared by the lag, cumsum, and session-start windows — "
    "no extra shuffle for the cap.",
)
def q_win_session_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1800 * 1_000_000
    gapped = ev.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = gapped.select(
        "user_id",
        "us",
        "event_id",
        F.sum("is_new").over(wc).alias("session_idx"),
    )
    ws = Window.partitionBy("user_id", "session_idx")
    capped = sessions.select(
        "user_id",
        "session_idx",
        "us",
        F.expr(f"(us - min(us) OVER (PARTITION BY user_id, session_idx))"
               f" div {7200 * 1_000_000}").alias("sub_idx"),
    )
    return capped.groupBy("user_id", "session_idx", "sub_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(us) - min(us)) div 1000000").alias("dur_s"),
    )


@register(
    "q_ts_changepoint_cusum",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_day
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(n_day) AS BIGINT) AS total
      FROM d
    ),
    c AS (
      SELECT day, n_day,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
             CAST(sum(n_day) OVER (ORDER BY day
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS prefix
      FROM d
    )
    SELECT day, n_day, k,
           CAST(n_days * prefix - k * total AS BIGINT) AS cusum_scaled,
           CAST(abs(n_days * prefix - k * total) AS BIGINT) AS abs_cusum
    FROM c CROSS JOIN t
    ORDER BY abs_cusum DESC, day
    LIMIT 5
    """,
    tier="P1",
    doc="CUSUM changepoint scan over the daily event-volume series — "
    "the drift detector a data-quality monitor runs on ingest "
    "volume (max |cumulative deviation from the global mean| marks "
    "the most likely level-shift day). Determinism recipe: the "
    "textbook CUSUM prefix_k - k*mean is scaled by n_days so "
    "cusum_scaled = n*prefix_k - k*total stays EXACT int64 — no "
    "float mean ever enters; |values| <= n*total bounds headroom. "
    "Top-5 by |CUSUM| with day tiebreak = a total order. Plan: "
    "map-side-combined daily rollup (the only pass over raw "
    "events), then the window + argmax run over |days| rows — "
    "constant-sized at any event volume, same shape as "
    "q_ts_seasonality_profile's rollup-then-analyze.",
)
def q_ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_day")
    )
    t = d.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("n_day").alias("total")
    )
    w = Window.orderBy("day")
    c = d.select(
        "day",
        "n_day",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("n_day")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("prefix"),
    )
    cusum = (
        F.col("n_days") * F.col("prefix") - F.col("k") * F.col("total")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "day",
            "n_day",
            "k",
            cusum.alias("cusum_scaled"),
            F.abs(cusum).alias("abs_cusum"),
        )
        .orderBy(F.desc("abs_cusum"), F.asc("day"))
        .limit(5)
    )


@register(
    "q_ts_autocorrelation",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM b),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM bounds
    ),
    s AS (
      SELECT g.hr, COALESCE(b.n, 0) AS x,
             CAST(row_number() OVER (ORDER BY g.hr) AS BIGINT) AS i
      FROM grid g LEFT JOIN b ON b.hr = g.hr
    ),
    lags AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS lag_h),
    pairs AS (
      SELECT l.lag_h, a.x AS x, b2.x AS y
      FROM lags l
      JOIN s a ON TRUE
      JOIN s b2 ON b2.i = a.i + l.lag_h
    )
    SELECT CAST(lag_h AS BIGINT) AS lag_h,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           floor((CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
                  / sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x)
                              AS DOUBLE)
                         * CAST(count(*) * sum(y * y) - sum(y) * sum(y)
                                AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000 AS acf
    FROM pairs GROUP BY lag_h ORDER BY lag_h
    """,
    tier="P1",
    doc="Autocorrelation function (lags 1-6 h) of the hourly "
    "event-count series — the periodicity probe (daily rhythm, "
    "burst persistence) a forecaster runs before model choice. "
    "The raw stream collapses to a DENSE hourly grid first "
    "(sequence-explode fills silent hours with 0 — skipping gaps "
    "would misalign every lag), then each lag's Pearson r comes "
    "from the five exact int64 sums over aligned pairs via the "
    "textbook product-moment identity; numerator and both "
    "variance terms stay in int64 (counts bounded per hour), "
    "cast to double only for the final sqrt/divide — the "
    "identical IEEE chain both engines. Plan: one "
    "map-side-combined rollup over raw events; everything after "
    "runs on |hours| rows (720 here; still tiny at years of "
    "data). The lag join is an integer equi-join on the hour "
    "index i = i + lag, 6x|hours| pairs total.",
)
def q_ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    b = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = b.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hr")
    )
    s = (
        grid.join(b, "hr", "left")
        .select("hr", F.coalesce("n", F.lit(0)).alias("x"))
        .withColumn(
            "i", F.row_number().over(Window.orderBy("hr")).cast("long")
        )
    )
    lags = spark.range(1, 7).select(F.col("id").alias("lag_h"))
    a = s.alias("a")
    b2 = s.alias("b2")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b2,
            F.col("b2.i") == F.col("a.i") + F.col("lag_h"),
        )
        .select("lag_h", F.col("a.x").alias("x"), F.col("b2.x").alias("y"))
    )
    n = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("y")
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    sxy = F.sum(F.col("x") * F.col("y"))
    return (
        pairs.groupBy("lag_h")
        .agg(
            n.alias("n_pairs"),
            sx.alias("sx"),
            sy.alias("sy"),
            sxx.alias("sxx"),
            syy.alias("syy"),
            sxy.alias("sxy"),
            (
                F.floor(
                    (
                        (n * sxy - sx * sy).cast("double")
                        / F.sqrt(
                            (n * sxx - sx * sx).cast("double")
                            * (n * syy - sy * sy).cast("double")
                        )
                    )
                    * F.lit(1000000)
                    + F.lit(0.5)
                )
                / F.lit(1000000)
            ).alias("acf"),
        )
        .select(
            "lag_h", "n_pairs", "sx", "sy", "sxx", "syy", "sxy", "acf"
        )
    )


@register(
    "q_ts_stl_residuals",
    oracle="""
    WITH hr AS (
      SELECT date_trunc('hour', ts) AS slot,
             CAST(count(*) AS BIGINT) AS n_h
      FROM events GROUP BY 1
    ),
    keyed AS (
      SELECT slot, n_h,
             EXTRACT(hour FROM slot) AS hod,
             (EXTRACT(isodow FROM slot) - 1) >= 5 AS is_weekend
      FROM hr
    ),
    cell AS (
      SELECT hod, is_weekend,
             CAST(sum(n_h) AS BIGINT) AS cell_total,
             CAST(count(*) AS BIGINT) AS cell_slots
      FROM keyed GROUP BY hod, is_weekend
    )
    SELECT k.slot AS slot_hour,
           CAST(k.hod AS BIGINT) AS hod,
           k.is_weekend,
           k.n_h,
           c.cell_total, c.cell_slots,
           CAST(k.n_h * 1000000 * c.cell_slots // c.cell_total
                AS BIGINT) AS residual_ppm
    FROM keyed k
    JOIN cell c ON c.hod = k.hod AND c.is_weekend = k.is_weekend
    ORDER BY abs(k.n_h * 1000000 * c.cell_slots // c.cell_total
                 - 1000000) DESC, k.slot
    LIMIT 5
    """,
    tier="P1",
    doc="Deseasonalized anomaly scan — the residual step of the "
    "STL-lite decomposition q_ts_seasonality_profile opens: each "
    "hour slot's event count is divided by its calendar cell's "
    "(hour-of-day x weekend) expected count, and the top-5 most "
    "anomalous slots by |residual - 1| are reported — the 'this "
    "hour was 3x its normal self' alert that a raw z-score misses "
    "when the baseline itself is periodic. Determinism recipe: the "
    "residual is the EXACT integer n_h*1e6*cell_slots div "
    "cell_total (Spark div == DuckDB //), so ranking and "
    "tie-breaking (slot asc) never touch a float. Plan: one "
    "map-side hourly rollup over raw events, a 48-cell broadcast "
    "join, TakeOrdered(5) — raw events are touched once.",
)
def q_ts_stl_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hr = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("slot")).agg(
        F.count(F.lit(1)).alias("n_h")
    )
    keyed = hr.select(
        "slot",
        "n_h",
        F.hour("slot").cast("long").alias("hod"),
        (F.weekday("slot") >= 5).alias("is_weekend"),
    )
    cell = keyed.groupBy("hod", "is_weekend").agg(
        F.sum("n_h").alias("cell_total"),
        F.count(F.lit(1)).alias("cell_slots"),
    )
    j = keyed.join(F.broadcast(cell), ["hod", "is_weekend"])
    residual = F.expr("n_h * 1000000 * cell_slots div cell_total")
    return (
        j.select(
            F.col("slot").alias("slot_hour"),
            "hod",
            "is_weekend",
            "n_h",
            "cell_total",
            "cell_slots",
            residual.cast("long").alias("residual_ppm"),
        )
        .orderBy(
            F.abs(F.col("residual_ppm") - F.lit(1000000)).desc(),
            F.asc("slot_hour"),
        )
        .limit(5)
    )


@register(
    "q_win_bollinger_breakouts",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
                  AS BIGINT) AS dollars
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT day, dollars,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             CAST(sum(dollars) OVER (w ROWS BETWEEN 6 PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS s7,
             CAST(sum(dollars * dollars) OVER (w ROWS BETWEEN
                                               6 PRECEDING
                                               AND CURRENT ROW)
                  AS BIGINT) AS q7
      FROM d
      WINDOW w AS (ORDER BY day)
    ),
    b AS (
      SELECT day, dollars, s7, q7,
             CAST(s7 AS DOUBLE) / 7 AS mu,
             sqrt(CAST(q7 AS DOUBLE) / 7
                  - (CAST(s7 AS DOUBLE) / 7)
                    * (CAST(s7 AS DOUBLE) / 7)) AS sigma
      FROM r WHERE rn >= 7
    )
    SELECT day, dollars,
           floor(mu * 100 + 0.5) / 100 AS mean7,
           floor(sigma * 100 + 0.5) / 100 AS sigma7,
           dollars > mu + 2 * sigma AS breakout_up
    FROM b
    WHERE dollars > mu + 2 * sigma OR dollars < mu - 2 * sigma
    ORDER BY day
    """,
    tier="P1",
    doc="Bollinger-band breakout detection on the daily revenue "
    "series — the rolling mean +/- 2 sigma channel (7-day window) "
    "with the days that pierce it, the volatility-aware alternative "
    "to a fixed threshold alert. Determinism recipe: the rolling "
    "first/second moments are EXACT int64 window sums over integer "
    "cents (never a streaming float variance), so mu/sigma are the "
    "identical IEEE divide/sqrt chain on both engines and the "
    "band comparison is deterministic; rows before the 7th day are "
    "excluded (partial windows would make sigma ill-defined). "
    "Plan: map-side daily rollup over raw orders, then one ordered "
    "window over |days| rows — the raw table is touched once, the "
    "window state is 7 int64 pairs however large the fact table.",
)
def q_win_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.helpers import int_units
    from ..sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(int_units("o_totalprice", 0)).alias("dollars")
    )
    w = Window.orderBy("day")
    w7 = w.rowsBetween(-6, 0)
    r = d.select(
        "day",
        "dollars",
        F.row_number().over(w).alias("rn"),
        F.sum("dollars").over(w7).alias("s7"),
        F.sum(F.col("dollars") * F.col("dollars")).over(w7).alias("q7"),
    ).where(F.col("rn") >= 7)
    mu = F.col("s7").cast("double") / F.lit(7)
    sigma = F.sqrt(
        F.col("q7").cast("double") / F.lit(7) - mu * mu
    )

    def r2d(x):
        return F.floor(x * F.lit(100) + F.lit(0.5)) / F.lit(100)

    return (
        r.where(
            (F.col("dollars") > mu + F.lit(2) * sigma)
            | (F.col("dollars") < mu - F.lit(2) * sigma)
        )
        .select(
            "day",
            "dollars",
            r2d(mu).alias("mean7"),
            r2d(sigma).alias("sigma7"),
            (F.col("dollars") > mu + F.lit(2) * sigma).alias("breakout_up"),
        )
        .orderBy("day")
    )
