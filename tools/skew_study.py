"""Skew stress study — measures what the salting patterns buy.

Builds a deliberately skewed copy of the x32 events (half of all rows
collapse onto user_id 0 — the null-bucket/bot-traffic shape), then
times the naive vs salted plan for the two shapes AQE cannot fix:

  1. hot-key AGGREGATION (AQE skew handling only splits join
     partitions): plain groupBy(user) vs 16-salt two-stage merge
  2. hot-key SHUFFLE JOIN where the build side must not broadcast:
     plain shuffled-hash join vs (key, salt) join against a
     salt-exploded dimension

Both variants assert identical results before timing — the salt must
never change the answer. Requires the x32 scale_study build
(python tools/scale_study.py first).

    python tools/skew_study.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from sd2_drp_experimentgen_spark.session import get_spark  # noqa: E402
from tools.scale_study import scaled_dir  # noqa: E402

N_SALTS = 16


def build_skewed(spark) -> str:
    src = os.path.join(scaled_dir(32), "events.parquet")
    out = os.path.join(scaled_dir(32), "events_skewed.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ev = spark.read.parquet(src)
        skewed = ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % 2 == 0, F.lit(0)).otherwise(
                F.col("user_id")
            ),
        )
        skewed.write.mode("overwrite").parquet(out)
    return out


def timed(label: str, fn, runs: int = 2) -> float:
    fn()  # warm-up
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.2f}s", flush=True)
    return round(best, 2)


def main() -> int:
    spark = get_spark(app_name="sd2drp-skew-study", shuffle_partitions=32)
    # isolate from AQE partition coalescing so the naive plans show
    # their true skew cost (production would have AQE on; it does NOT
    # split skewed aggregations or hash joins, which is the point)
    ev = spark.read.parquet(build_skewed(spark)).select(
        "user_id", "event_id", "value"
    )
    result = {}

    # --- 1b. HOLISTIC aggregation: exact percentile vs sketch --------
    # partial aggregation cannot combine a percentile's state, so the
    # hot key's full multiset lands in ONE task; the mergeable sketch
    # (approx_percentile) combines map-side like any sum
    def pct_exact():
        return (
            ev.groupBy("user_id")
            .agg(F.expr("percentile(value, 0.5)").alias("p50"))
            .agg(F.count(F.lit(1)))
            .collect()
        )

    def pct_sketch():
        return (
            ev.groupBy("user_id")
            .agg(F.expr("approx_percentile(value, 0.5, 1000)").alias("p50"))
            .agg(F.count(F.lit(1)))
            .collect()
        )

    result["pct_exact"] = timed("pct exact  ", pct_exact)
    result["pct_sketch"] = timed("pct sketch ", pct_sketch)

    # --- 1. hot-key aggregation -------------------------------------
    def agg_naive():
        return (
            ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .agg(F.count(F.lit(1)), F.sum("n"))
            .collect()
        )

    def agg_salted():
        salted = ev.withColumn(
            "salt", F.pmod(F.col("event_id"), F.lit(N_SALTS))
        )
        partial = salted.groupBy("user_id", "salt").agg(
            F.count(F.lit(1)).alias("pn"), F.sum("value").alias("ps")
        )
        return (
            partial.groupBy("user_id")
            .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
            .agg(F.count(F.lit(1)), F.sum("n"))
            .collect()
        )

    assert agg_naive() == agg_salted(), "salting changed the aggregate"
    result["agg_naive"] = timed("agg naive  ", agg_naive)
    result["agg_salted"] = timed("agg salted ", agg_salted)

    # --- 2. hot-key shuffle join (broadcast disallowed) ---------------
    cust = spark.range(0, 200_000).select(
        F.col("id").alias("c_id"), (F.col("id") % 5).alias("seg")
    )

    def join_naive():
        return (
            ev.hint("shuffle_hash")
            .join(cust, ev.user_id == cust.c_id)
            .groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    def join_salted():
        salted_fact = ev.withColumn(
            "salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)).cast("int")
        )
        salted_dim = cust.withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)]))
        )
        return (
            salted_fact.hint("shuffle_hash")
            .join(
                salted_dim,
                (salted_fact.user_id == salted_dim.c_id)
                & (salted_fact.salt == salted_dim.salt),
            )
            .groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    assert sorted(map(tuple, join_naive())) == sorted(
        map(tuple, join_salted())
    ), "salting changed the join"
    result["join_aqe"] = timed("join naive (AQE skew-split on) ", join_naive)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        result["join_noaqe"] = timed(
            "join naive (AQE skew-split OFF)", join_naive
        )
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    result["join_salted"] = timed("join salted                    ", join_salted)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
