"""Crash-replay semantics of the bookmark-incremental batch operator.

The oracle-parity test proves two clean runs cover the table exactly
once; this test pins the CRASH path: a replay of a run whose output
committed but whose bookmark never advanced must overwrite its own
run-keyed partition, not append a duplicate — totals stay exact.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from tests.conftest import SF_T1


def test_replay_after_crash_is_idempotent(spark):
    from sd2_drp_experimentgen_spark.operators import etl
    from sd2_drp_experimentgen_spark.plans import all_specs
    from sd2_drp_experimentgen_spark.sources.tables import load_events

    # Clean two-run execution stages the scratch layout.
    result = all_specs()["q_etl_incremental_bookmark"].fn(spark, SF_T1)
    expected = {r["day_start"]: r["n"] for r in result.collect()}

    base = os.path.abspath(
        os.path.join(
            os.path.dirname(etl.__file__), "..", "..", ".scratch",
            "incr_bookmark_sf0.001",
        )
    )
    src, out, bm = (os.path.join(base, d) for d in ("src", "out", "bm"))

    # Simulate the crash: run 2's output committed, bookmark still at
    # run 1's value (max ts of the early file). Replay run 2.
    early = pq.read_table(os.path.join(src, "0_early.parquet"))
    spark.createDataFrame(
        [(max(early["ts"].to_pylist()),)], "bm_ts timestamp"
    ).write.mode("overwrite").parquet(bm)
    etl._incremental_phase(spark, src, out, bm)

    replayed = {
        r["day_start"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("day_start")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert replayed == expected, "replay duplicated or dropped partials"

    # And the full-table invariant still holds.
    full = {
        r["day_start"]: r["n"]
        for r in load_events(spark, SF_T1)
        .groupBy(F.date_trunc("DAY", F.col("ts")).cast("long").alias("day_start"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert replayed == full
