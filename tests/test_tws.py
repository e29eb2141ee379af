"""transformWithStateInPandas coverage (Spark 4 StatefulProcessor).

The API's Python runner requires google.protobuf for its state-server
protocol; this container does not ship it, so the LIVE test skips and
the operator registers itself only where the dependency exists. The
registration-gating behavior itself is pinned unconditionally.
"""

from __future__ import annotations

import pytest

from sd2_drp_experimentgen_spark.plans import all_specs

all_specs()  # load operator modules in registry order before direct import
from sd2_drp_experimentgen_spark.operators import streaming_ops  # noqa: E402
from tests.conftest import SF_T1  # noqa: E402


def test_tws_registration_matches_protobuf_presence():
    assert ("q_stream_tws_totals" in all_specs()) == (
        streaming_ops._has_protobuf()
    )


@pytest.mark.skipif(
    not streaming_ops._has_protobuf(),
    reason="google.protobuf missing: transformWithStateInPandas "
    "state-server protocol unavailable in this environment",
)
def test_tws_totals_equal_batch(spark):
    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.sources.tables import load_events

    got = {
        r["user_id"]: (r["n_events"], r["sum_cents"])
        for r in streaming_ops._q_stream_tws_totals(spark, SF_T1).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["sum_cents"])
        for r in load_events(spark, SF_T1)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
        )
        .collect()
    }
    assert got == want
