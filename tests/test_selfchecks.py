"""Quantitative self-checks for rows-only operators (no cross-engine
oracle exists; SURVEY §5.2 prescribes these instead)."""

from __future__ import annotations

from sd2_drp_experimentgen_spark.plans import all_specs
from tests.conftest import SF_T2


def test_approx_distinct_within_5pct(spark):
    row = all_specs()["q_agg_approx_distinct"].fn(spark, SF_T2).collect()[0]
    approx, exact = row["approx_orders"], row["exact_orders"]
    assert exact > 0
    assert abs(approx - exact) / exact < 0.05
