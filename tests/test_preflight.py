"""Fixture-drift tripwire tests (VERDICT r3 item 3).

The driver regenerates the fixture parquet between rounds and has
already changed a physical encoding once (events.ts NANOS->MICROS,
which silently broke 47 operators). These tests pin that:
  1. the CURRENT fixtures pass the preflight (if this fails, fixtures
     drifted again — fix schemas.py/loaders, everything else is noise);
  2. a genuinely drifted table produces one actionable message;
  3. both historical events.ts encodings are accepted.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sd2_drp_experimentgen_spark.sources.preflight import (
    assert_fixture_schemas,
    check_fixture_schemas,
    fixture_fingerprint,
)
from tests.conftest import SF_T1


def test_current_fixtures_pass_preflight():
    assert check_fixture_schemas(SF_T1) == []
    assert_fixture_schemas(SF_T1)  # must not raise


def test_drifted_column_type_trips(tmp_path):
    import shutil

    from sd2_drp_experimentgen_spark.schemas import TABLE_NAMES

    for name in TABLE_NAMES:
        shutil.copy(f"{SF_T1}/{name}.parquet", tmp_path / f"{name}.parquet")
    # regenerate 'region' with r_regionkey as string -> family drift
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(["0", "1"], pa.string()),
                "r_name": pa.array(["A", "B"], pa.string()),
            }
        ),
        tmp_path / "region.parquet",
    )
    problems = check_fixture_schemas(str(tmp_path))
    assert len(problems) == 1
    assert "r_regionkey" in problems[0]
    with pytest.raises(RuntimeError, match="FIXTURE DRIFT"):
        assert_fixture_schemas(str(tmp_path))


def test_renamed_column_trips(tmp_path):
    import shutil

    from sd2_drp_experimentgen_spark.schemas import TABLE_NAMES

    for name in TABLE_NAMES:
        shutil.copy(f"{SF_T1}/{name}.parquet", tmp_path / f"{name}.parquet")
    pq.write_table(
        pa.table({"r_key": pa.array([0], pa.int32()),
                  "r_name": pa.array(["A"], pa.string())}),
        tmp_path / "region.parquet",
    )
    problems = check_fixture_schemas(str(tmp_path))
    assert len(problems) == 1 and "column names drifted" in problems[0]


@pytest.mark.parametrize("unit", ["ns", "us", "ms", "s"])
def test_events_ts_any_timestamp_unit_ok(tmp_path, unit):
    import shutil

    from sd2_drp_experimentgen_spark.schemas import TABLE_NAMES

    for name in TABLE_NAMES:
        shutil.copy(f"{SF_T1}/{name}.parquet", tmp_path / f"{name}.parquet")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array([1_700_000_000], pa.timestamp(unit)),
                "user_id": pa.array([1], pa.int64()),
                "event_type": pa.array(["x"], pa.string()),
                "value": pa.array([1.0], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            }
        ),
        tmp_path / "events.parquet",
        version="2.6",
    )
    assert check_fixture_schemas(str(tmp_path)) == []


def test_fingerprint_detects_rewrite(tmp_path):
    import shutil

    from sd2_drp_experimentgen_spark.schemas import TABLE_NAMES

    for name in TABLE_NAMES:
        shutil.copy(f"{SF_T1}/{name}.parquet", tmp_path / f"{name}.parquet")
    fp0 = fixture_fingerprint(str(tmp_path))
    tbl = pq.read_table(tmp_path / "region.parquet")
    pq.write_table(tbl.slice(0, 1), tmp_path / "region.parquet")
    assert fixture_fingerprint(str(tmp_path)) != fp0
