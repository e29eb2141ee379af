from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_T1 = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from sd2_drp_experimentgen_spark.session import get_spark

    s = get_spark(app_name="sd2drp-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck_t1():
    import duckdb

    from sd2_drp_experimentgen_spark.schemas import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_T1}/{t}.parquet')"
        )
    yield con
