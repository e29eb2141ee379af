"""Static oracle result-type guard — no Spark needed.

The driver hashes BOTH sides through pandas (``rel.df()``).  DuckDB
widens integer SUMs (and some integer expressions) to ``HUGEINT``, and
pandas has no 128-bit integer dtype, so a HUGEINT result column
materializes as **float64** (``12056.0``) while Spark's column stays
int64 (``12056``) — the canonicalized strings differ and the hash
check fails *every time that oracle is sampled*, even though
``fetchall()`` (exact Python ints) agrees.  This is determinism rule
#11 (SURVEY §5.3): oracle result columns must never be
HUGEINT/UHUGEINT/DECIMAL — wrap integer aggregates in
``CAST(... AS BIGINT)``.

This sweep plans every registered oracle against the sf0.001 views
(planning only — ``.types`` needs no execution for most shapes) and
fails the build on any forbidden result dtype, turning the whole
r4-diagnosed failure class (42 affected oracles: VERDICT r4 "what's
wrong" #1) into a compile-time error.  Mirror of the container-cell
guard that closed the r2 collect_set class (verify_local.container_cols).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from sd2_drp_experimentgen_spark.plans import all_specs
from sd2_drp_experimentgen_spark.schemas import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

FORBIDDEN = ("HUGEINT", "UHUGEINT")
FORBIDDEN_PREFIX = ("DECIMAL",)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _bad_cols(con, oracle: str) -> list[tuple[str, str]]:
    rel = con.sql(oracle)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) in FORBIDDEN or str(t).startswith(FORBIDDEN_PREFIX)
    ]


def test_no_hugeint_or_decimal_oracle_columns(con):
    offenders = {}
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        try:
            bad = _bad_cols(con, spec.oracle)
        except Exception as e:  # noqa: BLE001 — planning failure = separate test
            pytest.fail(f"oracle for {name} failed to plan: {e}")
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with pandas-lossy result dtypes (driver hash-fail "
        f"guaranteed on sample) — wrap in CAST(... AS BIGINT): {offenders}"
    )
