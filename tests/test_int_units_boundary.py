"""Spark-side int_units / exact_sum at the documented headroom
boundary (VERDICT r10 item 7).

tests/test_property_helpers.py pins DuckDB's ``sql_units`` to the
Python-IEEE reference with hypothesis, including the last decade below
2^53. This file closes the triangle with a real SparkSession: one
fixed adversarial batch of boundary-magnitude doubles (~9e11 per-row
at scale 4, units in [8e15, 2^53)) flows through Spark's
``int_units``/``exact_sum`` AND DuckDB's ``sql_units``/
``sql_exact_sum``, and the outputs must agree bit-for-bit. The batch
is fixed (not hypothesis) because each Spark job costs ~1 s — the
random search happens engine-free in the property file; this check
proves the THIRD engine takes the same IEEE branches on the found
regime.
"""

from __future__ import annotations

import math

import duckdb

from sd2_drp_experimentgen_spark.functions.helpers import (
    exact_sum,
    int_units,
    sql_exact_sum,
    sql_units,
)

TWO53 = 2**53  # 9_007_199_254_740_992

# Boundary batch: per-row |x| ~9e11 at scale 4 → x*1e4 in [8e15, 2^53),
# where double ulp is exactly 1.0 so "+ 0.5" is a round-half-even
# event. Lattice points (x*1e4 integer-exact), half-ulp perturbations,
# both signs, plus the docstring's quoted 1e14-unit headroom point.
BOUNDARY = [
    (TWO53 - 1) / 1e4,          # max exactly-representable unit count
    (TWO53 - 2) / 1e4,
    (TWO53 - 3) / 1e4,
    8.0e11,                      # decade floor of the edge regime
    8.999999999e11,
    9.0071992547e11,             # just under the 2^53 unit ceiling
    1.0e10,                      # docstring's 1e14-unit headroom claim
    123456789012.3456,           # arbitrary near-edge with fraction
    876543210987.6543,
    (8_000_000_000_000_001) / 1e4,
    (9_000_000_000_000_000) / 1e4,
    (9_007_199_254_740_000) / 1e4,
]
BOUNDARY += [-x for x in BOUNDARY]


def test_spark_int_units_matches_duckdb_and_python(spark):
    rows = [(i, float(x)) for i, x in enumerate(BOUNDARY)]
    sdf = spark.createDataFrame(rows, "i int, x double")
    got_spark = [
        r["u"]
        for r in sdf.select("i", int_units("x").alias("u"))
        .orderBy("i")
        .collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_units('x')} FROM t ORDER BY i"
        ).fetchall()
    ]

    want = [int(math.floor(x * 10_000 + 0.5)) for x in BOUNDARY]
    assert got_spark == want, "Spark int_units diverged from Python IEEE"
    assert got_duck == want, "DuckDB sql_units diverged from Python IEEE"
    # Window check, with the one honest edge this test itself found:
    # x=(2^53-1)/1e4 round-trips to units 2^53-1 exactly, but "+0.5"
    # creates the tie ...991.5 which round-half-even bumps UP to
    # exactly 2^53 before floor. The NEGATIVE twin does not mirror it
    # (-...991 + 0.5 = -...990.5, ties-to-even rounds toward zero
    # there), so exactly ONE batch member lands on the 2^53 rim — and
    # all engines take the identical branch (asserted above). The
    # recipe's real guarantee is |u| <= 2^53, exact for |u| < 2^53;
    # every money column sits orders of magnitude inside (~1e9 units
    # at sf1, ~1e14 at the docstring's quoted headroom).
    assert all(abs(u) <= TWO53 for u in want)
    assert [u for u in want if abs(u) == TWO53] == [TWO53]


def test_spark_exact_sum_matches_duckdb_at_boundary(spark):
    # The SUM of boundary units crosses int64 comfort but not
    # decimal(38,0)/HUGEINT; both engines must end at the identical
    # double after the same two final IEEE roundings.
    rows = [(i % 3, float(x)) for i, x in enumerate(BOUNDARY)]
    sdf = spark.createDataFrame(rows, "g int, x double")
    got_spark = {
        r["g"]: r["s"]
        for r in sdf.groupBy("g").agg(exact_sum("x").alias("s")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got_duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT g, {sql_exact_sum('x')} AS s FROM t GROUP BY g"
        ).fetchall()
    }
    assert set(got_spark) == set(got_duck)
    for g in got_spark:
        assert got_spark[g] == got_duck[g], (
            f"group {g}: Spark {got_spark[g]!r} != DuckDB {got_duck[g]!r}"
        )
