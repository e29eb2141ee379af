"""Local pre-verifier — replicates the driver's t2 correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet directory, then compares:
  1. row count
  2. column names (sorted — the driver sorts columns before hashing)
  3. values, order-insensitively (rows canonicalized and sorted)

Never declare a query the pre-verifier hasn't passed (SURVEY §7.2 risk
#1). Usage:

    python tools/verify_local.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from sd2_drp_experimentgen_spark.schemas import TABLE_NAMES  # noqa: E402
from sd2_drp_experimentgen_spark.session import get_spark  # noqa: E402
from sd2_drp_experimentgen_spark.plans import all_specs  # noqa: E402


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # multi-file table (e.g. scale-study builds)
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


class NonScalarCell(TypeError):
    """A container-typed cell the driver's canonicalizer cannot hash.

    The driver canonicalizes with pandas ``sort_values`` →
    ``Categorical`` factorize, which raises ``TypeError: unhashable
    type`` on list/dict/ndarray cells (CORRECTNESS_r02.json,
    q_agg_collect_sets). The pre-verifier must therefore REJECT such
    cells rather than stringify them — otherwise local green is not
    proof of driver green (VERDICT r2 "what's wrong" #2). String-encode
    containers in the query itself (concat_ws / to_json) instead.
    """


_CONTAINER_TYPES = (list, tuple, set, dict, bytearray)


def canon_value(v):
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return "NULL"
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        # numpy scalar from the pandas path — unwrap to the Python
        # scalar FIRST so bool/int/float take the same branches as the
        # Spark side (np.bool_ would otherwise stringify as "True").
        v = v.item()
        if v is None:
            return "NULL"
    if isinstance(v, _CONTAINER_TYPES) or type(v).__name__ == "ndarray":
        raise NonScalarCell(
            f"non-scalar cell {type(v).__name__!r}: the driver's pandas "
            "canonicalizer would crash on this — string-encode the column"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full-precision shortest repr: at least as strict as any hash the
        # driver computes — a pass here implies bit-identical doubles
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    if hasattr(v, "isoformat"):  # datetime/date
        s = v.isoformat()
        # DATE columns are asymmetric under pandas materialization:
        # Spark keeps datetime.date ('1999-04-01') while DuckDB DATE
        # becomes a midnight datetime64 ('1999-04-01T00:00:00').  The
        # driver compares these equal (q_date_funcs/q_join_asof were
        # driver-green r1/r4), so fold exact-midnight naive timestamps
        # to the bare date.  Symmetric for genuine midnight timestamps.
        if s.endswith("T00:00:00"):
            s = s[: -len("T00:00:00")]
        return s
    return str(v)


def canon_rows(cols, rows):
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def container_cols(schema) -> list[str]:
    """Names of output columns the driver canonicalizer cannot hash.

    Array/Map/Struct-typed result columns crash the driver's
    pandas-based canonicalizer even when values match (r2's
    q_agg_collect_sets row). Every hash-oracled query must emit a
    scalar-only schema; this is the plan-level guard (catches the
    problem even when the sampled result happens to be empty).
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def compare(name, spark_df, duck_rel) -> tuple[bool, str]:
    """Driver-faithful compare: the DuckDB side goes THROUGH PANDAS.

    The driver canonicalizes the oracle result via ``rel.df()`` — pandas
    — where DuckDB HUGEINT/DECIMAL columns materialize as float64
    (``12056.0``), while a ``fetchall()`` path returns exact Python ints
    and hides the loss.  That gap is exactly why q_graph_pagerank and
    q_sink_json_spec passed this tool and failed the driver in r3/r4
    (VERDICT r4 "what's wrong" #3).  Replicating the pandas
    materialization here makes local green imply driver green again.
    """
    import pandas as pd

    bad = container_cols(spark_df.schema)
    if bad:
        return False, (
            f"DRIVER-INCOMPATIBLE schema: container-typed output columns {bad} "
            "— string-encode (concat_ws / to_json) before returning"
        )
    # Spark side ALSO goes through pandas: a NULL-bearing int64 column
    # widens to float64 on BOTH sides under the driver (evidence:
    # q_win_lag_lead's nullable gap_s hash-passed r4), so collect()-exact
    # Spark values against pandas-widened oracle values would flag false
    # FAILs on every nullable-int query.  Symmetric widening is the
    # driver contract; only the *asymmetric* HUGEINT/DECIMAL loss (cast
    # rule #11) is a real divergence.
    s_pdf = spark_df.toPandas()
    s_cols = list(s_pdf.columns)
    s_rows = [
        tuple(
            None
            if v is pd.NaT or (isinstance(v, float) and v != v)
            else v
            for v in row
        )
        for row in s_pdf.itertuples(index=False, name=None)
    ]

    duck_pdf = duck_rel.df()  # pandas materialization == driver behavior
    d_cols = list(duck_pdf.columns)
    # SQL NULLs surface as NaN (numeric) / NaT (datetime) after pandas
    # materialization; map those back to None so they compare equal to
    # Spark's None.  Genuine NaN *values* in oracle output are folded
    # too — acceptable: oracles are deterministic SQL and the repo
    # convention forbids NaN-valued result cells.  Crucially this does
    # NOT undo the float64 widening of non-null cells, which is the
    # driver behavior this path exists to surface.
    d_rows = [
        tuple(
            None
            if v is pd.NaT or (isinstance(v, float) and v != v)
            else v
            for v in row
        )
        for row in duck_pdf.itertuples(index=False, name=None)
    ]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    try:
        _, s_canon = canon_rows(s_cols, s_rows)
        _, d_canon = canon_rows(d_cols, d_rows)
    except NonScalarCell as e:
        return False, f"DRIVER-INCOMPATIBLE: {e}"
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ]
        sample = diffs[:3]
        return False, f"{len(diffs)}/{len(s_canon)} rows differ; sample: {sample}"
    return True, f"{len(s_rows)} rows"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--driver-window",
        type=int,
        nargs="?",
        const=50,
        default=None,
        metavar="N",
        help="verify exactly the first N queries in all_specs() priority "
        "order (default 50) — the sample the driver will take next round",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from sd2_drp_experimentgen_spark.sources.preflight import (
        assert_fixture_schemas,
        fixture_fingerprint,
    )

    # Drift tripwire: one clear message instead of 47 opaque crashes
    # (VERDICT r3). The fingerprint guards against a MID-RUN fixture
    # regeneration silently making Spark and DuckDB read different file
    # generations (the likely cause of r3's spurious pagerank hash-fail).
    assert_fixture_schemas(args.sf_dir)
    fp0 = fixture_fingerprint(args.sf_dir)

    specs = all_specs()
    if args.driver_window:
        names = list(specs)[: args.driver_window]  # priority order
    else:
        names = args.names or sorted(specs)
    spark = get_spark(shuffle_partitions=8)
    con = duck_connect(args.sf_dir)

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, args.sf_dir)
            if spec.oracle is None:
                cnt = df.count()
                n_rows_only += 1
                print(f"ROWS-ONLY {name}: {cnt} rows ({time.time()-t0:.2f}s)")
                continue
            ok, msg = compare(name, df, con.sql(spec.oracle))
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(e).__name__}: {e}"
        finally:
            from sd2_drp_experimentgen_spark.functions.helpers import (
                release_persisted,
            )

            release_persisted()  # drop tracked caches between queries
        dt = time.time() - t0
        if ok:
            n_pass += 1
            print(f"PASS {name}: {msg} ({dt:.2f}s)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg} ({dt:.2f}s)")
    if fixture_fingerprint(args.sf_dir) != fp0:
        print(
            "\nWARNING: fixture files CHANGED during this verify run — "
            "Spark and DuckDB may have read different file generations; "
            "re-run before trusting any FAIL above."
        )
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
