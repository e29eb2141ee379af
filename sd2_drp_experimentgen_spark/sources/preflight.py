"""Fixture-drift tripwire.

Round 3 was lost to a silent fixture regeneration: ``events.parquet``
changed its ``ts`` encoding from TIMESTAMP(NANOS) to TIMESTAMP(MICROS)
and 47 operators crashed with an opaque analysis error while all tests
pointed elsewhere. This module turns any future drift into ONE clear
failure message before a single query runs.

``check_fixture_schemas`` reads only parquet footers (pyarrow,
driver-side, no Spark session, no data IO) and compares every fixture
table against the engine's normative schema constants
(:mod:`..schemas`). The comparison is family-level (int / float /
string / timestamp / list<...>), not exact-physical-type, because the
engine's loaders are deliberately tolerant of encoding changes within a
family — ``events.ts`` in particular accepts any timestamp unit plus
the int64 nanos-as-long generation (see sources.tables).

Hooked into: ``bench.py`` (preflight), ``tools/verify_local.py``
(preflight + mid-run drift re-check), and ``tests/test_preflight.py``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from ..schemas import TABLE_NAMES, TABLES


def _arrow_family(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "timestamp"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_family(t.value_type)}>"
    return str(t)


def _spark_family(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "timestamp"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_family(dt.elementType)}>"
    return dt.simpleString()


def check_fixture_schemas(sf_dir: str) -> list[str]:
    """Return a list of drift problems ([] = fixtures match expectations).

    Footer metadata only; safe to call at every entry point.
    """
    problems: list[str] = []
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        try:
            sch = pq.read_schema(path)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: cannot read parquet footer: {e}")
            continue
        exp = TABLES[name]
        got_names = [f.name for f in sch]
        exp_names = [f.name for f in exp.fields]
        if got_names != exp_names:
            problems.append(
                f"{name}: column names drifted — file has {got_names}, "
                f"engine expects {exp_names}"
            )
            continue
        for field, exp_field in zip(sch, exp.fields):
            got_fam = _arrow_family(field.type)
            if name == "events" and field.name == "ts":
                # Any timestamp unit OR raw int64 (the nanos-as-long
                # generation) — load_events adapts to all of these.
                if got_fam in ("timestamp", "int"):
                    continue
                problems.append(
                    f"events.ts: unsupported encoding {field.type!r} — "
                    "load_events handles timestamp[ns/us/ms/s] and int64 "
                    "only; extend sources.tables.normalize_events_ts"
                )
                continue
            exp_fam = _spark_family(exp_field.dataType)
            if got_fam != exp_fam:
                problems.append(
                    f"{name}.{field.name}: type family drifted — file has "
                    f"{field.type!r} ({got_fam}), engine expects "
                    f"{exp_field.dataType.simpleString()} ({exp_fam})"
                )
    return problems


def assert_fixture_schemas(sf_dir: str) -> None:
    """Raise one aggregated, actionable error if the fixtures drifted."""
    problems = check_fixture_schemas(sf_dir)
    if problems:
        raise RuntimeError(
            "FIXTURE DRIFT DETECTED in "
            + sf_dir
            + " — the driver regenerated the test parquet with a schema "
            "the engine does not expect. Update "
            "sd2_drp_experimentgen_spark/schemas.py (and the adaptive "
            "loaders in sources/tables.py if the events ts encoding "
            "changed) before trusting any query result.\n  - "
            + "\n  - ".join(problems)
        )


def fixture_fingerprint(sf_dir: str) -> dict[str, tuple[int, int]]:
    """(size, mtime_ns) per fixture file — for detecting a regeneration
    that happens *mid-run* (the likely cause of r3's spurious
    q_graph_pagerank hash-fail: Spark and DuckDB read different file
    generations across the 19:00 fixture swap)."""
    import os

    out: dict[str, tuple[int, int]] = {}
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        try:
            st = os.stat(path)
            out[name] = (st.st_size, st.st_mtime_ns)
        except OSError:
            out[name] = (-1, -1)
    return out
