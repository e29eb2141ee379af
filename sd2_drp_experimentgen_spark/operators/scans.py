"""Scans / sources / sinks — SURVEY §2.1.

Reference analog: spreadsheet/CSV ingest of chemical-inventory and run
tables. Spark-first shape: lazy parquet scans with projection/filter
expressed declaratively so Catalyst pushes both into the vectorized
reader (check: `.explain` shows ReadSchema with only the selected
columns and PushedFilters for the predicates — at 100 TB this is the
difference between scanning 4 columns and scanning the table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import (
    _round_halfup,
    exact_sum,
    int_units,
    sql_exact_sum,
    sql_r,
)
from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
    tier="P0",
    doc="Parquet scan + 4-column projection of lineitem (column pruning).",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "q_scan_prune_filter",
    oracle="""
    SELECT p_partkey, p_name, p_size
    FROM part
    WHERE p_size > 25
    """,
    tier="P0",
    doc="Projection + filter exercising pushdown into the parquet scan.",
)
def q_scan_prune_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") > 25)
        .select("p_partkey", "p_name", "p_size")
    )


def _scratch(sf_dir: str, name: str) -> str:
    """Per-sf scratch dir for sink round-trips (inside the repo, git-ignored)."""
    import os

    sf_tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", ".scratch", sf_tag, name
    )
    return os.path.abspath(path)


@register(
    "q_source_csv_roundtrip",
    oracle="""
    SELECT r_regionkey, r_name, n_nations
    FROM (
      SELECT r_regionkey, r_name,
             (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey)
               AS n_nations
      FROM region
    )
    """,
    tier="P1",
    doc="CSV sink + source round-trip: write region to CSV with header, "
    "read back with an EXPLICIT schema (engine policy: never infer), "
    "then join nation counts onto the re-read rows. The oracle sees "
    "only the final relation — identical iff the round-trip is "
    "lossless.",
)
def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import schemas

    path = _scratch(sf_dir, "csv_region")
    load_table(spark, sf_dir, "region").write.mode("overwrite").option(
        "header", True
    ).csv(path)
    back = spark.read.schema(schemas.REGION).option("header", True).csv(path)
    n = load_table(spark, sf_dir, "nation")
    counts = n.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n_nations"))
    return back.join(
        counts, back.r_regionkey == counts.n_regionkey, "left"
    ).select(
        "r_regionkey",
        "r_name",
        F.coalesce(F.col("n_nations"), F.lit(0)).alias("n_nations"),
    )


@register(
    "q_sink_json_spec",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_specs,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_price_cents,
           CAST(sum(n_lines) AS BIGINT) AS n_lines
    FROM orders
    JOIN (SELECT l_orderkey, count(*) AS n_lines
          FROM lineitem GROUP BY l_orderkey) li
      ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tier="P1",
    doc="Nested experiment-spec JSON export (the reference's spec "
    "document sink): one document per order with an array of line "
    "structs (struct + collect_list), written as JSON lines, read "
    "back with schema inference, then per-priority counts, the sum of "
    "PARSED TOTALPRICE (as per-row integer cents: a ~3k-term float64 "
    "sum's order-dependent error exceeds a 4dp rounding quantum at "
    "this magnitude, so money rides as integer cents — determinism "
    "rule #4), and nested-array sizes emitted — the hash check proves "
    "the nested payload (struct fields and array elements) survives "
    "the JSON round-trip bit-exact, not merely that documents exist. "
    "Doubles round-trip exactly through JSON shortest-repr "
    "serialization, so per-row cents agree exactly on both sides.",
)
def q_sink_json_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch(sf_dir, "json_specs")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(
        "l_orderkey",
        F.struct("l_linenumber", "l_quantity", "l_extendedprice").alias("line"),
    )
    specs = (
        o.join(lines, o.o_orderkey == lines.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_totalprice")
        .agg(F.sort_array(F.collect_list("line")).alias("lines"))
        .select(
            F.col("o_orderkey").alias("spec_id"),
            "o_orderpriority",
            F.struct("o_totalprice", "lines").alias("spec"),
        )
    )
    specs.write.mode("overwrite").json(path)
    back = spark.read.json(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_specs"),
        F.sum(int_units(F.col("spec.o_totalprice"), 2)).alias(
            "sum_price_cents"
        ),
        F.sum(F.size(F.col("spec.lines"))).alias("n_lines"),
    )


@register(
    "q_sink_parquet_partitioned",
    oracle="""
    SELECT l_returnflag, count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tier="P1",
    doc="Partitioned parquet sink (partitionBy l_returnflag) + re-read "
    "+ per-partition counts. At 100 TB this hive-style layout is what "
    "enables partition pruning on the read side (a filter on "
    "l_returnflag scans one directory, not the table).",
)
def q_sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch(sf_dir, "parquet_by_flag")
    li = load_table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_sink_pivot_wide",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error
    FROM events
    GROUP BY user_id
    """,
    tier="P1",
    doc="SIGNATURE end-to-end: the robot-file export written WIDE to an "
    "actual file sink. q_agg_conditional_pivot's one-column-per-"
    "category frame (the one-column-per-reagent analog) is written to "
    "CSV with header, read back with an EXPLICIT schema (never "
    "inferred), and the re-read relation is what the oracle hashes — "
    "identical iff the wide export round-trips losslessly, which is "
    "exactly the guarantee a robot-file consumer needs.",
)
def q_sink_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StructField, StructType

    from .aggregates import q_agg_conditional_pivot

    wide = q_agg_conditional_pivot(spark, sf_dir)
    path = _scratch(sf_dir, "csv_pivot_wide")
    wide.write.mode("overwrite").option("header", True).csv(path)
    back_schema = StructType(
        [StructField(c, LongType(), True) for c in wide.columns]
    )
    return spark.read.schema(back_schema).option("header", True).csv(path)


@register(
    "q_source_orc_roundtrip",
    oracle="""
    SELECT n_regionkey,
           CAST(count(*) AS BIGINT) AS n_nations,
           min(n_name) AS first_nation
    FROM nation
    GROUP BY n_regionkey
    """,
    tier="P1",
    doc="ORC sink + source round-trip (columnar format #2 beside "
    "parquet): write nation to ORC, read back with an explicit schema, "
    "aggregate per region. ORC shares parquet's pushdown/pruning in "
    "Spark's DSv2 reader; the oracle hashes the post-roundtrip "
    "relation, so lossless round-tripping is what passes.",
)
def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import schemas

    path = _scratch(sf_dir, "orc_nation")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").orc(path)
    back = spark.read.schema(schemas.NATION).orc(path)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_nation"),
    )


@register(
    "q_source_python_ds",
    oracle="""
    WITH readings AS (
      SELECT g AS reading_id,
             g % 37 AS sensor_id,
             g % 24 AS ts_hour,
             273150000 + (g * g * 2654435761) % 50000000 AS micro_kelvin
      FROM generate_series(0, 4999) AS t(g)
    )
    SELECT sensor_id,
           count(*) AS n_readings,
           CAST(min(micro_kelvin) AS BIGINT) AS min_mk,
           CAST(max(micro_kelvin) AS BIGINT) AS max_mk,
           CAST(sum(micro_kelvin) AS BIGINT) AS sum_mk
    FROM readings
    GROUP BY sensor_id
    """,
    tier="P1",
    doc="Custom connector through the Spark 4 Python Data Source API "
    "(sources/pyds.py): spark.read.format('sd2drp_sensors') with "
    "partition-parallel generation (8 InputPartitions -> 8 tasks), "
    "aggregated per sensor. The generator is pure integer arithmetic, "
    "so the SQL oracle over generate_series reproduces the connector's "
    "output exactly — the full custom-source path (registration, "
    "options, partition planning, executor-side read) is hash-checked.",
)
def q_source_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.pyds import SyntheticSensorDataSource, use_python_datasource

    use_python_datasource(spark, SyntheticSensorDataSource)
    df = (
        spark.read.format("sd2drp_sensors")
        .option("rows", 5000)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("sensor_id").agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.min("micro_kelvin").alias("min_mk"),
        F.max("micro_kelvin").alias("max_mk"),
        F.sum("micro_kelvin").alias("sum_mk"),
    )


MALFORMED_GOOD = [
    (1, "alpha", 10.5),
    (2, "beta", 20.25),
    (3, "gamma", 30.75),
    (4, "delta", 40.0),
]
MALFORMED_BAD = [
    "5,epsilon",          # missing column
    "six,zeta,60.5",      # non-integer id
    "7,eta,not_a_number", # non-numeric measure
]


def _malformed_oracle() -> str:
    rows = ",\n           ".join(
        f"({i}, '{s}', {v})" for i, s, v in MALFORMED_GOOD
    )
    return f"""
    SELECT kind, n, ids
    FROM (VALUES ('good', {len(MALFORMED_GOOD)},
                  '{",".join(str(i) for i, _, _ in MALFORMED_GOOD)}'),
                 ('corrupt', {len(MALFORMED_BAD)}, NULL))
         AS t(kind, n, ids)
    """


@register(
    "q_source_csv_malformed",
    oracle=_malformed_oracle(),
    tier="P1",
    doc="Malformed-row ingest policy: a CSV containing rows that "
    "violate the explicit schema is read in PERMISSIVE mode with "
    "columnNameOfCorruptRecord, so bad rows land in a quarantine "
    "column instead of killing the job or silently vanishing — the "
    "data-quality triage shape for 100 TB ingest (count and route "
    "rejects, never drop them blind). Emits good/corrupt counts plus "
    "the surviving ids; oracle is literal truth from the same "
    "generator. DROPMALFORMED/FAILFAST are one option away.",
)
def q_source_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    path = _scratch(sf_dir, "csv_malformed")
    os.makedirs(path, exist_ok=True)
    lines = [f"{i},{s},{v}" for i, s, v in MALFORMED_GOOD]
    lines += MALFORMED_BAD
    with open(os.path.join(path, "data.csv"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    schema = StructType(
        [
            StructField("id", IntegerType(), True),
            StructField("name", StringType(), True),
            StructField("measure", DoubleType(), True),
            StructField("_corrupt", StringType(), True),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    # single aggregate grouped on corruptness: one scan feeds both
    # output rows, so no cache is needed (the old two-branch union
    # cached the scan and leaked a pinned plan per invocation into the
    # shared session's storage memory — ADVICE r2, scans.py:346).
    # The collect guard references EVERY data column: CSV column
    # pruning only parses referenced columns, and an unparsed column's
    # errors never set _corrupt — an id-only aggregate would silently
    # pass rows whose measure is garbage.
    #
    # The no-op filter below pins the data columns into the scan's
    # referenced set. Without it, a downstream df.count() lets Catalyst
    # prune every aggregate input except the grouping key, leaving a
    # scan that references ONLY the corrupt-record column — which Spark
    # rejects outright (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Every CSV
    # row sets at least one of these fields (corrupt rows set _corrupt),
    # so the filter keeps all rows; Catalyst cannot fold it because
    # null-ness is data-dependent.
    df = df.filter(
        F.col("_corrupt").isNotNull()
        | F.col("id").isNotNull()
        | F.col("name").isNotNull()
        | F.col("measure").isNotNull()
    )
    all_parsed = F.col("name").isNotNull() & F.col("measure").isNotNull()
    return (
        df.groupBy(
            F.when(F.col("_corrupt").isNull(), "good")
            .otherwise("corrupt")
            .alias("kind")
        )
        .agg(
            F.count(F.lit(1)).cast("int").alias("n"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.when(all_parsed, F.col("id"))))
            ).alias("ids_raw"),
        )
        .select(
            "kind",
            "n",
            F.when(F.col("kind") == "good", F.col("ids_raw")).alias("ids"),
        )
    )


@register(
    "q_source_schema_evolution",
    oracle=f"""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ),
    v2 AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT coalesce(o_orderpriority, 'MISSING') AS prio,
           count(*) AS n,
           {sql_r(sql_exact_sum('o_totalprice'))} AS sum_price
    FROM (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM v1
      UNION ALL
      SELECT * FROM v2
    )
    GROUP BY 1
    """,
    tier="P1",
    doc="Parquet schema evolution: generation-1 files written WITHOUT "
    "the priority column, generation-2 files WITH it, read as one "
    "table via mergeSchema=true — old rows surface NULL for the added "
    "column (quarantined under 'MISSING'). The additive-column "
    "migration every long-lived lake table goes through; merge "
    "happens at footer level, no data rewrite.",
)
def q_source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "schema_evo")
    v1 = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(path + "/gen=1")
    v2.write.mode("overwrite").parquet(path + "/gen=2")
    back = spark.read.option("mergeSchema", True).parquet(
        path + "/gen=1", path + "/gen=2"
    )
    return back.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("MISSING")).alias("prio")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # exact_sum (r10): 6 priority groups over all orders — see
        # q_agg_groupby_q1
        _round_halfup(exact_sum("o_totalprice"), 4).alias("sum_price"),
    )


@register(
    "q_sink_python_ds",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    tier="P1",
    doc="Writer half of the Spark 4 Python Data Source API: the "
    "nation-region join written through the custom "
    "sd2drp_file_sink format — per-TASK partition-parallel write() on "
    "executors, driver-side commit() publishing a _SUCCESS manifest, "
    "abort() sweep (the two-phase commit contract under task "
    "retries) — then read back with an explicit schema and "
    "hash-checked against the original relation. Completes the "
    "connector story: batch read, streaming read, and now write all "
    "go through the same Python API.",
)
def q_sink_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..sources.pyds import SensorFileSinkDataSource, use_python_datasource

    use_python_datasource(spark, SensorFileSinkDataSource)

    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rel = n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )
    path = _scratch(sf_dir, "pyds_sink")
    shutil.rmtree(path, ignore_errors=True)
    (
        rel.repartition(3)
        .write.format("sd2drp_file_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("n_nationkey", IntegerType(), True),
            StructField("n_name", StringType(), True),
            StructField("r_name", StringType(), True),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("sep", "|")
        .option("pathGlobFilter", "part-*.psv")
        .csv(path)
    )


@register(
    "q_source_xml_roundtrip",
    oracle="""
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           min(s_name) AS first_supplier
    FROM supplier
    GROUP BY s_nationkey
    """,
    tier="P1",
    doc="XML sink + source round-trip (Spark 4 ships the XML connector "
    "built-in): write supplier to XML with explicit row/root tags, "
    "read back with an EXPLICIT schema (engine policy: never infer), "
    "aggregate per nation. Covers the remaining instrument/LIMS "
    "interchange format next to CSV/JSON/parquet/ORC/binary — robot "
    "and instrument vendors still speak XML. The oracle hashes the "
    "post-roundtrip relation, so lossless round-tripping is what "
    "passes.",
)
def q_source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    path = _scratch(sf_dir, "xml_supplier")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    (
        s.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "suppliers")
        .option("rowTag", "supplier")
        .save(path)
    )
    schema = StructType(
        [
            StructField("s_suppkey", LongType(), True),
            StructField("s_name", StringType(), True),
            StructField("s_nationkey", LongType(), True),
        ]
    )
    back = (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "supplier")
        .load(path)
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.min("s_name").alias("first_supplier"),
    )


@register(
    "q_source_text_roundtrip",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM documents
    GROUP BY lang
    """,
    tier="P2",
    doc="Line-oriented text source/sink round-trip — the log-file "
    "interchange format beside CSV/JSON/parquet/ORC/XML/binary: each "
    "document's (doc_id, lang, n_chars) is serialized to one "
    "tab-delimited line via the single-column text SINK, read back "
    "with spark.read.text (one 'value' row per line, schema-free by "
    "design), re-parsed with split() Column expressions, and "
    "aggregated per language. The oracle sees only the final "
    "relation — identical iff serialization, line splitting, and "
    "parsing are all lossless. At 100 TB this is the raw-log ingest "
    "path: text files split by line across tasks, parse cost is one "
    "projection, malformed lines routable exactly like the CSV "
    "quarantine.",
)
def q_source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch(sf_dir, "text_docs")
    d = load_table(spark, sf_dir, "documents")
    lines = d.select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            F.col("lang"),
            F.col("n_chars").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    parsed = back.select(
        F.element_at(parts, 1).cast("long").alias("doc_id"),
        F.element_at(parts, 2).alias("lang"),
        F.element_at(parts, 3).cast("long").alias("n_chars"),
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
    )


@register(
    "q_scan_metadata_columns",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tier="P2",
    doc="Hidden file-metadata columns (the `_metadata` struct every "
    "file source exposes): lineitem is written partitioned by "
    "returnflag, read back, and the partition value is recovered "
    "from `_metadata.file_path` alone (regexp over the hive-style "
    "directory name) — never from the data columns — then aggregated "
    "and proven equal to grouping the real column. This is the "
    "lineage/debugging surface at 100 TB: attributing bad rows to "
    "their source files, auditing which partition directories fed a "
    "result, and building file-level quarantine lists, all without a "
    "join against any manifest. Metadata columns are populated from "
    "the scan's own file listing — zero extra IO.",
)
def q_scan_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch(sf_dir, "li_by_flag_meta")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.select(
            F.regexp_extract(
                F.col("_metadata.file_path"), r"l_returnflag=([A-Z])", 1
            ).alias("l_returnflag"),
            "l_quantity",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


@register(
    "q_scan_corrupt_files_skip",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    UNION ALL
    SELECT n_nationkey + 100 AS r_regionkey, n_name AS r_name FROM nation
    """,
    tier="P2",
    doc="Corrupt-file resilience (ignoreCorruptFiles): a directory "
    "holding two good parquet files and one truncated-garbage file "
    "is read with the option on — the good rows all survive, the "
    "poison file is skipped instead of failing the job. At 100 TB a "
    "single bad object among millions must not kill a multi-hour "
    "batch; the complementary quarantine pattern (route, don't "
    "drop) is q_source_csv_malformed's PERMISSIVE path — this op "
    "pins the file-granularity switch, scoped via the per-read "
    "option (not the session conf, which would hide corruption "
    "everywhere).",
)
def q_scan_corrupt_files_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    path = _scratch(sf_dir, "corrupt_mix")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    load_table(spark, sf_dir, "region").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "good1"))
    load_table(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 100).alias("r_regionkey"),
        F.col("n_name").alias("r_name"),
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "good2"))
    flat = _scratch(sf_dir, "corrupt_flat")
    shutil.rmtree(flat, ignore_errors=True)
    os.makedirs(flat)
    i = 0
    for sub in ("good1", "good2"):
        for f in os.listdir(os.path.join(path, sub)):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(path, sub, f),
                    os.path.join(flat, f"part-good-{i}.parquet"),
                )
                i += 1
    with open(os.path.join(flat, "part-poison.parquet"), "wb") as fh:
        fh.write(b"PAR1this is not a real parquet file at all")
    return (
        spark.read.option("ignoreCorruptFiles", "true")
        .schema("r_regionkey INT, r_name STRING")
        .parquet(flat)
    )


@register(
    "q_scan_modified_after",
    oracle="""
    SELECT n_regionkey, count(*) AS n
    FROM nation
    WHERE n_nationkey >= 10
    GROUP BY n_regionkey
    """,
    tier="P2",
    doc="Time-based incremental pickup (modifiedAfter): two file "
    "batches land with controlled mtimes (os.utime pins the old "
    "batch a day back), and the read's modifiedAfter cutoff selects "
    "ONLY the newer batch — the zero-bookkeeping incremental-ingest "
    "filter for landing zones where writers can't maintain a "
    "manifest. File selection happens at listing time, before any "
    "footer or data IO. The stateful complement (exact, replayable) "
    "is q_etl_incremental_bookmark; modifiedAfter is the cheap "
    "first-pass cut when approximate time-based pickup suffices.",
)
def q_scan_modified_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import time

    path = _scratch(sf_dir, "modified_after")
    shutil.rmtree(path, ignore_errors=True)
    n = load_table(spark, sf_dir, "nation")
    n.where(F.col("n_nationkey") < 10).write.mode("overwrite").parquet(path)
    old = time.time() - 86_400
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (old, old))
    n.where(F.col("n_nationkey") >= 10).write.mode("append").parquet(path)
    # cutoff halfway between the two batches' mtimes (UTC, listing-time)
    cutoff = time.strftime(
        "%Y-%m-%dT%H:%M:%S", time.gmtime(time.time() - 43_200)
    )
    recent = (
        spark.read.option("modifiedAfter", cutoff)
        .schema(n.schema)
        .parquet(path)
    )
    return recent.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_source_csv_multiline",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
             AS sum_tokens
    FROM documents
    GROUP BY lang
    """,
    tier="P2",
    doc="Quoted-newline CSV round-trip (multiLine): documents get a "
    "real embedded newline injected mid-text, are written as quoted "
    "CSV, and are read back with multiLine=true — without it the "
    "reader splits records at the embedded newline and the table "
    "silently gains phantom rows. The parsed aggregate (computed "
    "after restoring the newline to a space) must equal the direct "
    "aggregate, proving record-boundary integrity. The 100 TB "
    "caveat is stated honestly: multiLine forces whole-file parsing "
    "(a quoted newline is indistinguishable from a record break "
    "mid-split), so a multiline CSV is NOT splittable — the ingest "
    "answer at scale is many medium files, or converting to parquet "
    "at the landing zone; this op pins the correctness half.",
)
def q_source_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    path = _scratch(sf_dir, "csv_multiline")
    shutil.rmtree(path, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        # inject REAL newlines at every token boundary — the quoted-field
        # hazard this reader option exists for, maximally exercised (the
        # synthetic texts contain no original newlines, so the mapping
        # is invertible)
        F.regexp_replace(F.col("text"), " ", "\n").alias("text_nl"),
    )
    docs.write.mode("overwrite").option("header", True).option(
        "quoteAll", True
    ).csv(path)
    back = (
        spark.read.schema(
            "doc_id BIGINT, lang STRING, n_chars BIGINT, text_nl STRING"
        )
        .option("header", True)
        .option("multiLine", True)
        .csv(path)
    )
    restored = back.select(
        "lang",
        "n_chars",
        F.regexp_replace(F.col("text_nl"), "\n", " ").alias("text"),
    )
    return restored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias(
            "sum_tokens"
        ),
    )


@register(
    "q_source_json_roundtrip",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    GROUP BY lang
    """,
    tier="P2",
    doc="JSON-lines source round-trip: documents are written as "
    "newline-delimited JSON (the interchange format most LLM "
    "corpus tooling emits) and read back with an EXPLICIT schema, "
    "then integrity-aggregated per lang; the oracle runs the same "
    "rollup on the original parquet, so any encode/decode drift "
    "(string escaping, integer widening, column loss) breaks the "
    "hash. Explicit read schema matters twice at scale: schema "
    "inference costs a full extra pass over 100 TB, and inferred "
    "types can widen per-file (a doc_id that looks float in one "
    "shard). JSONL is splittable, so the read parallelizes per "
    "128 MB split like any text source.",
)
def q_source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    path = _scratch(sf_dir, "json_docs")
    d = load_table(spark, sf_dir, "documents")
    d.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.length("text")).alias("sum_text_len"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
