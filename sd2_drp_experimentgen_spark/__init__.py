"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference experiment-generation pipeline
(ipendlet/SD2_DRP_ExperimentGen), re-expressed Spark-first.

The reference is an eager, single-node pandas ETL pipeline (see SURVEY.md
for the capability reconstruction; the read-only reference mount is empty,
so SURVEY.md §2 is the normative contract). This package declares every
operator as a lazy DataFrame plan and lets Catalyst/Tungsten pick the
physical strategy; custom execution exists only where Spark's built-in
operators genuinely can't express the semantics (numpy-backed vector math,
stateful streaming).

Layout:
    session.py    SparkSession factory with normative configs (SURVEY §4.4)
    schemas.py    explicit StructType constants for every fixture table
    sources/      parquet/CSV/JSON readers (incl. the nanos-ts fix)
    functions/    reusable column-expression helpers
    operators/    the SURVEY §2 operator inventory, one module per family
    plans/        query registry: name -> (builder, oracle SQL, tier)
    streaming/    Structured Streaming twins of the batch event queries
"""

__version__ = "0.1.0"
