"""SparkSession factory with the engine's normative configuration.

Configs follow SURVEY.md §4.4. The two that are *required for
correctness* (not just speed) are also applied at runtime by
``configure_session`` so that queries work on a driver-provided session
that was not built by this factory:

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — events.parquet stores
  ``ts`` as TIMESTAMP(NANOS), which Spark 4.x refuses to read otherwise.
- ``spark.sql.session.timeZone=UTC`` — hash-stable timestamp rendering.

Scale posture: on a real cluster the same factory applies; only
``master`` and the shuffle-partition count change (shuffle partitions
should track cluster cores × 2-3 at 100 TB, or be left to AQE coalescing
with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs every query path assumes. Applied both at
# build time and defensively on foreign sessions (driver harness).
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


# Confs configure_session could not apply (conf key -> error message).
# Inspected by require_conf() so the first query that depends on a
# missing conf fails with an explanation instead of an opaque JVM error.
CONF_SET_FAILURES: dict[str, str] = {}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply required runtime confs to an existing session (idempotent).

    Failures are recorded (not raised): most confs are speed-only, and a
    foreign session may legitimately refuse runtime sets. Paths that
    *require* a conf call :func:`require_conf` to turn a silent gap into
    an actionable error at first use.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
            CONF_SET_FAILURES.pop(k, None)
        except Exception as e:  # noqa: BLE001
            CONF_SET_FAILURES[k] = f"{type(e).__name__}: {e}"
    return spark


def require_conf(spark: SparkSession, key: str, expected: str, why: str) -> None:
    """Raise a clear error if a correctness-required conf is not in effect."""
    try:
        actual = spark.conf.get(key, None)
    except Exception:  # noqa: BLE001
        actual = None
    if actual == expected:
        return
    detail = CONF_SET_FAILURES.get(key, "conf not set and no set attempt recorded")
    raise RuntimeError(
        f"SparkSession is missing required conf {key}={expected} ({why}). "
        f"configure_session could not apply it: {detail}. Set it at "
        f"session build time (see sd2_drp_experimentgen_spark.session.get_spark)."
    )


def get_spark(
    app_name: str = "sd2drp-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    local[$SPARK_GRAFT_CPUS] by default; low shuffle-partition counts at
    test scale kill per-task overhead (SURVEY §4.1), while AQE coalescing
    keeps the setting safe if data grows.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode runs driver + all executor threads in ONE JVM; the
        # 1g Spark default starves 32 concurrent tasks (observed: MLlib
        # approxSimilarityJoin OOMing a long-lived session at sf0.1).
        # Only effective for the process's first session — a
        # driver-provided foreign session keeps its own sizing.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure_session(builder.getOrCreate())
