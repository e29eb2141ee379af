"""Custom connector via the Spark 4 Python Data Source API — the
engine's demonstration that NEW sources (internal feeds, instrument
streams, blob-store listings) plug in as first-class `spark.read`
formats with partition-parallel reads, not as driver-side loops.

The source generates deterministic synthetic sensor readings from pure
integer arithmetic, so a SQL oracle over `generate_series` reproduces
it exactly and the connector is hash-checkable end-to-end: partition
planning (`partitions()` -> one `InputPartition` per slice), per-task
generation (`read()` runs on executors), and option handling
(rows/partitions) are all exercised.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Integer generation constants (Knuth multiplicative hash for spread);
# all arithmetic stays far below int64 range for cross-engine parity.
N_SENSORS = 37
KNUTH = 2654435761
BASE_MICRO_KELVIN = 273_150_000
SPREAD = 50_000_000


def reading_row(rid: int) -> tuple[int, int, int, int]:
    """The one deterministic formula both the connector and the SQL
    oracle implement: reading_id -> (sensor, hour, micro_kelvin)."""
    return (
        rid,
        rid % N_SENSORS,
        rid % 24,
        BASE_MICRO_KELVIN + (rid * rid * KNUTH) % SPREAD,
    )


class SyntheticSensorDataSource(DataSource):
    """`spark.read.format("sd2drp_sensors")` — options: rows, partitions."""

    @classmethod
    def name(cls) -> str:
        return "sd2drp_sensors"

    def schema(self) -> str:
        return (
            "reading_id bigint, sensor_id int, ts_hour int, micro_kelvin bigint"
        )

    def reader(self, schema) -> "SyntheticSensorReader":
        return SyntheticSensorReader(self.options)


class SyntheticSensorReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))

    def partitions(self):
        # Even row-range slices; each becomes one Spark task.
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        i = partition.value
        lo = i * self.n // self.parts
        hi = (i + 1) * self.n // self.parts
        for rid in range(lo, hi):
            yield reading_row(rid)


class SensorStreamDataSource(DataSource):
    """Streaming twin of the connector via SimpleDataSourceStreamReader:
    `spark.readStream.format("sd2drp_sensor_stream")` — options: rows
    (total), batch (micro-batch size). Offsets are dict checkpoints;
    `readBetweenOffsets` is the exactly-once replay path Spark calls on
    recovery. NOTE: Spark's Trigger.AvailableNow falls back to
    single-batch execution for Python simple stream readers (no
    prepareForTriggerAvailableNow hook), so terminating verify runs set
    batch >= rows; the multi-batch incremental path is exercised by
    pytest with a processing-time trigger (test_pyds_stream_multibatch).
    """

    @classmethod
    def name(cls) -> str:
        return "sd2drp_sensor_stream"

    def schema(self) -> str:
        return (
            "reading_id bigint, sensor_id int, ts_hour int, micro_kelvin bigint"
        )

    def simpleStreamReader(self, schema) -> "SensorStreamReader":
        return SensorStreamReader(self.options)


class SensorStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.total = int(options.get("rows", 1000))
        self.batch = int(options.get("batch", self.total))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        s = start["offset"]
        e = min(s + self.batch, self.total)
        return ([reading_row(r) for r in range(s, e)], {"offset": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        return [reading_row(r) for r in range(start["offset"], end["offset"])]
