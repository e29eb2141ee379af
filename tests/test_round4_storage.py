"""Edge-path tests for the round-4 storage/sink operators: the
guarantees their docstrings claim but a single happy-path verify run
doesn't exercise — streaming-sink batch replay idempotence, time-travel
snapshot isolation, and merge-on-read delete composition.
"""

from __future__ import annotations

import os

from conftest import SF_T1


class _Msg:
    def __init__(self, path: str):
        self.path = path


def test_stream_sink_commit_replay_is_idempotent(tmp_path):
    """Replaying an already-committed batchId must drop the duplicate
    attempt's files and leave the original manifest untouched — the
    exactly-once half the checkpoint alone cannot provide."""
    from sd2_drp_experimentgen_spark.sources.pyds import (
        StreamFileWriter,
        committed_stream_files,
    )

    out = str(tmp_path)
    w = StreamFileWriter({"path": out})

    # original attempt commits files a, b for batch 7
    for f in ("a.psv", "b.psv"):
        open(os.path.join(out, f), "w").write("1|x\n")
    w.commit([_Msg("a.psv"), _Msg("b.psv")], batchId=7)
    assert sorted(committed_stream_files(out)) == ["a.psv", "b.psv"]

    # replay of batch 7 wrote fresh attempt files c, d
    for f in ("c.psv", "d.psv"):
        open(os.path.join(out, f), "w").write("1|x\n")
    w.commit([_Msg("c.psv"), _Msg("d.psv")], batchId=7)

    # manifest unchanged; duplicate attempt swept; originals intact
    assert sorted(committed_stream_files(out)) == ["a.psv", "b.psv"]
    assert not os.path.exists(os.path.join(out, "c.psv"))
    assert not os.path.exists(os.path.join(out, "d.psv"))
    assert os.path.exists(os.path.join(out, "a.psv"))


def test_stream_sink_abort_sweeps_only_its_files(tmp_path):
    from sd2_drp_experimentgen_spark.sources.pyds import StreamFileWriter

    out = str(tmp_path)
    w = StreamFileWriter({"path": out})
    for f in ("keep.psv", "doomed.psv"):
        open(os.path.join(out, f), "w").write("1|x\n")
    w.abort([_Msg("doomed.psv"), None], batchId=3)
    assert os.path.exists(os.path.join(out, "keep.psv"))
    assert not os.path.exists(os.path.join(out, "doomed.psv"))


def test_time_travel_v1_isolated_from_v2_files(spark):
    """The AS OF v1 read must be byte-identical before and after v2
    commits more files into the same data directory — the isolation a
    directory-listing read cannot give."""
    from sd2_drp_experimentgen_spark.operators.storage import (
        q_storage_time_travel,
    )

    rows = {
        r["version"]: (r["n"], r["sum_cents"])
        for r in q_storage_time_travel(spark, SF_T1).collect()
    }
    assert set(rows) == {1, 2}
    n1, _ = rows[1]
    n2, _ = rows[2]
    assert 0 < n1 < n2  # v2 strictly extends v1
    # and v1's manifest-driven re-read (files from v2 now present on
    # disk) still returns exactly the v1 row set
    from sd2_drp_experimentgen_spark.operators.scans import _scratch

    base = _scratch(SF_T1, "time_travel")
    import json

    with open(os.path.join(base, "manifest_v1.json")) as fh:
        v1_files = json.load(fh)["files"]
    re_read = spark.read.schema(
        "o_orderkey BIGINT, o_orderstatus STRING, cents BIGINT"
    ).parquet(*v1_files)
    assert re_read.count() == n1
    assert re_read.where("o_orderstatus <> 'F'").count() == 0


def test_mor_deletes_remove_exactly_the_keyed_rows(spark):
    """live = base minus delete-keys, nothing else: the anti join must
    not over- or under-delete."""
    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.operators.storage import (
        q_storage_merge_on_read_deletes,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    out = {
        r["o_orderstatus"]: r["n"]
        for r in q_storage_merge_on_read_deletes(spark, SF_T1).collect()
    }
    o = load_table(spark, SF_T1, "orders")
    pfx = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    expected_f = o.where(
        (F.col("o_orderstatus") == "F") & (pfx != "0")
    ).count()
    untouched_o = o.where(F.col("o_orderstatus") == "O").count()
    assert out["F"] == expected_f
    assert out["O"] == untouched_o
