"""Behavioral check of the r8 stop-bucket cap (VERDICT r7 weak #1).

The scale study's --boilerplate mode proves the cap at corpus scale
against DuckDB; this test pins the semantics in CI at toy size: a
constructed corpus where one fingerprint / band signature is shared by
MORE than the cap must (i) contribute NO pairs, (ii) be counted in the
audited drop column, while organic near-dup pairs still surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sd2_drp_experimentgen_spark.plans import all_specs


@pytest.fixture(scope="module")
def hot_corpus(spark, tmp_path_factory):
    """documents.parquet where every doc shares a long boilerplate
    header (hot winnow fingerprints + hot band signatures for the
    all-header docs) plus organic near-dup pairs in the body."""
    from sd2_drp_experimentgen_spark.operators.llmtext import (
        LSH_BUCKET_CAP,
    )

    n_hot = LSH_BUCKET_CAP + 16  # strictly above the cap
    header = " ".join(f"hdr{i:02d}" for i in range(40))
    rows = []
    # docs that are ONLY boilerplate: every winnow fingerprint and
    # every band signature identical across all of them -> one bucket
    # of size n_hot > cap
    for i in range(n_hot):
        rows.append((i, header, "en", "web"))
    # an organic near-dup pair with NO boilerplate: must survive
    body = " ".join(f"tok{i:02d}" for i in range(30))
    rows.append((10_000, body, "en", "web"))
    rows.append((10_001, body + " extra", "en", "web"))
    d = tmp_path_factory.mktemp("hotcorpus")
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


def test_winnow_cap_drops_hot_fingerprints_and_audits(spark, hot_corpus):
    rows = (
        all_specs()["q_dedup_winnow_pairs"].fn(spark, hot_corpus).collect()
    )
    assert rows, "organic near-dup pair must survive the cap"
    hot_ids = set(range(200))
    for r in rows:
        assert r["doc_a"] not in hot_ids and r["doc_b"] not in hot_ids, (
            f"boilerplate-only pair leaked through the cap: {r}"
        )
        assert r["n_stop_fps"] > 0, "hot fingerprints must be audited"
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert (10_000, 10_001) in pairs


def test_lsh_cap_drops_hot_band_buckets_and_audits(spark, hot_corpus):
    rows = all_specs()["q_dedup_lsh_refine"].fn(spark, hot_corpus).collect()
    assert rows, "organic near-dup pair must survive the cap"
    hot_ids = set(range(200))
    for r in rows:
        assert r["doc_lo"] not in hot_ids and r["doc_hi"] not in hot_ids
        assert r["n_buckets_dropped"] > 0
    pairs = {(r["doc_lo"], r["doc_hi"]) for r in rows}
    assert (10_000, 10_001) in pairs
