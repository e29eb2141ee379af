"""Quantitative self-checks behind the witness-backed operators
(SURVEY §5.2): originally the rows-only battery, now — with every
registered query hash-checked since the r12 LSH promotion — the
readable-margin layer under the oracled witness booleans (a recall or
AUC regression fails HERE with a message before it fails the driver
hash)."""

from __future__ import annotations

from sd2_drp_experimentgen_spark.plans import all_specs
from tests.conftest import SF_T2


def test_approx_distinct_within_5pct(spark):
    row = all_specs()["q_agg_approx_distinct"].fn(spark, SF_T2).collect()[0]
    assert row["exact_orders"] > 0
    assert row["approx_ok"] is True


def test_approx_percentile_within_1pct(spark):
    rows = all_specs()["q_agg_approx_percentile"].fn(spark, SF_T2).collect()
    assert rows
    for row in rows:
        assert row["exact_p50"] > 0
        assert row["p50_ok"] is True and row["p90_ok"] is True


def _rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_streaming_tumbling_equals_batch(spark):
    specs = all_specs()
    batch = specs["q_stream_tumbling_1h"].fn(spark, SF_T2)
    stream = specs["q_stream_tumbling_watermarked"].fn(spark, SF_T2)
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows_set(batch, cols) == _rows_set(stream, cols)


def test_streaming_session_window_equals_lag_cumsum(spark):
    specs = all_specs()
    batch = specs["q_stream_session_30m"].fn(spark, SF_T2)
    stream = specs["q_stream_session_window"].fn(spark, SF_T2)
    from pyspark.sql import functions as F

    b = {
        (r["user_id"], r["n_sessions"], r["n_events"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }
    s = {
        (r["user_id"], r["n_sessions"], r["n_events"])
        for r in stream.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }
    assert b == s


def test_streaming_late_data_excluded(spark):
    """Late rows (day-1 replays in file 2) must not alter closed windows."""
    specs = all_specs()
    late = specs["q_stream_late_data"].fn(spark, SF_T2)
    batch = specs["q_stream_tumbling_1h"].fn(spark, SF_T2)
    from pyspark.sql import functions as F

    batch_by_window = {
        r["window_start"]: r["n"]
        for r in batch.groupBy("window_start")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    emitted = {r["window_start"]: r["n"] for r in late.collect()}
    assert emitted, "no closed windows emitted"
    for ws, n in emitted.items():
        assert n == batch_by_window[ws], (
            f"window {ws}: late rows leaked ({n} != {batch_by_window[ws]})"
        )


def test_streaming_stateful_counts_equal_batch(spark):
    specs = all_specs()
    stateful = specs["q_stream_stateful_counts"].fn(spark, SF_T2)
    from pyspark.sql import functions as F
    from sd2_drp_experimentgen_spark.sources.tables import load_events

    batch = (
        load_events(spark, SF_T2)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert _rows_set(stateful, ["user_id", "n_events"]) == _rows_set(
        batch, ["user_id", "n_events"]
    )


def test_lsh_covers_exact_high_jaccard_pairs(spark):
    """LSH candidate set must cover the exact pairs with J >= 0.8 —
    checked on the RAW seeded pair frame (lsh_refined_pairs), which
    since the r12 promotion stays out of the registered query's hash
    content."""
    from sd2_drp_experimentgen_spark.operators.ml import lsh_refined_pairs

    specs = all_specs()
    exact = specs["q_neardup_jaccard"].fn(spark, SF_T2)
    truth = {
        (r["id_lo"], r["id_hi"])
        for r in exact.where("jaccard >= 0.8").collect()
    }
    candidates = {
        (r["id_lo"], r["id_hi"])
        for r in lsh_refined_pairs(spark, SF_T2).collect()
    }
    missed = truth - candidates
    # Mirror the shipped witness' one-miss margin (ADVICE r12): a fresh
    # MinHash family draw misses a J>=0.8 pair with ~0.4% probability
    # per the promotion analysis (CountVectorizer df-tie vocabulary
    # order is partition-dependent), so the hashed query tolerates one
    # miss — the pytest keeping the exact form would flake at exactly
    # that rate while the driver stays green.
    assert truth and len(missed) <= 1, (
        f"LSH missed {len(missed)}/{len(truth)} pairs "
        f"(witness margin is 1): {sorted(missed)[:5]}"
    )


def test_exact_dedup_hash_first_identity(spark):
    """r13 scale rewrite (VERDICT r12 #1): the hash-first exact-dedup
    kernel (groupBy xxhash64 -> in-bucket exact verify) must be
    bit-identical to the direct groupBy(text) form — forced on a frame
    WITH real duplicates (the sf0.01 fixture has none), same
    discipline as the r12 bitset gate."""
    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.operators.text import (
        exact_dedup_groups,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    d = load_table(spark, SF_T2, "documents").select("doc_id", "text")
    # 40 exact duplicates with higher ids (originals stay survivors)
    # and 10 with LOWER ids (the copy becomes the survivor) — both
    # survivor-selection directions exercised.
    dup_hi = d.orderBy("doc_id").limit(40).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    dup_lo = d.orderBy(F.desc("doc_id")).limit(10).withColumn(
        "doc_id", -F.col("doc_id")
    )
    frame = d.unionByName(dup_hi).unionByName(dup_lo)

    direct = frame.groupBy("text").agg(
        F.min("doc_id").alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    cols = ["survivor_id", "n_copies"]
    got = _rows_set(exact_dedup_groups(frame), cols)
    want = _rows_set(direct, cols)
    assert got == want
    # and the duplicate structure is actually present in the frame
    assert sum(1 for _, n in got if n == 2) == 50

    # the loser kernel (the corpus pipeline's removal list) must be
    # the exact complement of the survivors
    from sd2_drp_experimentgen_spark.operators.text import (
        exact_dedup_losers,
    )

    all_ids = {r["doc_id"] for r in frame.select("doc_id").collect()}
    survivors = {s for s, _ in want}
    losers = {r["doc_id"] for r in exact_dedup_losers(frame).collect()}
    assert losers == all_ids - survivors and len(losers) == 50

    # plan witness: the full-corpus (phase-1) exchange partitions on
    # the xxhash64 key; any text-partitioned exchange belongs to the
    # verified branch only — i.e. its OWN SUBTREE (lines below it at
    # strictly greater tree depth, not merely anything printed later
    # in the dump — r13 review hardening) contains the LeftSemi
    # restriction to multi-member buckets, so only the dup subset's
    # text ever moves.
    plan = (
        exact_dedup_groups(frame)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in plan

    def node_depth(line: str) -> int:
        # tree-dump depth = offset of the node marker ("+-"/":-");
        # root lines (no marker) are depth -1
        for marker in ("+- ", ":- "):
            i = line.find(marker)
            if i >= 0:
                return i
        return -1

    lines = plan.splitlines()
    found = 0
    for i, line in enumerate(lines):
        if "Exchange hashpartitioning(text#" not in line:
            continue
        found += 1
        d = node_depth(line)
        subtree = []
        for nxt in lines[i + 1:]:
            nd = node_depth(nxt)
            if 0 <= nd <= d:
                break  # sibling or ancestor: subtree ended
            subtree.append(nxt)
        assert any("LeftSemi" in s for s in subtree), (
            "text exchange outside the multi-bucket verified branch:\n"
            + line
        )
    assert found >= 1, "expected the verified branch's text exchange"


def test_lsh_promotion_witness_shape(spark):
    """The r12 exact-companion form: per-source counts are positive,
    the driver-hashed recall witness holds, and the seed-dependent
    covered count stays OUT of the emitted schema (only companions +
    the one-miss-margin boolean are hashed)."""
    df = all_specs()["q_dedup_minhash_lsh"].fn(spark, SF_T2)
    assert df.columns == ["source", "n_pairs_06", "n_pairs_08", "recall_ok"]
    rows = df.collect()
    assert len(rows) == 20  # every source has >= 1 near-dup pair
    for r in rows:
        assert r["n_pairs_06"] >= r["n_pairs_08"] > 0
        assert r["recall_ok"] is True


def test_nn_descent_recall_monotone(spark):
    """r13 multi-round NN-descent: per-src recall vs the exact top-3
    must be monotone non-decreasing round-over-round (guaranteed by
    the candidate-superset construction — an exact-top-3 member can
    never be outranked by three others once proposed), and the second
    round must actually add recall somewhere (else the extra round is
    dead weight)."""
    rows = all_specs()["q_emb_nn_descent"].fn(spark, SF_T2).collect()
    per_src = {r["src"]: (r["hits_r1"], r["hits_r2"]) for r in rows}
    assert per_src
    assert all(h2 >= h1 for h1, h2 in per_src.values())
    total_r1 = sum(h1 for h1, _ in per_src.values())
    total_r2 = sum(h2 for _, h2 in per_src.values())
    assert total_r2 > total_r1, (
        f"round 2 added no recall: {total_r1} -> {total_r2}"
    )


def test_ivfpq_recall_margin(spark):
    """The composed IVF+PQ query's hashed hits10 companion must show
    real routing quality: macro recall@10 vs the full-ADC top-10 at
    sf0.01 measured 0.76 probing 4/16 cells (~32% of codes) — assert
    a 0.65 floor so codebook/router drift fails HERE with a number
    before it fails the driver hash."""
    from sd2_drp_experimentgen_spark.operators.vectors import (
        ADC_K,
        ADC_N_QUERIES,
    )

    rows = all_specs()["q_ann_ivfpq_topk"].fn(spark, SF_T2).collect()
    per_query = {r["query_id"]: r["hits10"] for r in rows}
    assert len(per_query) == ADC_N_QUERIES
    macro = sum(per_query.values()) / (ADC_K * ADC_N_QUERIES)
    assert macro >= 0.65, f"IVFPQ macro recall@10 degraded: {macro:.3f}"
    # every query returns a full top-10 from its probed cells
    assert len(rows) == ADC_K * ADC_N_QUERIES


def test_kmeans_quality(spark):
    """Fixture labels are only weakly separable (nearest-centroid label
    accuracy ~0.41), so assert structure-finding, not label recovery:
    purity above the 1/k=0.1 chance level, inertia well below the
    single-cluster SSE baseline, and seed-determinism of cluster sizes."""
    from sd2_drp_experimentgen_spark.operators.ml import kmeans_quality

    q = kmeans_quality(spark, SF_T2)
    assert q["purity"] > 0.1
    assert q["inertia"] < 0.95 * q["baseline_sse"]

    specs = all_specs()
    rows_a = specs["q_kmeans_embeddings"].fn(spark, SF_T2).collect()
    rows_b = specs["q_kmeans_embeddings"].fn(spark, SF_T2).collect()
    a = sorted((r["label"], r["n_vectors"]) for r in rows_a)
    b = sorted((r["label"], r["n_vectors"]) for r in rows_b)
    assert a == b and sum(n for _, n in a) == 500
    # Witness booleans (hash content since the r7 promotion) hold and
    # are seed-deterministic across runs.
    assert all(r["purity_ok"] and r["inertia_ok"] for r in rows_a + rows_b)


def test_mllib_pipeline_auc(spark):
    row = all_specs()["q_mllib_train_pipeline"].fn(spark, SF_T2).collect()[0]
    assert row["n_train"] == 1500
    # r8 hash promotion: the AUC rides as the witness boolean (measured
    # 0.8641 at sf0.01 vs the 0.70 threshold) and n_features must equal
    # the oracle's derived 10 + |nations| - 1 formula.
    assert row["auc_ok"] is True
    assert row["n_features"] == 34


def test_mllib_cross_validation_witnesses(spark):
    """r9 hash promotion: the hashed row is companions + witness only
    (best-params stay out per the r8 audit's 5e-4 winner margin, and
    are grid-membership asserted inside the query fn). The witness
    must hold with margin at sf0.01 (measured CV-AUC 0.8297 vs the
    0.70 threshold) and n_train must match the oracle's re-derived
    CV input table."""
    row = (
        all_specs()["q_mllib_cross_validation"].fn(spark, SF_T2).collect()[0]
    )
    assert row["n_train"] == 1500
    assert row["n_grid"] == 4 and row["n_folds"] == 3
    assert row["cv_auc_ok"] is True


def test_ann_ivf_recall_vs_bruteforce(spark):
    """r6 hash promotion: the query now emits a per-query audit row
    (exact top-1 + recall@10 witness). Cross-check the embedded exact
    companion against the independent brute-force library path, and
    assert every witness holds (the oracle hard-codes recall_ok=true,
    so a recall regression is a hash fail — this test catches it with
    a readable message first)."""
    from sd2_drp_experimentgen_spark.operators.vectors import (
        cosine_topk_for_queries,
    )

    specs = all_specs()
    rows = specs["q_ann_ivf_topk"].fn(spark, SF_T2).collect()
    assert len(rows) == 20
    assert all(r["n_ivf"] == 10 for r in rows)
    assert all(r["recall_ok"] for r in rows), [
        r["query_id"] for r in rows if not r["recall_ok"]
    ]
    query_ids = sorted(r["query_id"] for r in rows)
    brute = cosine_topk_for_queries(spark, SF_T2, query_ids, k=1)
    top1 = {
        r["query_id"]: (r["neighbor_id"], r["sim"]) for r in brute.collect()
    }
    for r in rows:
        nb, sim = top1[r["query_id"]]
        assert r["exact_top1"] == nb
        assert abs(r["exact_top1_sim"] - sim) < 1e-12


def test_multimodal_deterministic(spark):
    specs = all_specs()
    a = specs["q_mm_image_features"].fn(spark, SF_T2)
    b = specs["q_mm_image_features"].fn(spark, SF_T2)
    cols = ["doc_id", "n_px", "mean_r", "mean_g", "mean_b", "max_lum", "thumb_sum"]
    ra, rb = _rows_set(a, cols), _rows_set(b, cols)
    assert ra == rb and len(ra) == 500
    # px count must equal width*height from the metadata convention
    # (the extractor itself validates header-vs-metadata and raises)
    from sd2_drp_experimentgen_spark.operators.multimodal import media_table

    meta = {
        r["doc_id"]: r["media"]["width"] * r["media"]["height"]
        for r in media_table(spark, SF_T2).collect()
    }
    for row in ra:
        assert row[1] == meta[row[0]]


def test_ppm_decoder_is_a_real_parser(spark):
    """_decode_ppm must behave like a format parser: decode a valid
    hand-built P6 file exactly, and reject malformed input."""
    import numpy as np
    import pytest

    from sd2_drp_experimentgen_spark.operators.multimodal import _decode_ppm

    raw = bytes(range(2 * 3 * 3))  # 3x2 RGB raster, bytes 0..17
    img = _decode_ppm(b"P6\n3 2\n255\n" + raw)
    assert img.shape == (2, 3, 3)
    assert img.dtype == np.uint8
    assert img.tobytes() == raw
    with pytest.raises(ValueError, match="not a P6"):
        _decode_ppm(b"P5\n3 2\n255\n" + raw)
    with pytest.raises(ValueError, match="truncated"):
        _decode_ppm(b"P6\n3 2\n255\n" + raw[:-1])
    with pytest.raises(ValueError, match="maxval"):
        _decode_ppm(b"P6\n3 2\n65535\n" + raw)


def test_stream_stream_join_equals_batch(spark):
    from pyspark.sql import functions as F
    from sd2_drp_experimentgen_spark.sources.tables import load_events

    stream = all_specs()["q_stream_stream_join"].fn(spark, SF_T2)
    ev = load_events(spark, SF_T2)
    clicks = ev.where("event_type = 'click'").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = ev.where("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    batch = (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    assert _rows_set(stream, ["user_id", "n_pairs"]) == _rows_set(
        batch, ["user_id", "n_pairs"]
    )


def test_streaming_sliding_equals_batch(spark):
    specs = all_specs()
    batch = specs["q_stream_sliding_1h_15m"].fn(spark, SF_T2)
    stream = specs["q_stream_sliding_watermarked"].fn(spark, SF_T2)
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows_set(batch, cols) == _rows_set(stream, cols)


def test_partitioning_independence_of_new_ops(spark):
    """SURVEY §5.3: answers must not depend on partitioning. Run the
    round-2 flagship ops under different shuffle-partition counts and
    assert identical results (integer PageRank, hash sampling, and a
    rows-frame window are the shapes most tempted to differ)."""
    specs = all_specs()
    names = ["q_graph_pagerank", "q_sample_stratified", "q_win_moving_median"]
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    try:
        results = {}
        for n in ("3", "8"):
            spark.conf.set(key, n)
            results[n] = {
                name: sorted(tuple(r) for r in specs[name].fn(spark, SF_T2).collect())
                for name in names
            }
    finally:
        spark.conf.set(key, old)
    for name in names:
        assert results["3"][name] == results["8"][name], name


def test_pii_redact_semantics(spark):
    """Injected PII is found and fully redacted: every doc_id%3==0 doc
    has >=1 email, %5==0 has >=1 phone, and no redacted text can still
    match either pattern (md5 of a re-redacted string is unchanged)."""
    from pyspark.sql import functions as F

    df = all_specs()["q_text_pii_redact"].fn(spark, SF_T2)
    bad = df.where(
        ((F.col("doc_id") % 3 == 0) & (F.col("n_emails") < 1))
        | ((F.col("doc_id") % 5 == 0) & (F.col("n_phones") < 1))
        | ((F.col("doc_id") % 3 != 0) & (F.col("n_emails") > 0))
        | ((F.col("doc_id") % 5 != 0) & (F.col("n_phones") > 0))
    ).count()
    assert bad == 0


def test_mix_temperature_flattens(spark):
    """Temperature sampling must upweight low-resource langs relative
    to raw proportions and keep a (near-)conserved draw budget."""
    rows = all_specs()["q_mix_temperature"].fn(spark, SF_T2).collect()
    assert len(rows) == 5
    lo = min(rows, key=lambda r: r["n_docs"])
    hi = max(rows, key=lambda r: r["n_docs"])
    assert lo["p_temp"] > lo["p_raw"]
    assert hi["p_temp"] < hi["p_raw"]
    assert abs(sum(r["draws_10k"] for r in rows) - 10000) <= len(rows)


def test_observe_does_not_poison_session_closures(spark):
    """A registered Observation must not leave a non-serializable
    ObservationManager reference behind on the shared session: RDD
    closure cleaning for later jobs (MLlib evaluators) fails with
    'Task not serializable' if it does. q_observe_metrics scopes its
    observation to a throwaway session; this pins the interaction."""
    specs = all_specs()
    row = specs["q_observe_metrics"].fn(spark, SF_T2).collect()[0]
    assert row["n_rows"] > 0
    # an RDD-closure job on the same session must still work
    assert (
        spark.range(100).rdd.map(lambda r: r.id).sum() == 4950
    )


def test_wav_decoder_parses_and_rejects():
    """_decode_wav must behave like a format parser: decode a valid
    hand-built RIFF/WAVE PCM file exactly, and reject malformed
    input (wrong magic, non-PCM, stereo, truncated data)."""
    import struct

    import numpy as np
    import pytest

    from sd2_drp_experimentgen_spark.operators.multimodal import _decode_wav

    samples = np.array([0, 1, -1, 32767, -32768, 1000], dtype="<i2")
    data = samples.tobytes()

    def wav(
        magic=b"RIFF", wave=b"WAVE", fmt=b"fmt ", fmt_size=16,
        audio_fmt=1, channels=1, payload=data,
    ):
        return (
            magic
            + struct.pack("<I", 36 + len(payload))
            + wave
            + fmt
            + struct.pack("<I", fmt_size)
            + struct.pack("<HH", audio_fmt, channels)
            + struct.pack("<I", 8000)
            + struct.pack("<I", 16000)
            + struct.pack("<HH", 2, 16)
            + b"data"
            + struct.pack("<I", len(payload))
            + payload
        )

    rate, out = _decode_wav(wav())
    assert rate == 8000
    assert np.array_equal(out, samples)

    with pytest.raises(ValueError):
        _decode_wav(wav(magic=b"RIFX"))
    with pytest.raises(ValueError):
        _decode_wav(wav(audio_fmt=3))  # IEEE float, not PCM
    with pytest.raises(ValueError):
        _decode_wav(wav(channels=2))
    with pytest.raises(ValueError):
        _decode_wav(wav()[:-2])  # truncated data chunk


def test_neardup_paths_bit_identical(spark, monkeypatch):
    """r12 vocabulary gate: the default bitset path (31-token fixture
    vocab) and the forced ppjoin prefix-filter path must emit the
    same pairs with the same rounded jaccard, bit for bit."""
    from sd2_drp_experimentgen_spark.operators import text as text_mod

    base = sorted(
        tuple(r) for r in text_mod.q_neardup_jaccard(spark, SF_T2).collect()
    )
    monkeypatch.setattr(text_mod, "ND_BITSET_VOCAB_MAX", -1)
    forced = sorted(
        tuple(r) for r in text_mod.q_neardup_jaccard(spark, SF_T2).collect()
    )
    assert base and base == forced


def test_containment_paths_bit_identical(spark, monkeypatch):
    """r12: the containment bitset path must match the forced
    asymmetric ppjoin path bit for bit."""
    from sd2_drp_experimentgen_spark.operators import text as text_mod

    base = sorted(
        tuple(r)
        for r in text_mod.q_neardup_containment(spark, SF_T2).collect()
    )
    monkeypatch.setattr(text_mod, "ND_BITSET_VOCAB_MAX", -1)
    forced = sorted(
        tuple(r)
        for r in text_mod.q_neardup_containment(spark, SF_T2).collect()
    )
    assert base and base == forced


def test_threshold_curve_paths_bit_identical(spark, monkeypatch):
    """r12: the threshold-curve bitset path (mask pairs include
    below-0.6 rows; every at(t) count excludes them) must match the
    forced ppjoin path bit for bit."""
    from sd2_drp_experimentgen_spark.operators import text as text_mod

    base = sorted(
        tuple(r)
        for r in text_mod.q_dedup_threshold_curve(spark, SF_T2).collect()
    )
    monkeypatch.setattr(text_mod, "ND_BITSET_VOCAB_MAX", -1)
    forced = sorted(
        tuple(r)
        for r in text_mod.q_dedup_threshold_curve(spark, SF_T2).collect()
    )
    assert base and base == forced


def test_cogrouped_bucket_form_matches_per_user_reference(spark):
    """r14: q_udf_cogrouped cogroups on a user BUCKET and merges all of
    a bucket's users with vectorized pandas (18.8 s -> 0.64 s at
    sf0.1). Must stay BIT-IDENTICAL to the per-user reference merge —
    one python call per user, scalar pandas ops — on the real fixture
    tables, covering users with no orders and empty-side buckets."""
    import pandas as pd
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.udfs import q_udf_cogrouped
    from sd2_drp_experimentgen_spark.sources.tables import (
        load_events,
        load_table,
    )

    got = sorted(tuple(r) for r in q_udf_cogrouped(spark, SF_T2).collect())

    ev = load_events(spark, SF_T2).select("user_id", "ts")
    orders = load_table(spark, SF_T2, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )

    def merge(ev_pdf: pd.DataFrame, ord_pdf: pd.DataFrame) -> pd.DataFrame:
        if ev_pdf.empty:
            return pd.DataFrame(
                columns=["user_id", "n_events", "n_orders", "n_after_last"]
            )
        n_events = len(ev_pdf)
        n_orders = len(ord_pdf)
        if n_orders:
            last = ord_pdf["o_orderdate"].max()
            n_after = int((ev_pdf["ts"] > last).sum())
        else:
            n_after = n_events
        return pd.DataFrame(
            {
                "user_id": [int(ev_pdf["user_id"].iloc[0])],
                "n_events": [n_events],
                "n_orders": [n_orders],
                "n_after_last": [n_after],
            }
        )

    ref = (
        ev.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="user_id long, n_events long, n_orders long,"
            " n_after_last long",
        )
    )
    want = sorted(tuple(r) for r in ref.collect())
    assert got and got == want


def test_pca_power_driver_iteration_matches_distributed_reference(spark):
    """r14: q_emb_pca_power collects the dimension-bounded gram (d^2 =
    4096 int64 cells) and runs the 3-round power iteration in driver
    numpy. Must stay BIT-IDENTICAL to the r13 distributed reference —
    the same gram as a DataFrame, each round a join+groupBy plan with
    Spark `div` rescaling — on the real fixture embeddings (negative
    s values exercise the truncate-toward-zero vs floor divide edge)."""
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.vectors import (
        PCA_ITERS,
        PCA_UNITS,
        q_emb_pca_power,
    )

    got = sorted(tuple(r) for r in q_emb_pca_power(spark, SF_T2).collect())

    # Distributed reference: rebuild the gram from the exact int64
    # quantized embeddings entirely in Spark SQL (posexplode twin of
    # the operator's mapInPandas tile kernel), then iterate in-plan.
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    q = (
        load_table(spark, SF_T2, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("i", "e"))
        .select(
            "vec_id",
            "i",
            F.floor(F.col("e") * PCA_UNITS + F.lit(0.5))
            .cast("long")
            .alias("qv"),
        )
    )
    a, b = q.alias("a"), q.alias("b")
    gram = (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.qv") * F.col("b.qv")).alias("val"))
    ).localCheckpoint()
    v = gram.select(F.col("i").alias("dim_idx")).distinct().select(
        "dim_idx", F.lit(PCA_UNITS).cast("long").alias("comp")
    )
    for _ in range(PCA_ITERS):
        gv = (
            gram.join(v, gram.j == v.dim_idx)
            .groupBy("i")
            .agg(F.sum(F.col("val") * F.col("comp")).alias("s"))
        )
        scale = gv.agg(
            F.greatest(
                F.expr(f"max(abs(s)) div {PCA_UNITS}"),
                F.lit(1).cast("long"),
            ).alias("sc")
        )
        v = gv.crossJoin(F.broadcast(scale)).select(
            F.col("i").alias("dim_idx"),
            F.expr("s div sc").alias("comp"),
        )
    want = sorted(tuple(r) for r in v.collect())
    assert got and got == want


def test_lsh_probe_form_matches_similarity_join_form(spark):
    """r14: q_dedup_minhash_lsh probes candidate membership per
    ground-truth pair (signature collision in >=1 of 8 tables) instead
    of materializing approxSimilarityJoin (328 s -> 3.4 s at sf0.1:
    degenerate hot-token buckets made the join enumerate 123M struct
    rows). Within one session both forms see the same seeded model
    draw, so the FULL output — including the seed-dependent
    covered_08-derived witness — must match the r13
    approxSimilarityJoin form exactly."""
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.ml import (
        lsh_refined_pairs,
        q_dedup_minhash_lsh,
    )
    from sd2_drp_experimentgen_spark.operators.text import q_neardup_jaccard
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    got = sorted(
        tuple(r) for r in q_dedup_minhash_lsh(spark, SF_T2).collect()
    )

    cand = (
        lsh_refined_pairs(spark, SF_T2)
        .select("id_lo", "id_hi")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    exact = q_neardup_jaccard(spark, SF_T2)
    src = load_table(spark, SF_T2, "documents").select(
        F.col("doc_id").alias("id_lo"), "source"
    )
    j8 = (F.col("jaccard") >= 0.8).cast("long")
    ref = (
        exact.join(src, "id_lo")
        .join(cand, ["id_lo", "id_hi"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pairs_06"),
            F.sum(j8).alias("n_pairs_08"),
            F.sum(j8 * F.coalesce(F.col("hit"), F.lit(0))).alias(
                "covered_08"
            ),
        )
        .withColumn(
            "recall_ok", F.col("covered_08") + 1 >= F.col("n_pairs_08")
        )
        .drop("covered_08")
    )
    want = sorted(tuple(r) for r in ref.collect())
    assert got and got == want
