"""Self-checks for the round-2b operator batch: repetition features,
int8 quantization, SRP-LSH bucketing, binaryFile ingest. (Oracle parity
for all of these is covered by tools/verify_local.py / the driver; these
tests pin semantic invariants the hash check can't express.)"""

from __future__ import annotations

import numpy as np

from sd2_drp_experimentgen_spark.plans import all_specs
from tests.conftest import SF_T1


def test_repetition_feature_bounds(spark):
    rows = all_specs()["q_text_repetition"].fn(spark, SF_T1).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_tokens"]
        assert 0.0 <= r["dup_ratio"] < 1.0
        # the most frequent token carries at least a 1/n_distinct share
        assert r["top_token_n"] * r["n_distinct"] >= r["n_tokens"]
        assert 0.0 < r["top_token_ratio"] <= 1.0


def test_quantize_matches_numpy(spark):
    """The Spark-side quantization must equal the numpy reference
    (same floor(x/scale*127 + 0.5) recipe) row for row."""
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_T1}/embeddings.parquet").collect()
    }
    out = all_specs()["q_emb_quantize_int8"].fn(spark, SF_T1).collect()
    assert len(out) == len(emb)
    for r in out:
        x = emb[r["vec_id"]]
        scale = np.abs(x).max()
        q = np.floor(x / scale * 127 + 0.5).astype(np.int64)
        assert r["sum_q"] == int(q.sum())
        assert r["sum_abs_q"] == int(np.abs(q).sum())
        assert r["max_q"] == int(q.max())
        assert r["min_q"] == int(q.min())
        assert -127 <= r["min_q"] <= r["max_q"] <= 127


def test_srp_buckets_partition_vectors(spark):
    """Every vector lands in exactly one bucket; bucket ids fit in the
    8-bit signature space; buckets are non-degenerate (the md5
    hyperplanes actually split the fixture)."""
    n_vecs = spark.read.parquet(f"{SF_T1}/embeddings.parquet").count()
    rows = all_specs()["q_ann_srp_buckets"].fn(spark, SF_T1).collect()
    assert sum(r["n_vecs"] for r in rows) == n_vecs
    assert all(0 <= r["srp_bucket"] < 256 for r in rows)
    assert len(rows) > 8


def test_binaryfile_roundtrip_deterministic(spark):
    fn = all_specs()["q_source_binaryfile"].fn
    a = sorted(tuple(r) for r in fn(spark, SF_T1).collect())
    b = sorted(tuple(r) for r in fn(spark, SF_T1).collect())
    assert a == b
    assert len(a) == 12
    names = [t[0] for t in a]
    assert names == sorted(names) and len(set(names)) == 12
    # length column must match the actual payload bytes md5-checked
    for _, length, md5 in a:
        assert length > 0 and len(md5) == 32


def test_ohlc_bar_invariants(spark):
    from pyspark.sql import functions as F

    df = all_specs()["q_time_downsample_ohlc"].fn(spark, SF_T1)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["low"] <= min(r["open"], r["close"])
        assert r["high"] >= max(r["open"], r["close"])
        assert r["n_events"] >= 1
    # one bar per (user, hour) with at least one event
    from sd2_drp_experimentgen_spark.sources.tables import load_events

    n_bars = (
        load_events(spark, SF_T1)
        .select("user_id", F.date_trunc("hour", "ts").alias("h"))
        .distinct()
        .count()
    )
    assert len(rows) == n_bars


def test_gap_islands_partition_events(spark):
    from sd2_drp_experimentgen_spark.sources.tables import load_events

    rows = all_specs()["q_win_gap_islands"].fn(spark, SF_T1).collect()
    total = load_events(spark, SF_T1).count()
    assert sum(r["n_events"] for r in rows) == total
    assert all(r["island_start"] <= r["island_end"] for r in rows)


def test_minhash_bands_catch_exact_dupes(spark):
    """Exact-duplicate texts have identical minhash signatures, so every
    exact-dup group must surface as (or inside) a candidate bucket in
    every band."""
    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.sources.tables import load_table

    docs = load_table(spark, SF_T1, "documents")
    dup_groups = (
        docs.groupBy("text")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("lo"))
        .where(F.col("n") >= 2)
        .collect()
    )
    buckets = all_specs()["q_dedup_minhash_bands"].fn(spark, SF_T1).collect()
    assert all(r["n_docs"] >= 2 for r in buckets)
    if dup_groups:  # fixture has exact dupes at every sf so far
        assert len(buckets) >= 4  # each dup group collides in all 4 bands


def test_scd2_intervals_tile_history(spark):
    """SCD2 versions per customer: contiguous, ordered, exactly one
    current row, and the version count equals the number of priority
    changes in the raw history."""
    rows = all_specs()["q_scd2_dimension"].fn(spark, SF_T1).collect()
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r["custkey"], []).append(r)
    assert by_cust
    for versions in by_cust.values():
        versions.sort(key=lambda r: r["valid_from"])
        assert sum(v["is_current"] for v in versions) == 1
        assert versions[-1]["is_current"] == 1 and versions[-1]["valid_to"] is None
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["prio"] != b["prio"]


def test_histogram_bins_cover_all_rows(spark):
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    rows = all_specs()["q_histogram_fixed_bins"].fn(spark, SF_T1).collect()
    total = load_table(spark, SF_T1, "lineitem").count()
    assert sum(r["n"] for r in rows) == total
    assert all(0 <= r["bin"] < 20 for r in rows)
    for r in rows:
        assert r["bin_min"] <= r["bin_max"]


def test_compaction_reduces_file_count(spark):
    import glob

    from sd2_drp_experimentgen_spark.operators.scans import _scratch
    from sd2_drp_experimentgen_spark.operators.storage import (
        COMPACT_SMALL_FILES,
        COMPACT_TARGET_FILES,
    )

    all_specs()["q_maint_compact_files"].fn(spark, SF_T1).collect()
    frag = glob.glob(_scratch(SF_T1, "compact_frag") + "/part-*.parquet")
    comp = glob.glob(_scratch(SF_T1, "compact_out") + "/part-*.parquet")
    assert len(frag) == COMPACT_SMALL_FILES
    assert 0 < len(comp) <= COMPACT_TARGET_FILES


def test_recursive_cte_calendar_contiguous(spark):
    """Months are contiguous (no gaps even for zero-order months) and
    the per-month counts total the table row count."""
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    rows = sorted(
        all_specs()["q_sql_recursive_cte"].fn(spark, SF_T1).collect(),
        key=lambda r: r["month_start"],
    )
    assert len(rows) >= 2
    total = load_table(spark, SF_T1, "orders").count()
    assert sum(r["n_orders"] for r in rows) == total
    for a, b in zip(rows, rows[1:]):
        # consecutive month starts are 28-31 days apart
        delta = b["month_start"] - a["month_start"]
        assert 28 * 86400 <= delta <= 31 * 86400


def test_variant_matches_string_json_path(spark):
    """The VARIANT path must agree with the legacy get_json_object path
    on the shared aggregates."""
    variant = {
        (r["event_type"], r["n"], r["sum_k"])
        for r in all_specs()["q_variant_json"].fn(spark, SF_T1).collect()
    }
    legacy = {
        (r["event_type"], r["n"], r["sum_k"])
        for r in all_specs()["q_json_extract"].fn(spark, SF_T1).collect()
    }
    assert variant == legacy


def test_sweepline_matches_bruteforce(spark):
    """Per-user max concurrency must equal a brute-force overlap count
    for a sample of users."""
    from sd2_drp_experimentgen_spark.sources.tables import load_events

    got = {
        r["user_id"]: r["max_concurrent"]
        for r in all_specs()["q_interval_sweepline"].fn(spark, SF_T1).collect()
    }
    events = (
        load_events(spark, SF_T1)
        .select("user_id", "ts")
        .collect()
    )
    from collections import defaultdict
    from datetime import timedelta

    by_user = defaultdict(list)
    for r in events:
        by_user[r["user_id"]].append(r["ts"])
    for uid in sorted(by_user)[:5]:
        times = sorted(by_user[uid])
        best = 0
        for t in times:
            # count intervals [s, s+30m) open at instant t (close-before-
            # open at exact boundaries, matching the sweep's tie rule)
            open_now = sum(
                1 for s in times if s <= t < s + timedelta(minutes=30)
            )
            best = max(best, open_now)
        assert got[uid] == best, uid


def test_zorder_key_is_invertible_and_layout_sorted(spark):
    """Even bits decode back to the custkey component, odd bits to the
    price component; the rewritten files are internally z-sorted."""
    import glob

    import pyarrow.parquet as pq

    from sd2_drp_experimentgen_spark.operators.scans import _scratch

    rows = all_specs()["q_layout_zorder"].fn(spark, SF_T1).collect()
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    assert sum(r["n"] for r in rows) == load_table(spark, SF_T1, "orders").count()
    assert all(0 <= r["tile"] < 64 for r in rows)
    # layout check: every rewritten file is sorted by zval
    for f in glob.glob(_scratch(SF_T1, "zorder_orders") + "/part-*.parquet"):
        zv = pq.read_table(f, columns=["zval"])["zval"].to_pylist()
        assert zv == sorted(zv)
    # invertibility on one re-read row
    sample = spark.read.parquet(_scratch(SF_T1, "zorder_orders")).head(5)
    for s in sample:
        a = sum(((s["zval"] >> (2 * i)) & 1) << i for i in range(10))
        b = sum(((s["zval"] >> (2 * i + 1)) & 1) << i for i in range(10))
        assert a == s["o_custkey"] % 1024
        assert b == int(s["o_totalprice"] // 1000) % 1024


def test_hll_sketch_merge_error_bound(spark):
    rows = all_specs()["q_agg_hll_sketch_merge"].fn(spark, SF_T1).collect()
    assert rows
    for r in rows:
        assert r["exact_users"] > 0
        # merged estimate within 5% of exact, and never below the
        # largest single-day exact count (union can only grow)
        assert r["est_ok"] is True
        assert r["ge_day_ok"] is True


def test_malformed_csv_quarantine(spark):
    rows = {
        r["kind"]: r
        for r in all_specs()["q_source_csv_malformed"].fn(spark, SF_T1).collect()
    }
    assert rows["good"]["n"] == 4 and rows["good"]["ids"] == "1,2,3,4"
    assert rows["corrupt"]["n"] == 3 and rows["corrupt"]["ids"] is None


def test_schema_evolution_partitions_rows(spark):
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    rows = all_specs()["q_source_schema_evolution"].fn(spark, SF_T1).collect()
    o = load_table(spark, SF_T1, "orders")
    assert sum(r["n"] for r in rows) == o.count()
    missing = [r for r in rows if r["prio"] == "MISSING"]
    assert len(missing) == 1
    # gen-1 (even orderkeys) rows surface as MISSING
    from pyspark.sql import functions as F

    n_even = o.where(F.col("o_orderkey") % 2 == 0).count()
    assert missing[0]["n"] == n_even


def test_observe_metrics_on_pipeline(spark):
    """df.observe() attaches streaming-safe metrics to a plan without a
    second scan — the production monitoring hook. The observed counts
    must match the action's actual row flow."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.sources.tables import load_table

    # A registered Observation lives in session state and breaks closure
    # serialization for LATER RDD-based jobs on the same session (e.g.
    # BinaryClassificationEvaluator: "Task not serializable:
    # ObservationManager"). Run on a sibling session sharing the
    # SparkContext so the shared fixture session stays clean.
    spark = spark.newSession()
    obs = Observation("ingest_qc")
    o = load_table(spark, SF_T1, "orders")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpositive_price"
        ),
    )
    kept = observed.where(F.col("o_totalprice") > 100).count()
    metrics = obs.get
    assert metrics["rows_seen"] == o.count()
    assert metrics["nonpositive_price"] == 0
    assert kept <= metrics["rows_seen"]


def test_lsh_refine_pairs_match_python_jaccard(spark):
    """Every emitted pair satisfies the J >= 0.5 refine threshold and
    its jaccard equals a pure-Python recomputation on the raw texts;
    any exact-duplicate texts (>= 3 tokens) must survive with J=1."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.sources.tables import load_table

    pairs = {
        (r["doc_lo"], r["doc_hi"]): r["jaccard"]
        for r in all_specs()["q_dedup_lsh_refine"].fn(spark, SF_T1).collect()
    }
    assert pairs  # the fixture has near-dups at every sf so far
    assert all(j >= 0.5 for j in pairs.values())
    texts = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in load_table(spark, SF_T1, "documents").collect()
    }
    for (lo, hi), j in pairs.items():
        a, b = texts[lo], texts[hi]
        exact = len(a & b) / len(a | b)
        assert abs(j - exact) < 1e-4, (lo, hi)
    # exact-dup groups (if any at this sf) must all surface with J=1
    by_text = {}
    for did, toks in texts.items():
        if len(toks) >= 3:
            by_text.setdefault(frozenset(toks), []).append(did)
    for ids in by_text.values():
        for lo, hi in combinations(sorted(ids), 2):
            if (lo, hi) in pairs:
                continue  # identical token SET but different text order
            # identical SETS always refine to J=1; they must be present
            # unless banding missed them — impossible for identical sets
            assert pairs.get((lo, hi), 1.0) == 1.0


def test_split_ratios_and_stability(spark):
    """Split fractions land near 80/10/10, partition the corpus, and a
    document's split assignment is a pure function of doc_id (re-run
    identical)."""
    fn = all_specs()["q_split_train_val_test"].fn
    a = {r["split"]: r for r in fn(spark, SF_T1).collect()}
    b = {r["split"]: r for r in fn(spark, SF_T1).collect()}
    assert {k: tuple(v) for k, v in a.items()} == {
        k: tuple(v) for k, v in b.items()
    }
    total = sum(r["n_docs"] for r in a.values())
    assert set(a) == {"train", "val", "test"}
    assert 0.70 <= a["train"]["n_docs"] / total <= 0.90
    assert 0.04 <= a["val"]["n_docs"] / total <= 0.16
    assert 0.04 <= a["test"]["n_docs"] / total <= 0.16


def test_weighted_sample_prefers_heavy_rows(spark):
    """Weight-proportional sampling must keep expensive orders at a
    visibly higher rate than cheap ones."""
    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.sources.tables import load_table

    o = load_table(spark, SF_T1, "orders")
    sampled = sum(
        r["n_sampled"]
        for r in all_specs()["q_sample_weighted"].fn(spark, SF_T1).collect()
    )
    total = o.count()
    mean_w = o.agg(F.avg("o_totalprice")).collect()[0][0]
    expect = total * mean_w / 600000.0
    assert 0.7 * expect <= sampled <= 1.3 * expect
    # sampled mean price must exceed the population mean (heavy bias)
    sum_price = sum(
        r["sum_price"]
        for r in all_specs()["q_sample_weighted"].fn(spark, SF_T1).collect()
    )
    assert sum_price / sampled > mean_w


def test_pack_sequences_conserves_tokens_and_fills(spark):
    """Packing must conserve the total token count, keep every
    non-final sequence at or above the budget boundary semantics
    (a sequence closes only once the running offset crosses the
    budget), and assign contiguous seq_ids per language."""
    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.operators.llmtext import PACK_BUDGET
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    rows = all_specs()["q_pack_sequences"].fn(spark, SF_T1).collect()
    d = load_table(spark, SF_T1, "documents")
    total = d.select(F.sum(F.size(F.split("text", " "))).alias("t")).collect()[
        0
    ]["t"]
    assert sum(r["sum_tokens"] for r in rows) == total
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, seqs in by_lang.items():
        ids = sorted(r["seq_id"] for r in seqs)
        assert ids == list(range(len(ids))), lang  # contiguous from 0
        # every sequence except the last carries the packing boundary:
        # its docs span at least to the next budget multiple
        seqs.sort(key=lambda r: r["seq_id"])
        running = 0
        for r in seqs[:-1]:
            running += r["sum_tokens"]
            assert running >= (r["seq_id"] + 1) * PACK_BUDGET


def test_attribution_totals_match_purchases(spark):
    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.sources.tables import load_events

    rows = all_specs()["q_event_attribution"].fn(spark, SF_T1).collect()
    ev = load_events(spark, SF_T1)
    n_purch = ev.where(F.col("event_type") == "purchase").count()
    assert sum(r["n_purchases"] for r in rows) == n_purch
    touches = {r["touch"] for r in rows}
    assert "purchase" not in touches  # purchases never credit purchases


def test_sink_operators_are_idempotent(spark):
    """Every file-sink round-trip operator must yield identical results
    when run twice — overwrite semantics, no leftover-state leakage
    between runs (the re-run safety a scheduled pipeline needs)."""
    sink_ops = [
        "q_source_csv_roundtrip",
        "q_source_orc_roundtrip",
        "q_source_xml_roundtrip",
        "q_sink_pivot_wide",
        "q_sink_python_ds",
        "q_maint_compact_files",
        "q_layout_zorder",
        "q_source_binaryfile",
    ]
    specs = all_specs()
    for name in sink_ops:
        a = sorted(tuple(r) for r in specs[name].fn(spark, SF_T1).collect())
        b = sorted(tuple(r) for r in specs[name].fn(spark, SF_T1).collect())
        assert a == b, name
        assert a, name


def test_decontamination_flags_planted_leak(spark):
    """Exact-duplicate texts that land in different splits are 100%
    contaminated; every ratio is within [0, 1]; test docs sharing no
    shingles with train score 0. Cross-checked against a pure-Python
    recomputation on a sample."""
    import hashlib

    from sd2_drp_experimentgen_spark.sources.tables import load_table

    rows = {
        r["doc_id"]: r
        for r in all_specs()["q_decontaminate_ngrams"].fn(spark, SF_T1).collect()
    }
    assert rows
    assert all(0.0 <= r["contamination"] <= 1.0 for r in rows.values())

    def split_of(doc_id: int) -> str:
        pre = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        return "train" if pre < "cc" else ("val" if pre < "e6" else "test")

    docs = load_table(spark, SF_T1, "documents").collect()
    train_sh = set()
    test_docs = {}
    for r in docs:
        t = r["text"].split(" ")
        if len(t) < 3:
            continue
        sh = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        s = split_of(r["doc_id"])
        if s == "train":
            train_sh |= sh
        elif s == "test":
            test_docs[r["doc_id"]] = sh
    assert set(test_docs) == set(rows)
    for did, sh in list(test_docs.items())[:25]:
        expect = len(sh & train_sh)
        assert rows[did]["n_shingles"] == len(sh)
        assert rows[did]["n_contaminated"] == expect, did


def test_count_min_sketch_bounds(spark):
    """CMS never underestimates, and at eps=0.001 over this fixture the
    overshoot is tiny."""
    rows = all_specs()["q_agg_count_min_sketch"].fn(spark, SF_T1).collect()
    assert rows
    for r in rows:
        assert r["exact"] >= 0
        assert r["cms_ok"] is True  # exact <= est <= exact + 50


def test_histogram_numeric_mass_and_range(spark):
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    row = all_specs()["q_agg_histogram_numeric"].fn(spark, SF_T1).collect()[0]
    total = load_table(spark, SF_T1, "lineitem").count()
    assert row["total_mass"] == total  # mass conserved
    assert row["n_bins_ok"] is True
    assert row["range_ok"] is True
    assert row["order_ok"] is True


def test_minhash_arrow_kernel_matches_column_form(spark):
    """r14: the batch minhash lane is a vectorized mapInArrow kernel;
    the streaming lane keeps the pure-Column projection. The two must
    stay BIT-IDENTICAL on the same input — signatures (m0..m15) and,
    under keep_shingles, the distinct shingle-hash array including its
    first-occurrence order. Compared on the real fixture corpus so
    tokenization edge cases (trailing separators, short docs) ride
    along."""
    from sd2_drp_experimentgen_spark.operators.llmtext import (
        _minhash_signatures_arrow,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    d = load_table(spark, SF_T1, "documents")

    arrow = sorted(
        tuple(r) for r in _minhash_signatures_arrow(d, True).collect()
    )
    # Column lane: the public function dispatches on isStreaming, so
    # rebuild the streaming-lane Column construction inline on the
    # batch frame (the DuckDB oracle in verify_local is the third
    # independent witness); here we pin arrow == column directly.
    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.operators.llmtext import (
        MINHASH_P,
        N_MINHASH,
    )

    t = F.split(F.col("text"), " ")
    dd = d.where(F.size(t) >= 3)
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(t, i), F.element_at(t, i + 1), F.element_at(t, i + 2)
    )
    idx = F.sequence(F.lit(1), F.size(t) - 2)
    mds = F.array_distinct(F.transform(idx, lambda i: F.md5(shingle(i))))
    hx = lambda m, s: (  # noqa: E731
        F.conv(F.substring(m, s, 12), 16, 10).cast("long") % MINHASH_P
    )
    hh = dd.select(
        "doc_id",
        mds.alias("mds"),
        F.transform(mds, lambda m: hx(m, 1)).alias("h1"),
        F.transform(mds, lambda m: hx(m, 13)).alias("h2"),
    )
    col_form = hh.select(
        "doc_id",
        "mds",
        *[
            F.array_min(
                F.zip_with(
                    "h1", "h2", lambda a, b: (a + F.lit(h) * b) % MINHASH_P
                )
            ).alias(f"m{h}")
            for h in range(N_MINHASH)
        ],
    )
    column = sorted(tuple(r) for r in col_form.collect())
    assert arrow == column


def test_winnow_arrow_kernel_matches_column_form(spark):
    """r14: the winnow fingerprint selection is a vectorized
    mapInArrow kernel (_winnow_fps_frame). It must stay BIT-IDENTICAL
    to the r13 Column construction on the same input — gram count and
    the distinct window-minima array INCLUDING its first-occurrence
    order (== F.array_distinct). Compared on the real fixture corpus
    so tokenization edge cases ride along."""
    from pyspark.sql import functions as F

    from sd2_drp_experimentgen_spark.operators.llmtext import (
        MINHASH_P,
        WINNOW_W,
        _winnow_fps_frame,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    arrow = sorted(
        (r["doc_id"], r["lang"], r["n_grams"], tuple(r["fps"]))
        for r in _winnow_fps_frame(spark, SF_T1).collect()
    )

    toks = F.split(F.col("text"), " ")
    d = load_table(spark, SF_T1, "documents").where(
        F.size(toks) >= WINNOW_W + 3
    )
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ",
        F.element_at(toks, i),
        F.element_at(toks, i + 1),
        F.element_at(toks, i + 2),
    )
    gh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.conv(F.substring(F.md5(shingle(i)), 1, 12), 16, 10)
        .cast("long")
        % MINHASH_P,
    )
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("gh")) - (WINNOW_W - 1)),
            lambda j: F.array_min(F.slice(F.col("gh"), j, WINNOW_W)),
        )
    )
    col_form = d.select("doc_id", "lang", gh.alias("gh")).select(
        "doc_id", "lang", F.size("gh").alias("n_grams"), fps.alias("fps")
    )
    column = sorted(
        (r["doc_id"], r["lang"], r["n_grams"], tuple(r["fps"]))
        for r in col_form.collect()
    )
    assert arrow == column


def test_phash_batch_kernel_matches_per_row_decode(spark):
    """r14: the perceptual-hash kernel shared by q_mm_phash_dedup and
    q_mm_corpus_pipeline is vectorized across the batch (_phash_batch:
    one fancy-index gather over the concatenated raster buffer). It
    must stay BIT-IDENTICAL to the per-row reference — a real
    _decode_ppm of every payload followed by the np.ix_ 8x8 sample,
    exact (R+G+B)//3 gray, horizontal-gradient bit packing — on the
    real fixture media table, so header edge cases (dims parsing,
    raster truncation) ride along."""
    import numpy as np

    from sd2_drp_experimentgen_spark.operators.multimodal import (
        _decode_ppm,
        _phash_batch,
        media_table,
    )

    pdf = media_table(spark, SF_T1).select("doc_id", "payload").toPandas()
    got_hash, got_px = _phash_batch(pdf["payload"])

    weights = np.int64(1) << (
        np.arange(8)[:, None] * 7 + np.arange(7)[None, :]
    )
    for i, payload in enumerate(pdf["payload"]):
        img = _decode_ppm(bytes(payload))
        h, w, _ = img.shape
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        patch = img[np.ix_(ys, xs)].astype(np.int64)
        gray = patch.sum(axis=2) // 3
        bits = gray[:, :7] > gray[:, 1:]
        assert int(got_hash[i]) == int((bits * weights).sum())
        assert int(got_px[i]) == h * w
    assert len(got_hash) == len(pdf)


def test_span_count_kernel_matches_column_form(spark):
    """r14: q_text_span_dup's _span_count_kernel (hashlib md5 digests +
    in-kernel per-doc Counter) must stay BIT-IDENTICAL to the r13
    Column reference — explode(transform(sequence, md5(concat_ws(8 x
    element_at)))) followed by groupBy(doc_id, h) — on the real
    fixture corpus, with the digest compared against unhex(hex)."""
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.llmtext import (
        SPAN_K,
        _span_count_kernel,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    d = load_table(spark, SF_T1, "documents")
    got = sorted(
        (r["doc_id"], bytes(r["h"]), r["k"])
        for r in d.select("doc_id", "text")
        .mapInArrow(_span_count_kernel, schema="doc_id long, h binary, k long")
        .collect()
    )

    toks = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (SPAN_K - 1))
    sh = d.where(F.size(toks) >= SPAN_K).select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.unhex(
                    F.md5(
                        F.concat_ws(
                            " ",
                            *[
                                F.element_at(toks, i + j)
                                for j in range(SPAN_K)
                            ],
                        )
                    )
                ),
            )
        ).alias("h"),
    )
    want = sorted(
        (r["doc_id"], bytes(r["h"]), r["k"])
        for r in sh.groupBy("doc_id", "h")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    )
    assert got and got == want


def test_bigram_count_kernel_matches_column_form(spark):
    """r14: q_text_bigram_lm_score's _bigram_count_kernel must stay
    BIT-IDENTICAL to the r13 Column reference — explode of the
    element_at HOF bigram chain followed by groupBy(doc_id, bigram) —
    on the real fixture corpus (raw bigram strings, no hashing)."""
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.llmtext import (
        _bigram_count_kernel,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    d = load_table(spark, SF_T1, "documents")
    got = sorted(
        tuple(r)
        for r in d.select("doc_id", "text")
        .mapInArrow(
            _bigram_count_kernel, schema="doc_id long, bigram string, k long"
        )
        .collect()
    )

    toks = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    bg = d.where(F.size(toks) >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            )
        ).alias("bigram"),
    )
    want = sorted(
        tuple(r)
        for r in bg.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    )
    assert got and got == want


def test_shingle3_kernel_matches_column_form(spark):
    """r14: the shared _shingle3_kernel (q_decontaminate_ngrams) must
    stay BIT-IDENTICAL to the r13 Column reference —
    array_distinct(transform(sequence, md5(3-token concat_ws))) — on
    the real fixture corpus, digests compared against unhex(hex)."""
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.llmtext import (
        _shingle3_kernel,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    d = load_table(spark, SF_T1, "documents")
    got = sorted(
        (r["doc_id"], bytes(r["sh"]))
        for r in d.select("doc_id", "text")
        .mapInArrow(_shingle3_kernel, schema="doc_id long, sh binary")
        .collect()
    )

    toks = F.split(F.col("text"), " ")
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ",
        F.element_at(toks, i),
        F.element_at(toks, i + 1),
        F.element_at(toks, i + 2),
    )
    idx = F.sequence(F.lit(1), F.size(toks) - 2)
    ref = d.where(F.size(toks) >= 3).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(idx, lambda i: F.unhex(F.md5(shingle(i))))
            )
        ).alias("sh"),
    )
    want = sorted((r["doc_id"], bytes(r["sh"])) for r in ref.collect())
    assert got and got == want


def test_simhash_kernel_matches_column_form(spark):
    """r14: q_dedup_simhash's kernel (one hashlib md5 per distinct
    token, occurrence-weighted votes) must stay BIT-IDENTICAL to the
    r13 Column reference — per-occurrence token explode x 16 bit rows,
    parity votes, sign per (doc, bit) — on the real fixture corpus."""
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.llmtext import (
        _simhash_kernel,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    d = load_table(spark, SF_T1, "documents")
    got = sorted(
        tuple(r)
        for r in d.select("doc_id", "text")
        .mapInArrow(_simhash_kernel, schema="doc_id long, simhash16 long")
        .collect()
    )

    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    bits = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"),
        F.col("token"),
    )
    vote = F.when(
        F.ascii(F.substring(F.md5(F.col("token")), F.col("b") + 1, 1)) % 2
        == 1,
        1,
    ).otherwise(-1)
    per_bit = (
        bits.select("doc_id", "b", vote.alias("v"))
        .groupBy("doc_id", "b")
        .agg(F.when(F.sum("v") > 0, 1).otherwise(0).alias("bit"))
    )
    ref = per_bit.groupBy("doc_id").agg(
        F.sum(F.col("bit") * F.expr("shiftleft(1, b)")).alias("simhash16")
    )
    want = sorted(tuple(r) for r in ref.collect())
    assert got and got == want


def test_fp_shingle_kernel_matches_column_form(spark):
    """r14: q_doc_fingerprint_shingle's kernel must stay BIT-IDENTICAL
    to the r13 Column reference (md5(text) + array_min of 3-token
    shingle md5 hex strings) on the real fixture corpus — including
    the NULL min for docs with < 3 tokens."""
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.llmtext import (
        _fp_shingle_kernel,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    d = load_table(spark, SF_T1, "documents")
    got = sorted(
        tuple(r)
        for r in d.select("doc_id", "text")
        .mapInArrow(
            _fp_shingle_kernel,
            schema="doc_id long, fp string, min_shingle_sig string",
        )
        .collect()
    )

    toks = F.split(F.col("text"), " ")
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            )
        ),
    )
    ref = d.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp"),
        F.array_min(shingles).alias("min_shingle_sig"),
    )
    want = sorted(tuple(r) for r in ref.collect())
    assert got and got == want


def test_trigram_partial_kernel_matches_column_form(spark):
    """r14: q_text_ngram_profile's partial-count kernel summed per
    (lang, gram) must stay BIT-IDENTICAL to the r13 Column reference —
    explode of the substring HOF chain with a count aggregate — on the
    real fixture corpus."""
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.llmtext import (
        _trigram_partial_kernel,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    d = load_table(spark, SF_T1, "documents").where(F.length("text") >= 3)
    got = sorted(
        tuple(r)
        for r in d.select("lang", "text")
        .mapInArrow(
            _trigram_partial_kernel, schema="lang string, gram string, pn long"
        )
        .groupBy("lang", "gram")
        .agg(F.sum("pn").alias("n"))
        .collect()
    )

    grams = d.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            )
        ).alias("gram"),
    )
    want = sorted(
        tuple(r)
        for r in grams.groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got and got == want


def test_gram5_count_kernel_matches_column_form(spark):
    """r14: q_corpus_novelty_curve's _gram5_count_kernel must stay
    BIT-IDENTICAL to the r13 Column reference — explode of the 5-gram
    md5 transform with a (doc_id, h) count — on the real fixture
    corpus, digests compared against unhex(hex)."""
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.text import (
        _gram5_count_kernel,
    )
    from sd2_drp_experimentgen_spark.sources.tables import load_table

    d = load_table(spark, SF_T1, "documents")
    got = sorted(
        (r["doc_id"], bytes(r["h"]), r["k"])
        for r in d.select("doc_id", "text")
        .mapInArrow(_gram5_count_kernel, schema="doc_id long, h binary, k long")
        .collect()
    )

    sh = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 5), "
                    "i -> unhex(md5(concat_ws(' ', w[i], w[i+1], w[i+2], "
                    "w[i+3], w[i+4]))))"
                )
            ).alias("h"),
        )
    )
    want = sorted(
        (r["doc_id"], bytes(r["h"]), r["k"])
        for r in sh.groupBy("doc_id", "h")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    )
    assert got and got == want


def test_set_pair_counts_matches_self_join_reference(spark):
    """r14 continuation: the single-pass set-pair kernel behind
    q_corpus_overlap_matrix / q_graph_common_neighbors must stay
    BIT-IDENTICAL to the r13 distinct + self-join form on the real
    fixture corpus — pair counts (lo < hi) AND the singleton
    denominators (lo = hi) in one frame."""
    import pyspark.sql.functions as F

    from sd2_drp_experimentgen_spark.operators.text import _set_pair_counts
    from sd2_drp_experimentgen_spark.sources.tables import load_events

    e = load_events(spark, SF_T1).select("user_id", "event_type")
    sets = e.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("ss")
    )
    got = sorted(
        tuple(r)
        for r in _set_pair_counts(sets, "ss", "lo", "hi").collect()
    )

    de = e.distinct()
    pairs = (
        de.alias("a")
        .join(
            de.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("lo"),
            F.col("b.event_type").alias("hi"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    singles = de.groupBy(
        F.col("event_type").alias("lo"), F.col("event_type").alias("hi")
    ).agg(F.count(F.lit(1)).alias("n"))
    want = sorted(tuple(r) for r in pairs.unionAll(singles).collect())
    assert got and got == want
