"""Bench harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line the driver records as BENCH_r{N}.json.

Protocol mirrors BASELINE.md: one shared warm SparkSession (cold start
excluded), one warm-up run per query, then the MIN of three timed runs
with the result fully materialized via collect(). Min-of-N is the
noise-robust estimator for a shared machine — r1 showed ±3× swings in
single timed runs under co-tenant load with an identical plan; the min
converges to the true cost of the plan, which is what the gate grades.
(VERDICT r9 item 5: min-of-2 → min-of-3, and the JSON line now stamps
os.getloadavg() before and after the run plus the cpu count, so a
uniform drift across queries self-documents as ambient co-tenant load
instead of burning a verdict cycle distinguishing noise from
regression.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sd2_drp_experimentgen_spark.functions.helpers import (  # noqa: E402
    release_persisted,
)
from sd2_drp_experimentgen_spark.plans import all_specs  # noqa: E402
from sd2_drp_experimentgen_spark.session import get_spark  # noqa: E402

# Headline set: the shapes BASELINE.md records probe numbers for, plus
# flagship extensions as they land.
HEADLINE = [
    "q_agg_groupby_q1",
    "q_join_multiway_topk",
    "q_filter_pred_q6",
    "q_win_rank_topn",
    "q_stream_tumbling_1h",
    "q_text_tokenize_counts",
    "q_mix_weighted_avg",
    "q_dedup_exact_docs",
    "q_sim_cosine_topk",
    "q_join_interval",
    "q_stream_session_30m",
    "q_join_asof",
    "q_train_features_wide",
    "q_tfidf_top_terms",
    "q_dedup_embedding_nn",
    # LLM-data-pipeline headliners (VERDICT r6 item 6): the signature
    # compositions and the post-gate kNN graph get a per-round
    # regression tripwire of their own — the original 15 predate the
    # whole LLM layer.
    "q_llm_corpus_pipeline",
    "q_dedup_lsh_refine",
    "q_mm_corpus_pipeline",
    "q_emb_knn_graph",
    "q_ml_auc_rank",
    # r7 headline rewrite: winnowing match pairs (bucket form + fan_out,
    # 8.2 s -> 1.4 s at sf0.1) — tripwired so the rewrite can't silently
    # regress.
    "q_dedup_winnow_pairs",
    # r9: the derived-partsupp TPC-H completions — Q9 is the heaviest
    # join tree in the registry (6 tables incl. a fact-fact pair),
    # tripwired from birth; Q2/Q11 ride along as the correlated-min
    # and threshold-subquery archetypes.
    "q_tpch_q2_min_cost_supplier",
    "q_tpch_q9_product_profit",
    "q_tpch_q11_important_stock",
    # r12 (VERDICT r11 item 3): iterative-graph tripwires — the family
    # had 5 plans rewritten in r11 and was the only scale-studied
    # family with no per-round regression check. PageRank and BFS are
    # the two cheap-at-sf0.1 rungs (the components/triangle rungs stay
    # SCALE.md-only at 10-15 s each); recorded-number targets in
    # BASELINE.md per the r7 precedent for shapes without probe rows.
    "q_graph_pagerank",
    "q_graph_bfs_hops",
]


# The driver records only the LAST ~2 KB of stdout and structurally
# parses the final JSON line (BENCH_r10's line outgrew that window once
# the per-run spreads landed, degrading the round's record to
# parsed:null — VERDICT r10 item 2). The final line therefore carries
# ONLY the compact summary (per-query mins + load stamps), hard-capped
# by tests/test_bench_line.py, while the full three-run spreads are
# emitted as a separate PRECEDING line and mirrored to a sidecar file.
DRIVER_TAIL_BYTES = 2000
RUNS_SIDECAR = "BENCH_RUNS_LATEST.json"


def build_summary(
    timings: dict[str, float],
    sf: float,
    load_before: tuple[float, ...],
    load_after: tuple[float, ...],
) -> dict:
    """The compact final-line payload. Everything the gate and the
    noise-band protocol need; nothing that grows with run count."""
    return {
        "metric": "headline_total_warm",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Ambient-load context (VERDICT r9 item 5): 1/5/15-min load
        # averages straddling the run + the cpu count the local[]
        # master actually got. BASELINE.md's noise-band protocol reads
        # these before calling a drift a riser.
        "loadavg_before": load_before,
        "loadavg_after": load_after,
        "cpus": os.cpu_count(),
        "timed_runs": 3,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    # Fixture-drift tripwire (VERDICT r3): fail with ONE clear message
    # if the driver regenerated the parquet with an unexpected schema,
    # instead of crashing mid-bench with an opaque analysis error.
    from sd2_drp_experimentgen_spark.sources.preflight import (
        assert_fixture_schemas,
    )

    assert_fixture_schemas(sf_dir)

    load_before = tuple(round(x, 2) for x in os.getloadavg())

    spark = get_spark(app_name="sd2drp-bench", shuffle_partitions=32)

    specs = all_specs()
    names = [n for n in HEADLINE if n in specs]
    timings: dict[str, float] = {}
    runs_all: dict[str, list[float]] = {}

    # NO forced GC anywhere in the sweep — a MEASURED decision, twice
    # (r12, when the iterative-graph tripwires brought localCheckpoint
    # blocks into the headline set): the study-style _drop_checkpoints
    # (gc.collect + System.gc) was tried BETWEEN TIMED RUNS (sweep
    # 20.5 s -> 28.4 s; pagerank's own min 2.65 -> 3.34 s) and AT
    # QUERY BOUNDARIES (sweep -> 24.6 s; the collector's background
    # phase bleeds into the NEXT query's timed runs) — both REJECTED.
    # The carryover it would cure is unmeasurable at sf0.1 (graph-rung
    # runs DECREASE across the three timings, [4.08, 3.87, 3.60]);
    # where block residue genuinely mattered — x32+ in one JVM — the
    # scale study keeps its own _drop_checkpoints between its runs.
    for name in names:
        fn = specs[name].fn
        fn(spark, sf_dir).collect()  # warm-up (JIT, file listing, broadcast)
        release_persisted()
        runs: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            # drop tracked caches INSIDE the timing loop: a query that
            # persists its bucket/index table must pay the full build
            # in every timed run, or the tripwire would measure cache
            # reads and hide pipeline regressions behind the warm-up
            runs.append(round(time.perf_counter() - t0, 4))
            release_persisted()
        timings[name] = min(runs)
        runs_all[name] = runs

    # All three timed runs per query: the in-file variance evidence
    # BASELINE.md's noise-band protocol reads when deciding whether a
    # riser is ambient load (wide spread, uniform across queries) or a
    # plan change (tight spread at a new level). Emitted BEFORE the
    # summary so the driver's tail capture never truncates the parsed
    # line, and mirrored to a sidecar file for post-hoc reads.
    detail = json.dumps({"detail": "bench_runs", "runs": runs_all})
    print(detail)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), RUNS_SIDECAR),
            "w",
        ) as f:
            f.write(detail + "\n")
    except OSError:
        pass  # a read-only checkout still gets the stdout copy

    summary = build_summary(
        timings,
        sf,
        load_before,
        tuple(round(x, 2) for x in os.getloadavg()),
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
