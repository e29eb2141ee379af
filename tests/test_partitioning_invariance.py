"""Partitioning-invariance: the SURVEY §5.3 determinism claim under
actual execution-layout changes.

Every query must return identical values when the cluster knobs move —
different shuffle-partition counts and input-split sizes change task
boundaries, reduction order, and row arrival order, which is exactly
what a 1000-executor deployment does to a local[32] plan. The sample
below covers the shapes most at risk: float aggregation (reduction
order), windows (per-partition sort), hash sampling and packing
(partition-id temptations), near-dup joins, and iterative graph
propagation.
"""

from __future__ import annotations

import pytest

from sd2_drp_experimentgen_spark.plans import all_specs
from sd2_drp_experimentgen_spark.session import configure_session
from tests.conftest import SF_T1

SENSITIVE = [
    "q_agg_groupby_q1",       # float sums, r4 after final merge
    "q_mix_weighted_avg",     # weighted mean per 1.5k groups
    "q_sample_hash_fraction",  # sampling must not see partition ids
    "q_pack_sequences",       # cumsum/budget packing
    "q_win_running",          # running windows over events
    "q_neardup_jaccard",      # prefix-filtered self-join
    "q_dedup_components",     # iterative label propagation
    "q_emb_quantize_int8",    # vectorized quantization checksums
    "q_llm_corpus_pipeline",  # composed dedup/split/decontam/packing
    "q_sample_exact_k",       # global top-k by hash
    # round-5 additions most at risk under layout changes:
    "q_emb_pca_power",        # iterative fixed-point linear algebra —
                              # gram partials merge in task order
    "q_mm_phash_dedup",       # mapInPandas batch boundaries move
    "q_sim_range_search",     # per-label numpy gram matrix, row order
                              # inside each group changes with splits
    "q_corpus_upsample_epochs",  # explode + md5-coin subset
    "q_graph_bfs_hops",       # iterative frontier min-propagation
    "q_dedup_threshold_curve",  # four thresholds over one ppjoin pass
    "q_events_seq_examples",  # lag windows + bounded rollup
    "q_text_feature_hashing",  # stateless bucketing, partial counts
    # round-6 batch-4/5 additions most at risk:
    "q_ml_auc_rank",          # histogram partials merge order + global
                              # prefix window
    "q_ts_autocorrelation",   # gap-fill grid + integer lag join, float
                              # sqrt chain from int sums
    "q_graph_common_neighbors",  # distinct-edge self-join fan-out
    "q_emb_silhouette",       # exact-int centroid distances + per-row
                              # sqrt chain quantized before the rollup
    "q_stat_spearman",        # doubled-rank windows over the hourly
                              # rollup, float only in the final chain
    # round-7 bucket-form rewrite: collect_list arrival order varies
    # with task layout — sort_array must fully normalize it before the
    # in-bucket pair generation
    "q_dedup_winnow_pairs",
    # round-14 additions most at risk:
    "q_ann_index_append",     # two partitioned writes + append: file
                              # layout and task boundaries move, yet
                              # the append-vs-rebuild full-outer join
                              # must stay row-identical
    "q_ann_ivfpq_recall_curve",  # windows per (nprobe, query) over a
                              # theta-join: tie-breaks must come from
                              # the ORDER BY, never arrival order
    "q_gen_randomized_plate_layout",  # three hash-order windows; the
                              # md5 ranks must be layout-independent
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(row[c]) for c in cols) for row in df.collect()
    )


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_layout_change(spark, name):
    from sd2_drp_experimentgen_spark.functions.helpers import (
        release_persisted,
    )

    base = _canon(all_specs()[name].fn(spark, SF_T1))
    # Drop tracked caches (the persisted dedup bucket tables): the
    # CacheManager is shared across sessions in one JVM, so without
    # this the alt-layout run would read the base layout's cached
    # buckets and the invariance check would compare the cache to
    # itself instead of recomputing under the new task boundaries.
    release_persisted()

    alt = spark.newSession()
    configure_session(alt)
    # prime-count shuffle + tiny input splits: different task
    # boundaries, different merge order, many single-row-group splits
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    alt.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    alt.conf.set("spark.sql.files.openCostInBytes", "0")
    got = _canon(all_specs()[name].fn(alt, SF_T1))
    assert got == base, f"{name} changed under a different physical layout"
