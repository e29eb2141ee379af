"""Central query registry — the SURVEY.md §2 operator inventory.

Each operator module registers its queries with the ``@register``
decorator; ``all_specs()`` imports every operator module (idempotent) and
returns the merged registry. ``__spark_entry__.py`` derives its
``queries()`` / ``oracle_sql()`` dicts from here, so a query is "declared"
to the driver exactly when its module registers it.

Determinism contract for every registered query (SURVEY §5.3): float
outputs rounded 4-6dp on both sides, every ORDER BY ends in a unique key,
integer SUMs cast to BIGINT in the oracle, no raw nanosecond timestamps
emitted, computed columns aliased identically in Spark and SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Operator modules that populate the registry on import.
_OPERATOR_MODULES = [
    "scans",
    "scalars",
    "experiment",
    "storage",
    "etl",
    "graph",
    "joins",
    "aggregates",
    "windows",
    "sorts",
    "setops",
    "text",
    "llmtext",
    "vectors",
    "udfs",
    "events_windows",
    "streaming_ops",
    "multimodal",
    "ml",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL; None => rows-only check
    tier: str  # P0 / P1 / P2
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str, oracle: str | None = None, tier: str = "P1", doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tier, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(f"sd2_drp_experimentgen_spark.operators.{mod}")
    _LOADED = True


# Queries that already hold a green row in CORRECTNESS_r01.json (the
# round-1 driver verified exactly the first 50 registry entries before
# exhausting its budget). all_specs() yields not-yet-driver-verified
# queries FIRST so a budget-bound verify spends its window on the
# operators that still need a driver-proven row; hash-checkable ones
# precede rows-only ones (a rows-only driver row is the weaker signal).
# Registration order (module import order) is unchanged — only the
# iteration order of the returned dict is prioritized.
_R1_DRIVER_VERIFIED = frozenset(
    {
        "q_scan_project", "q_scan_prune_filter", "q_source_csv_roundtrip",
        "q_sink_json_spec", "q_sink_parquet_partitioned", "q_filter_pred_q6",
        "q_filter_in_like_null", "q_proj_arith_case", "q_gen_stateset_grid",
        "q_str_funcs", "q_regexp_funcs", "q_date_funcs", "q_math_funcs",
        "q_json_extract", "q_array_funcs", "q_map_funcs", "q_wellplate_labels",
        "q_null_funcs", "q_decimal_exact_money", "q_gen_experiment_pipeline",
        "q_join_bucketed", "q_agg_skew_salted", "q_unpivot_stack",
        "q_sample_hash_fraction", "q_resample_gapfill", "q_merge_upsert",
        "q_dedup_components", "q_join_inner_equi", "q_join_broadcast",
        "q_join_multiway_topk", "q_join_left_outer", "q_join_semi",
        "q_join_anti", "q_join_full_outer", "q_join_cross", "q_join_theta",
        "q_join_interval", "q_join_asof", "q_sql_q5_join_chain",
        "q_agg_global", "q_agg_groupby_q1", "q_agg_having", "q_agg_distinct",
        "q_mix_weighted_avg", "q_agg_approx_distinct", "q_agg_approx_percentile",
        "q_agg_stats", "q_agg_percentile", "q_agg_conditional_pivot",
        "q_agg_rollup",
    }
)


# Queries added in round 2+ (never seen by any driver). They verify
# AFTER the round-1 backlog of hash-checkable queries — the backlog is
# judge-flagged as the top gap — but before rows-only and already-green
# entries.
_NEW_THIS_ROUND = frozenset(
    {
        "q_sink_pivot_wide",
        "q_agg_window_distinct",
        "q_sample_stratified",
        "q_text_ngram_profile",
        "q_stream_foreachbatch_upsert",
        "q_win_moving_median",
        "q_agg_mode_deterministic",
        "q_source_orc_roundtrip",
        "q_graph_pagerank",
        "q_event_transitions",
        "q_profile_table",
        "q_source_python_ds",
        "q_stream_python_source",
        "q_udf_cogrouped",
        "q_text_repetition",
        "q_emb_quantize_int8",
        "q_ann_srp_buckets",
        "q_sql_q3_shipping",
        "q_source_binaryfile",
        "q_dedup_minhash_bands",
        "q_time_downsample_ohlc",
        "q_win_gap_islands",
        "q_scd2_dimension",
        "q_histogram_fixed_bins",
        "q_maint_compact_files",
        "q_sql_recursive_cte",
        "q_sql_pivot_clause",
        "q_variant_json",
        "q_stream_static_join",
        "q_interval_sweepline",
        "q_layout_zorder",
        "q_agg_hll_sketch_merge",
        "q_source_csv_malformed",
        "q_source_schema_evolution",
        "q_sink_python_ds",
        "q_dedup_lsh_refine",
        "q_source_xml_roundtrip",
        "q_split_train_val_test",
        "q_sample_weighted",
        "q_pack_sequences",
        "q_event_attribution",
        "q_join_null_safe",
        "q_udf_arrow_scalar",
        "q_stream_ohlc_watermarked",
        "q_set_intersect_all",
        "q_set_except_all",
        "q_gen_date_dim",
        "q_sql_lateral_topk",
        "q_agg_listagg",
        "q_explode_outer_nulls",
        "q_try_functions",
        "q_union_by_name",
        "q_agg_grouping_id",
        "q_json_to_struct",
        "q_win_rolling_distinct",
        "q_decontaminate_ngrams",
        "q_udf_map_in_arrow",
        "q_agg_bitmap_distinct",
        "q_agg_percentile_disc",
        "q_win_range_interval",
        "q_gen_surrogate_keys",
        "q_agg_regression",
        "q_agg_count_min_sketch",
        "q_agg_bitwise",
        "q_pandas_api_groupby",
        "q_agg_histogram_numeric",
    }
)


def _driver_priority(item: tuple[str, QuerySpec]) -> int:
    name, spec = item
    if name in _R1_DRIVER_VERIFIED:
        return 3
    if spec.oracle is None:
        return 2
    return 1 if name in _NEW_THIS_ROUND else 0


def all_specs() -> dict[str, QuerySpec]:
    _load()
    items = list(_REGISTRY.items())
    items.sort(key=_driver_priority)  # stable: keeps registration order per tier
    return dict(items)


def get_spec(name: str) -> QuerySpec:
    _load()
    return _REGISTRY[name]
