"""AST guard: unpartitioned windows must be allowlisted with a
boundedness argument (VERDICT r6 item 4).

A ``Window.orderBy(...)`` without ``partitionBy`` (or an empty
``Window.partitionBy()``) is a single-task global sort — the textbook
100 TB stall — UNLESS its input is bounded by construction (a score
histogram, a decile rollup, a 96-row plate, a calendar-day series).
Every such site in the operators package must appear in the allowlist
below, naming the argument for why its input cannot grow with the
data. A new global window fails this test loudly; a removed one turns
its allowlist row stale and fails too, keeping the list honest.

Companion to tests/test_no_driver_collect.py (same discipline for
``.collect()``).
"""

from __future__ import annotations

import ast
import pathlib

OPS = pathlib.Path(__file__).parent.parent / "sd2_drp_experimentgen_spark"

# (module, enclosing function) -> boundedness argument. Windows here
# run over aggregates whose row count is fixed by construction, not by
# the data volume — except the two explicitly-documented deliberate
# global sorts, called out as such.
ALLOWED: dict[tuple[str, str], str] = {
    ("aggregates.py", "q_ml_auc_rank"):
        "per-distinct-score histogram: |scores| rows (integer-valued "
        "score), not |rows|; partitioned form shown in q_ml_auc_by_group",
    ("aggregates.py", "q_ml_gini_stump"):
        "per-distinct-score histogram (prefix class counts per split)",
    ("aggregates.py", "q_ml_pr_curve_points"):
        "per-distinct-score histogram (prefix TP/FP per threshold)",
    ("aggregates.py", "q_ml_ks_statistic"):
        "per-distinct-score histogram (prefix CDFs per class)",
    ("aggregates.py", "q_ml_lift_gains"):
        "per-distinct-score histogram (prefix positives per threshold)",
    ("aggregates.py", "q_ml_cost_threshold"):
        "per-distinct-score histogram (prefix cost per threshold)",
    ("aggregates.py", "q_stat_spearman"):
        "hourly rollup: |hours| rows, calendar-bounded",
    ("etl.py", "q_stat_chi_square_cells"):
        "margins over the event_type x segment cell table (<=25 rows)",
    ("etl.py", "q_stat_pmi_cells"):
        "margins over the event_type x segment cell table (<=25 rows)",
    ("etl.py", "auc_stats"):
        "per-distinct-score histogram shared by the incremental-AUC fold",
    ("text.py", "_doc_masks"):
        "token bit-index over the vocabulary aggregate, <= 63 rows by the "
        "ND_BITSET_VOCAB_MAX gate (the bitset paths only exist below it)",
    ("events_windows.py", "q_ts_changepoint_cusum"):
        "daily series: |days| rows, calendar-bounded",
    ("events_windows.py", "q_ts_autocorrelation"):
        "hourly series: |hours| rows, calendar-bounded",
    ("events_windows.py", "q_win_bollinger_breakouts"):
        "daily revenue series: |days| rows, calendar-bounded",
    ("experiment.py", "q_gen_experiment_pipeline"):
        "generated concentration grid: fixed generator size, data-free",
    ("experiment.py", "q_gen_randomized_plate_layout"):
        "global slot order over the top-384 plate sample (LAYOUT_SAMPLES "
        "rows by construction — the q_wellplate_labels argument); the "
        "stratum rank and within-plate shuffle windows are partitioned",
    ("llmtext.py", "pack"):
        "DELIBERATE documented global sort (q_pack_policy_compare): "
        "offline packing-policy study needs one total order over "
        "16-byte (doc_id, n_tokens) pairs — the docstring prices it",
    ("llmtext.py", "q_text_vocab_coverage"):
        "token vocabulary ordered by frequency: |V| rows, "
        "sublinear in corpus size (documented)",
    ("scalars.py", "q_wellplate_labels"):
        "96-row plate after LIMIT — constant",
    ("sorts.py", "q_sort_pareto_frontier"):
        "RANGE merge over pre-filtered per-partition skyline "
        "candidates — bounded by the local-skyline reduction",
    ("streaming_ops.py", "q_stream_eval_auc"):
        "per-distinct-score histogram maintained as streaming state",
    ("text.py", "q_text_vocab_growth"):
        "10-row decile rollup — constant",
    ("vectors.py", "_id_rank"):
        "prefix-sum over the 32-bucket offset table (<= 33 rows by "
        "construction) — the distributed two-phase id-rank; the "
        "per-id window below it IS partitioned (by bucket)",
}


def _unpartitioned_window_sites() -> set[tuple[str, str]]:
    sites: set[tuple[str, str]] = set()
    for path in sorted((OPS / "operators").glob("*.py")):
        tree = ast.parse(path.read_text())
        funcs = [
            (n.lineno, n.end_lineno or n.lineno, n.name)
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]

        def enclosing(ln: int) -> str:
            best = None
            for s, e, name in funcs:
                if s <= ln <= e and (best is None or s > best[0]):
                    best = (s, name)
            return best[1] if best else "<module>"

        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "Window"
            ):
                continue
            attr = node.func.attr
            if attr == "orderBy" or (attr == "partitionBy" and not node.args):
                sites.add((path.name, enclosing(node.lineno)))
    return sites


def test_every_global_window_is_allowlisted_with_boundedness():
    found = _unpartitioned_window_sites()
    new = found - set(ALLOWED)
    assert not new, (
        "unpartitioned Window without a boundedness argument (a global "
        f"single-task sort at scale): {sorted(new)} — either partition "
        "it (see q_crm_rfm_segments' distributed-ntile recipe / "
        "q_ml_auc_by_group's partitioned form) or allowlist it in "
        "tests/test_window_guard.py with the reason its input is "
        "bounded by construction"
    )
    stale = set(ALLOWED) - found
    assert not stale, f"stale allowlist rows (site removed): {sorted(stale)}"


def test_allowlist_reasons_are_substantive():
    for key, reason in ALLOWED.items():
        assert len(reason) >= 20, f"{key}: boundedness argument too thin"
