"""Scale guard (VERDICT r1 item 8): no relational operator may route
data through the driver. Walks every operator module's AST and asserts
.collect()/.toPandas() calls appear only in the explicitly sanctioned
functions — the gated small-side broadcast, the bounded query-row
fetch, and pytest-only quality helpers. Adding a driver collect to any
other operator fails this test with the offending (module, function).
"""

from __future__ import annotations

import ast
from pathlib import Path

OPERATORS_DIR = (
    Path(__file__).resolve().parent.parent
    / "sd2_drp_experimentgen_spark"
    / "operators"
)

# (module, enclosing function) pairs sanctioned to materialize rows on
# the driver, each with a documented scale story:
ALLOWED = {
    # Gated on BROADCAST_MAX_ROWS; block-partitioned fallback beyond it.
    ("vectors.py", "_embeddings_matrix"),
    # Collects exactly PQ_K (16) codebook rows — a constant-size
    # codebook regardless of data volume (KBs at any scale).
    ("vectors.py", "_pq_centroids"),
    # Collects the d x d gram aggregate (4096 int64 cells) — bounded
    # by the embedding DIMENSION, independent of row count; the power
    # iteration over it is O(d^2) driver math (r14: the distributed
    # 3-round join loop over those same 4096 rows cost 7.7 s of pure
    # scheduling vs 0.9 s; results bit-identical, pytest-forced in
    # tests/test_selfchecks.py).
    ("vectors.py", "q_emb_pca_power"),
    # Collects exactly n_queries (20) rows — the small side by definition.
    ("ml.py", "q_ann_ivf_topk"),
    # Collects the probed coarse-cell ids, bounded by IDX_N_QUERIES *
    # IVFPQ_NPROBE = 12 values by construction — the static partition
    # filter that makes the stored-index scan prune directories
    # instead of depending on runtime DPP.
    ("vectors.py", "q_ann_index_partitioned"),
    # Same bounded probe-cell collect (<= 12 ids by construction),
    # factored into the shared probe-plan helper of the stored-index
    # lifecycle family (append / compact reuse it; the DPP variant
    # ann_index_probe_dpp is the sanctioned no-collect form).
    ("vectors.py", "_index_probe_plan"),
    # pytest-only quality helper, never in a registered query's lineage.
    ("ml.py", "kmeans_quality"),
    # Collects 5 serialized sketches + 3 hot-user rows — sketches exist
    # precisely so the driver-side state is KBs regardless of scale.
    ("aggregates.py", "q_agg_count_min_sketch"),
    # Collects the DESCRIBE EXTENDED 'Statistics' catalog row (pure
    # metadata, one row per table, size-independent of the data).
    ("storage.py", "q_catalog_stats_cbo"),
    # Collects the 25-row nation-grain aggregate 3x to self-check that
    # join hints don't change the answer — bounded by the dimension
    # cardinality, not the fact table.
    ("storage.py", "q_join_hints"),
    # Collects the ONE-row audit-counter aggregate over staged files —
    # the publish/reject decision is a driver-side branch on three
    # scalars regardless of staged volume.
    ("storage.py", "q_sink_write_audit_publish"),
}

DRIVER_SINKS = {"collect", "toPandas"}


def _offenders(path: Path):
    tree = ast.parse(path.read_text())
    hits = []

    class V(ast.NodeVisitor):
        def __init__(self):
            self.stack = []

        def visit_FunctionDef(self, node):
            self.stack.append(node.name)
            self.generic_visit(node)
            self.stack.pop()

        visit_AsyncFunctionDef = visit_FunctionDef

        def visit_Call(self, node):
            f = node.func
            if isinstance(f, ast.Attribute) and f.attr in DRIVER_SINKS:
                fn = self.stack[0] if self.stack else "<module>"
                hits.append((path.name, fn))
            self.generic_visit(node)

    V().visit(tree)
    return hits


def test_no_unsanctioned_driver_collect():
    found = set()
    for path in sorted(OPERATORS_DIR.glob("*.py")):
        found.update(_offenders(path))
    rogue = found - ALLOWED
    assert not rogue, (
        f"driver-side materialization crept into {sorted(rogue)}; either "
        "make the operator distributed or add it to ALLOWED with a "
        "documented scale story"
    )


def test_allowed_list_is_current():
    """ALLOWED must not go stale — every sanctioned site still exists."""
    found = set()
    for path in sorted(OPERATORS_DIR.glob("*.py")):
        found.update(_offenders(path))
    gone = ALLOWED - found
    assert not gone, f"stale ALLOWED entries (refactored away?): {sorted(gone)}"


# Callers of _embeddings_matrix that are allowed to SKIP the
# BROADCAST_MAX_ROWS gate, each with a documented reason:
MATRIX_CALLERS_UNGATED = {
    # pytest-only library entry (never registered; bounded query list).
    ("vectors.py", "cosine_topk_for_queries"),
}


def _matrix_callers(path):
    """(module, function, has_gate) for every function whose body calls
    _embeddings_matrix; has_gate = a BROADCAST_MAX_ROWS reference in
    the SAME function's AST (the gate must live in the caller, not the
    helper — VERDICT r5 wrong-#2: sanctioning the helper wholesale let
    an ungated caller ship)."""
    tree = ast.parse(path.read_text())
    out = []
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        calls_matrix = False
        has_gate = False
        for sub in ast.walk(node):
            if isinstance(sub, ast.Call):
                f = sub.func
                name = f.id if isinstance(f, ast.Name) else getattr(f, "attr", "")
                if name == "_embeddings_matrix":
                    calls_matrix = True
            if isinstance(sub, ast.Name) and sub.id == "BROADCAST_MAX_ROWS":
                has_gate = True
        if calls_matrix and node.name != "_embeddings_matrix":
            out.append((path.name, node.name, has_gate))
    return out


def test_every_embeddings_matrix_caller_is_gated():
    """Every function that collects the embedding matrix via the
    _embeddings_matrix helper must contain the BROADCAST_MAX_ROWS
    gate in its OWN body (broadcast fast path below, blocked fallback
    above) — or be enumerated in MATRIX_CALLERS_UNGATED with a reason.
    Reverting any gate (e.g. q_emb_knn_graph's, added r6) fails here."""
    ungated = []
    seen = set()
    for path in sorted(OPERATORS_DIR.glob("*.py")):
        for mod, fn, has_gate in _matrix_callers(path):
            seen.add((mod, fn))
            if not has_gate and (mod, fn) not in MATRIX_CALLERS_UNGATED:
                ungated.append((mod, fn))
    assert not ungated, (
        f"ungated driver-side embedding-matrix collect in {sorted(ungated)}; "
        "add the BROADCAST_MAX_ROWS branch with a blocked fallback "
        "(see q_sim_cosine_topk) or justify an entry in "
        "MATRIX_CALLERS_UNGATED"
    )
    stale = MATRIX_CALLERS_UNGATED - seen
    assert not stale, f"stale MATRIX_CALLERS_UNGATED entries: {sorted(stale)}"
