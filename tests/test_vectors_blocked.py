"""Block-partitioned pairwise vector plans (the >BROADCAST_MAX_ROWS
fallback) must be bit-identical to the broadcast-matrix fast path —
same rounding-before-ranking rule, same tiebreaks (ADVICE r1: gate the
collect and degrade gracefully, not a driver-OOM cliff)."""

from __future__ import annotations

from tests.conftest import SF_T2


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_topk_pairs_blocked_matches_broadcast(spark, monkeypatch):
    from sd2_drp_experimentgen_spark.operators import vectors

    fast = _rows(vectors.q_sim_cosine_topk(spark, SF_T2))
    monkeypatch.setattr(vectors, "BROADCAST_MAX_ROWS", 0)
    blocked = _rows(vectors.q_sim_cosine_topk(spark, SF_T2))
    assert blocked == fast


def test_nn_blocked_matches_broadcast(spark, monkeypatch):
    from sd2_drp_experimentgen_spark.operators import vectors

    fast = _rows(vectors.q_dedup_embedding_nn(spark, SF_T2))
    monkeypatch.setattr(vectors, "BROADCAST_MAX_ROWS", 0)
    blocked = _rows(vectors.q_dedup_embedding_nn(spark, SF_T2))
    assert blocked == fast
    assert len(blocked) == len({r[0] for r in blocked})  # one NN per vector
