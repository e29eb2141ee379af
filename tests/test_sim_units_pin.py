"""The _sim_units non-finite pin (ADVICE r10) and the pinned-cell
emission exclusion (ADVICE r11) — the branch that motivated the r11
kernel rewrite finally executes under assertion (VERDICT r11 item 5):
a zero-norm degenerate embedding must (a) never appear in any emitted
row of any cosine kernel, with no out-of-domain sim, and (b) leave
every OTHER row's output bit-identical to a corpus without it, on
BOTH the broadcast and blocked paths."""

from __future__ import annotations

import numpy as np
import pytest

EMB_DIM = 64
DEG_ID = 17  # degenerate vec_id sits MID-RANGE: exercises the
# searchsorted index alignment and the ascending-id prefix masks, not
# just the easy max-id corner.
N_REAL = 40


def _vec(i: int) -> list[float]:
    # Deterministic, non-trivial, float32-exact values (halves in
    # [-3, 3.5]): cosines vary with real ties, no RNG state anywhere.
    return [(((i * 31 + d * 7) % 13) - 6) / 2.0 for d in range(EMB_DIM)]


def test_sim_units_pins_every_nonfinite():
    from sd2_drp_experimentgen_spark.operators.vectors import (
        _KEY_PINNED_MAX,
        _KEY_SHIFT,
        _UNITS_MIN,
        _sim_units,
    )

    sims = np.array(
        [np.nan, np.inf, -np.inf, -1.0, 1.0, 0.0, 0.99995, -0.99996, 0.12344]
    )
    u = _sim_units(sims)
    assert u.dtype == np.int64
    assert (u[:3] == -20000).all(), "non-finite must pin to -20000"
    assert u[3] == -10000 and u[4] == 10000  # domain boundaries
    assert u[5] == 0 and u[6] == 10000 and u[7] == -10000 and u[8] == 1234
    # Every real unit packs to a key ABOVE the validity cut at any
    # in-range rank; every pinned unit packs BELOW it.
    worst_rank = _KEY_SHIFT - 1
    assert (u[3:] >= _UNITS_MIN).all()
    assert (u[3:] * _KEY_SHIFT - worst_rank > _KEY_PINNED_MAX).all()
    assert (u[:3] * _KEY_SHIFT - 0 < _KEY_PINNED_MAX).all()


def test_sim_units_property_finite_matches_oracle_formula():
    pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sd2_drp_experimentgen_spark.operators.vectors import _sim_units

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(
            min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False
        )
    )
    def check(s):
        u = _sim_units(np.array([s]))[0]
        assert u == int(np.floor(s * 1e4 + 0.5))
        assert -10000 <= u <= 10000

    check()


def test_pair_topk_all_pinned_cell_returns_none():
    from sd2_drp_experimentgen_spark.operators.vectors import _pair_topk

    cand = np.full((3, 3), -20000, dtype=np.int64)
    l_ids = np.array([1, 2, 3], dtype=np.int64)
    r_ids = np.array([4, 5, 6], dtype=np.int64)
    assert _pair_topk(cand, l_ids, r_ids, 10, False) is None
    assert _pair_topk(cand, l_ids, r_ids, 10, True) is None
    # One real cell among pinned: exactly that pair survives.
    cand[1, 2] = 7
    got = _pair_topk(cand, l_ids, r_ids, 10, False)
    assert got is not None
    lo, hi, su = got
    assert list(lo) == [2] and list(hi) == [6] and list(su) == [7]


@pytest.fixture(scope="module")
def deg_dirs(spark, tmp_path_factory):
    """Two embeddings-only corpora: `clean` (40 real vectors, ids
    0..40 skipping DEG_ID) and `deg` (the same 40 plus an all-zero
    vector at DEG_ID)."""
    import pandas as pd

    base = tmp_path_factory.mktemp("degemb")
    ids = [i for i in range(N_REAL + 1) if i != DEG_ID]
    rows = [(i, _vec(i), i % 10) for i in ids]
    schema = "vec_id long, embedding array<float>, label int"
    clean = str(base / "clean")
    deg = str(base / "deg")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
        schema=schema,
    ).write.mode("overwrite").parquet(f"{clean}/embeddings.parquet")
    spark.createDataFrame(
        pd.DataFrame(
            rows + [(DEG_ID, [0.0] * EMB_DIM, 7)],
            columns=["vec_id", "embedding", "label"],
        ),
        schema=schema,
    ).write.mode("overwrite").parquet(f"{deg}/embeddings.parquet")
    return clean, deg


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "name", ["q_sim_cosine_topk", "q_dedup_embedding_nn", "q_emb_knn_graph"]
)
@pytest.mark.parametrize("blocked", [False, True], ids=["broadcast", "blocked"])
def test_degenerate_vector_is_inert(
    spark, deg_dirs, name, blocked, monkeypatch
):
    from sd2_drp_experimentgen_spark.operators import vectors

    if blocked:
        monkeypatch.setattr(vectors, "BROADCAST_MAX_ROWS", 0)
    clean, deg = deg_dirs
    fn = getattr(vectors, name)
    ref = _rows(fn(spark, clean))
    got = _rows(fn(spark, deg))
    assert ref, "fixture produced no rows — test is vacuous"
    # (a) never emitted: no id cell is the degenerate, no sim outside
    # the cosine domain (the pre-fix failure mode was sim == -2.0).
    for row in got:
        assert DEG_ID not in [v for v in row if isinstance(v, int)]
        sim = row[-1]
        assert -1.0 <= sim <= 1.0
    # (b) inert: every real row's neighbors are bit-identical to the
    # corpus without the degenerate vector.
    assert got == ref


def test_score_pairs_drops_degenerate_pairs(spark, deg_dirs):
    from sd2_drp_experimentgen_spark.operators.vectors import _score_pairs

    _clean, deg = deg_dirs
    pairs = spark.createDataFrame(
        [(DEG_ID, 3), (3, DEG_ID), (3, 5), (5, 18)], "src long, dst long"
    )
    got = _rows(_score_pairs(spark, deg, pairs))
    assert [(r[0], r[1]) for r in got] == [(3, 5), (5, 18)]
    assert all(-10000 <= r[2] <= 10000 for r in got)
