"""Property-based tests (hypothesis) for the determinism-critical
pure math the engine's cross-engine contract leans on.

These run WITHOUT a SparkSession: each property checks an identity
between two independent computations of the same quantity — the
closed-form oracle arithmetic vs a real decode, or the Python-IEEE
reference vs DuckDB's evaluation of the same expression. The Spark
side of each identity is already pinned by the 348 green oracles; what
a property test adds is the search for ADVERSARIAL inputs (dimension
edge cases, rounding-boundary floats, truncation remainders) that the
fixed fixtures may never hit.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sd2_drp_experimentgen_spark.operators.multimodal import (
    _decode_ppm,
    _sql_hb,
)

# --- PPM encode/decode roundtrip -------------------------------------


@st.composite
def ppm_images(draw):
    # generator ranges: w in [16, 79], h in [16, 63] — widen a little
    w = draw(st.integers(min_value=1, max_value=96))
    h = draw(st.integers(min_value=1, max_value=96))
    raster = draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    return w, h, raster


@given(ppm_images())
@settings(max_examples=60, deadline=None)
def test_ppm_roundtrip(img):
    """_decode_ppm is a genuine inverse of the P6 encoding the engine
    synthesizes: header + raw raster bytes decode to exactly the
    (h, w, 3) array of those bytes, for ANY dimensions/content."""
    w, h, raster = img
    payload = f"P6\n{w} {h}\n255\n".encode() + raster
    arr = _decode_ppm(payload)
    assert arr.shape == (h, w, 3)
    assert arr.tobytes() == raster


@given(ppm_images())
@settings(max_examples=25, deadline=None)
def test_ppm_truncated_raster_rejected(img):
    w, h, raster = img
    if w * h * 3 == 0:
        return
    payload = f"P6\n{w} {h}\n255\n".encode() + raster[:-1]
    try:
        _decode_ppm(payload)
    except ValueError:
        return
    raise AssertionError("truncated raster must raise")


# --- closed-form digest-pattern statistics vs the real decode --------
# The q_mm_image_features / q_mm_frame_sample oracles compute channel
# sums, max luminance, and the 2x-downsample checksum in closed form
# from the 48-byte pattern period of the repeated md5 digest. Verify
# that closed form against a genuine decode for arbitrary digests and
# the generators' full dimension ranges — INCLUDING every L % 48
# truncation remainder.


def _pattern_stats(digest: bytes, w: int, h: int):
    """The oracle's closed form, transcribed to Python: sums from the
    48-position period, lum from the 16 pattern pixels, thumb from the
    even-cell enumeration folded mod 16."""
    L = w * h * 3
    full, rem = divmod(L, 48)
    sums = [0, 0, 0]
    part = [0, 0, 0]
    for pos in range(48):
        v = digest[pos % 16]
        sums[pos % 3] += v
        if pos < rem:
            part[pos % 3] += v
    sum_rgb = [sums[c] * full + part[c] for c in range(3)]

    pixval = {}
    lum = {}
    for k in range(16):
        b0, b1, b2 = (digest[(3 * k + j) % 16] for j in range(3))
        pixval[k] = b0 + b1 + b2
        lum[k] = (299 * b0 + 587 * b1 + 114 * b2) // 1000
    max_lum = max(lum.values())  # valid when n_px >= 16

    thumb = sum(
        pixval[(r * w + c) % 16]
        for r in range(0, h, 2)
        for c in range(0, w, 2)
    )
    return sum_rgb, max_lum, thumb


@given(
    text=st.text(min_size=0, max_size=40),
    w=st.integers(min_value=16, max_value=79),
    h=st.integers(min_value=16, max_value=63),
)
@settings(max_examples=80, deadline=None)
def test_digest_pattern_closed_form_matches_decode(text, w, h):
    digest = hashlib.md5(text.encode()).digest()
    L = w * h * 3
    raster = (digest * (L // 16 + 1))[:L]
    img = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)

    sum_rgb, max_lum, thumb = _pattern_stats(digest, w, h)

    flat = img.reshape(-1, 3).astype(np.int64)
    assert [int(flat[:, c].sum()) for c in range(3)] == sum_rgb

    lum_img = (
        299 * img[:, :, 0].astype(np.int64)
        + 587 * img[:, :, 1].astype(np.int64)
        + 114 * img[:, :, 2].astype(np.int64)
    ) // 1000
    assert int(lum_img.max()) == max_lum

    assert int(img[::2, ::2].astype(np.int64).sum()) == thumb

    # the frame-sampler telescoping identity: band sums over ANY split
    # count add up to the total raster sum
    n_frames = (len(text) % 7) + 1
    bands = np.array_split(img.astype(np.int64), n_frames, axis=0)
    assert sum(int(b.sum()) for b in bands) == sum(sum_rgb)


@given(
    text=st.text(min_size=0, max_size=40),
    idx=st.integers(min_value=0, max_value=15),
)
@settings(max_examples=40, deadline=None)
def test_sql_hb_reads_digest_bytes(text, idx):
    """The _sql_hb strpos/substr lookup (shared by three oracles) must
    read exactly byte ``idx`` of the md5 digest from its hex form."""
    con = duckdb.connect()
    hx = hashlib.md5(text.encode()).hexdigest()
    got = con.execute(
        f"SELECT {_sql_hb(str(idx))} FROM (SELECT ? AS hx)", [hx]
    ).fetchone()[0]
    assert got == hashlib.md5(text.encode()).digest()[idx]


# --- int_units: the IEEE contract vs DuckDB --------------------------
# int_units(x) = floor(x * 1e4 + 0.5) as int64 is THE determinism
# recipe (SURVEY §5.3): a single-expression double op identical on
# both engines. Property: DuckDB evaluates the oracle-side twin
# (sql_units) to exactly the Python-IEEE reference for arbitrary
# float64 inputs, including rounding-boundary and large-magnitude
# values. (The Spark side of the identity is exercised by every green
# money oracle; Python float IS IEEE double, so this pins DuckDB to
# the same bit behavior.)


@given(
    st.lists(
        st.floats(
            min_value=-1e12,
            max_value=1e12,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=60, deadline=None)
def test_sql_units_matches_python_ieee(xs):
    from sd2_drp_experimentgen_spark.functions.helpers import sql_units

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, x DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(xs))
    )
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_units('x')} FROM t ORDER BY i"
        ).fetchall()
    ]
    want = [int(math.floor(x * 10_000 + 0.5)) for x in xs]
    assert got == want


# --- int_units at the documented headroom boundary -------------------
# helpers.int_units's docstring claims "1e14 units stay far below
# 2^53"; exact_sum leans on units being EXACT int64s produced by one
# deterministic double op. The adversarial regime is per-row values
# around ~9e11 at scale 4: x * 1e4 lands near 9e15, inside [2^52,
# 2^53) where double ulp is 1.0 — so "+ 0.5" is itself a rounding
# event (round-half-even absorbs or bumps it depending on parity).
# Both engines must take the SAME branch for every such x. This pins
# DuckDB to the Python-IEEE reference exactly where the recipe has the
# least slack; the companion Spark-side batch check lives in
# tests/test_int_units_boundary.py (needs a session).


@given(
    st.lists(
        st.one_of(
            # dense near the edge: |x| in [8e11, 9.007e11] → units in
            # [8e15, ~9.007e15], the last decade before 2^53
            st.floats(min_value=8.0e11, max_value=9.007e11),
            st.floats(min_value=-9.007e11, max_value=-8.0e11),
            # integer-unit lattice points ± tiny perturbations: x*1e4
            # exactly representable vs one-ulp off
            st.integers(min_value=8_000_000_000_000_000,
                        max_value=9_007_199_254_740_991).map(
                lambda u: u / 1e4
            ),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=80, deadline=None)
def test_sql_units_boundary_magnitudes(xs):
    from sd2_drp_experimentgen_spark.functions.helpers import sql_units

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(xs)))
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_units('x')} FROM t ORDER BY i"
        ).fetchall()
    ]
    want = [int(math.floor(x * 10_000 + 0.5)) for x in xs]
    assert got == want
