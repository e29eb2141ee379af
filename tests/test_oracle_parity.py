"""Cross-engine parity at t1 (sf0.001) — fast per-commit version of the
driver's t2 gate. The full sf0.01 check is tools/verify_local.py."""

from __future__ import annotations

import pytest

from sd2_drp_experimentgen_spark.plans import all_specs
from tests.conftest import SF_T1
from tools.verify_local import compare


def _hash_specs():
    return [
        (name, spec)
        for name, spec in sorted(all_specs().items())
        if spec.oracle is not None
    ]


@pytest.mark.parametrize(
    "name,spec", _hash_specs(), ids=[n for n, _ in _hash_specs()]
)
def test_query_matches_oracle(spark, duck_t1, name, spec):
    df = spec.fn(spark, SF_T1)
    ok, msg = compare(name, df, duck_t1.execute(spec.oracle))
    assert ok, f"{name}: {msg}"
