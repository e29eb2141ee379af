"""SURVEY.md is the judge's coverage contract — every registered query
must appear in it, and every q_* name the doc claims must exist in the
registry. Catches doc drift when operators are added or renamed."""

from __future__ import annotations

import re
from pathlib import Path

from sd2_drp_experimentgen_spark.plans import all_specs

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def test_every_registered_query_documented():
    doc_names = set(re.findall(r"`(q_[a-z0-9_]+)`", SURVEY.read_text()))
    missing = set(all_specs()) - doc_names
    assert not missing, f"registered but absent from SURVEY.md: {sorted(missing)}"


def test_every_documented_query_registered():
    from sd2_drp_experimentgen_spark.plans.registry import ENV_GATED

    doc_names = set(re.findall(r"`(q_[a-z0-9_]+)`", SURVEY.read_text()))
    # Env-gated queries (e.g. transformWithStateInPandas needs
    # google.protobuf) stay documented even where the dependency is
    # absent and they self-unregister.
    ghosts = doc_names - set(all_specs()) - ENV_GATED
    assert not ghosts, f"SURVEY.md claims unregistered queries: {sorted(ghosts)}"


README = Path(__file__).resolve().parent.parent / "README.md"


def test_readme_hash_oracle_count_is_current():
    """ADVICE r5: the README's 'registry's N hash oracles' claim went
    stale when operators landed. Enforce N == the live count so the
    sf0.1 all-green claim always names the right population."""
    n_hash = sum(1 for s in all_specs().values() if s.oracle is not None)
    m = re.search(r"registry's (\d+) hash oracles", README.read_text())
    assert m, "README no longer states the hash-oracle count"
    assert int(m.group(1)) == n_hash, (
        f"README claims {m.group(1)} hash oracles; registry has {n_hash} — "
        "update the README sentence"
    )


def test_survey_as_built_counts_are_current():
    """SURVEY §2.11's 'As-built total: T operators (R registered here
    — one env-gated) — H hash-checked, K rows-only' must track the
    registry (VERDICT r5 next-round #8)."""
    from sd2_drp_experimentgen_spark.plans.registry import ENV_GATED

    specs = all_specs()
    n_reg = len(specs)
    n_rows_only = sum(1 for s in specs.values() if s.oracle is None)
    m = re.search(
        r"As-built total: (\d+) operators \((\d+) registered here[^)]*\)"
        r" — (\d+) hash-checked, (\d+)\s*rows-only",
        SURVEY.read_text(),
    )
    assert m, "SURVEY.md §2.11 as-built sentence not found / reformatted"
    total, reg, n_hash, rows_only = map(int, m.groups())
    assert reg == n_reg, f"SURVEY says {reg} registered; registry has {n_reg}"
    assert total == n_reg + len(ENV_GATED)
    assert rows_only == n_rows_only
    assert n_hash == total - rows_only
