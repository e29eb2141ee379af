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
