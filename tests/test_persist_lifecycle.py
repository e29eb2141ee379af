"""Tracked-persist lifecycle (VERDICT r8 item 2 + ADVICE r8 #3).

Round 8 made the shared dedup bucket tables ``tracked_persist``ed so
they evaluate exactly once, and taught bench.py / verify_local.py to
release them between queries — but the ONE harness the repo does not
control, the external driver calling ``__spark_entry__.queries()``,
had no release point: a full-registry sweep would accumulate every
persisting query's bucket table for the life of the session. The
wrapper now releases the previous query's caches on entry to each
``run()``; these tests pin that, plus the session-scoped release the
r8 ADVICE asked for (a release must never unpersist another session's
in-flight frames).
"""

from __future__ import annotations

from sd2_drp_experimentgen_spark.functions.helpers import (
    _TRACKED_PERSISTS,
    release_persisted,
    tracked_persist,
)
from tests.conftest import SF_T1


def _drain():
    release_persisted()
    assert not _TRACKED_PERSISTS


def test_queries_wrapper_releases_previous_persists(spark):
    """Driver path: at most ONE query's tracked caches are live at a
    time — entering query N+1 releases query N's."""
    import __spark_entry__ as entrymod

    _drain()
    qs = entrymod.queries()
    # q_dedup_winnow_pairs tracked_persists its fingerprint buckets
    df1 = qs["q_dedup_winnow_pairs"](spark, SF_T1)
    df1.count()  # driver materializes AFTER run() returns
    first_batch = list(_TRACKED_PERSISTS)
    assert first_batch, "expected the winnow bucket table to be tracked"
    assert all(d.is_cached for d in first_batch)

    # next driver query (non-persisting): wrapper must drop batch 1
    qs["q_agg_global"](spark, SF_T1).count()
    assert not _TRACKED_PERSISTS
    assert all(not d.is_cached for d in first_batch)

    # and a second persisting query re-registers only its own frames
    df3 = qs["q_dedup_lsh_refine"](spark, SF_T1)
    df3.count()
    assert _TRACKED_PERSISTS
    assert not (set(map(id, _TRACKED_PERSISTS)) & set(map(id, first_batch)))
    _drain()


def test_release_is_session_scoped(spark):
    """release_persisted(session=...) only drops the caller's frames;
    another session's tracked caches stay live and tracked."""
    _drain()
    other = spark.newSession()
    mine = tracked_persist(spark.range(10))
    theirs = tracked_persist(other.range(10))
    mine.count(), theirs.count()

    n = release_persisted(session=spark)
    assert n == 1
    assert not mine.is_cached
    assert theirs.is_cached, "other session's cache must survive"
    assert [id(d) for d in _TRACKED_PERSISTS] == [id(theirs)]

    # no-session release drains the rest (single-threaded fast path)
    assert release_persisted() == 1
    assert not theirs.is_cached and not _TRACKED_PERSISTS
