"""Conf-failure surfacing: a frozen foreign session must produce an
actionable error at first events load, not an opaque parquet error
(VERDICT r1 "What's wrong" #3)."""

from __future__ import annotations

import pytest


def test_frozen_conf_surfaces_clear_error(spark, monkeypatch):
    from sd2_drp_experimentgen_spark import session as sess
    from sd2_drp_experimentgen_spark.sources import tables

    class FrozenConf:
        """Simulates a session whose runtime conf refuses sets and holds
        no value for the nanos conf."""

        def set(self, k, v):
            raise RuntimeError("CANNOT_MODIFY_CONFIG")

        def get(self, k, default=None):
            if k == tables._NANOS_CONF:
                return default
            return spark.conf.get(k, default)

    class FrozenSession:
        conf = FrozenConf()

    frozen = FrozenSession()
    sess.configure_session(frozen)
    assert tables._NANOS_CONF in sess.CONF_SET_FAILURES

    with pytest.raises(RuntimeError, match="nanosAsLong.*TIMESTAMP.NANOS"):
        tables.load_events(frozen, "/root/testdata/sf0.001")

    # Restore: a working session clears the recorded failure.
    sess.configure_session(spark)
    assert tables._NANOS_CONF not in sess.CONF_SET_FAILURES


def test_require_conf_passes_on_configured_session(spark):
    from sd2_drp_experimentgen_spark.session import require_conf
    from sd2_drp_experimentgen_spark.sources.tables import load_events

    require_conf(spark, "spark.sql.session.timeZone", "UTC", "hash-stable ts")
    assert load_events(spark, "/root/testdata/sf0.001").count() > 0
