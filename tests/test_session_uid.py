"""session_uid: session-lifetime cache keys (VERDICT r10 item 7).

The driver-side memo caches (relax-nullability guard seq, IVF probe
projection, minhash index, registered-views map) key on the session. r10
keyed them on ``id(spark)``, which CPython reuses after garbage collection
— a torn-down session followed by a new one could in principle be served a
stale JVM object from a dead gateway. These tests pin the r11 fix: the key
is a session-LIFETIME UUID, stable within a session, distinct across
sessions, and the registry wrapper produces correct results from a second
session rather than replaying the first session's cached JVM seq.
"""

from __future__ import annotations

import pytest

from universql_spark.session import session_uid


@pytest.mark.smoke
def test_session_uid_stable_and_distinct(spark):
    u1 = session_uid(spark)
    assert u1 and isinstance(u1, str)
    assert session_uid(spark) == u1  # stable within a session
    s2 = spark.newSession()
    try:
        u2 = session_uid(s2)
        assert u2 != u1  # a new session gets its own uid
        assert session_uid(s2) == u2
    finally:
        # newSession shares the context; nothing to stop, but drop the
        # wrapper explicitly so the shared fixture session stays primary
        del s2


def test_registry_wrapper_not_stale_across_sessions(spark, sf_dir):
    """Simulated teardown+new-session: run a memoized bench spec (cb_q00
    carries a non-nullable count(*) column, so the wrapper caches a JVM
    guard-column seq) in the shared session, then in a brand-new session.
    With id()-keyed memos the second session could alias the first's entry;
    with uid keys it must build its own and still return identical values."""
    from universql_spark.queries import load_all

    spec = load_all()["cb_q00"]
    r1 = spec.spark(spark, sf_dir).collect()
    # run twice in session 1 so the jseq memo path (not just the miss path)
    # is exercised before session 2 arrives
    r1b = spec.spark(spark, sf_dir).collect()
    s2 = spark.newSession()
    r2 = spec.spark(s2, sf_dir).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r1b] == [tuple(r) for r in r2]
    assert session_uid(spark) != session_uid(s2)
