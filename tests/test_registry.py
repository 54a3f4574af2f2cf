"""Registry plan cache: session-identity keying (ADVICE r2).

A ``newSession()`` clone shares the applicationId with its parent but has
its own SQLConf and temp-view catalog. The table cache must never hand the
clone a plan bound to the parent — the UTC/nanos re-pin and
``register_views`` would land on the wrong session.
"""

from autonomous_orchestrator_ai_spark.plans.registry import (
    register_views,
    table,
)

SF = "/root/testdata/sf0.001"


def test_clone_session_gets_its_own_plan_and_views(spark):
    parent_df = table(spark, SF, "region")
    assert parent_df.sparkSession is spark
    # cache hit on the same session returns the identical plan object
    assert table(spark, SF, "region") is parent_df

    clone = spark.newSession()
    clone_df = table(clone, SF, "region")
    # the clone must NOT receive the parent's cached plan...
    assert clone_df is not parent_df
    # ...and its plan must be bound to the clone session
    assert clone_df.sparkSession is clone

    # views registered for the clone are visible via the clone's catalog
    register_views(clone, SF)
    assert clone.sql("SELECT count(*) AS n FROM region").collect()[0].n == 5
