"""Named analytic queries (the engine's public query surface).

Every query registered here has a matching DuckDB oracle SQL string unless it
is genuinely non-SQL-expressible; ``__spark_entry__.py`` exposes the registry
to the driver (SURVEY.md §5 strategy item b).
"""

from autonomous_orchestrator_ai_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    load_all,
    register,
)
