from chatvector_ai_spark.plans.audit import (  # noqa: F401
    PlanFacts,
    plan_facts,
)
