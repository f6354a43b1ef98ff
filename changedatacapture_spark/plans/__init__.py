from changedatacapture_spark.plans.inspect import (
    count_exchanges,
    executed_plan,
    has_broadcast_join,
    pushed_filters,
)

__all__ = [
    "count_exchanges",
    "executed_plan",
    "has_broadcast_join",
    "pushed_filters",
]
