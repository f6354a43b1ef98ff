from changedatacapture_spark.operators.cdc import (
    apply_changes,
    compact_latest,
    derive_key,
    flatten_envelope,
    op_split,
    prune_columns,
    window_compact,
)

__all__ = [
    "apply_changes",
    "compact_latest",
    "derive_key",
    "flatten_envelope",
    "op_split",
    "prune_columns",
    "window_compact",
]
