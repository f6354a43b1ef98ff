from changedatacapture_spark.operators.cdc import (
    apply_changes,
    compact_latest,
    derive_key,
    flatten_envelope,
    op_split,
    prune_columns,
    window_compact,
)
from changedatacapture_spark.operators.curation import (
    curation_funnel,
    pack_sequences,
    split_assign,
)
from changedatacapture_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    lsh_hot_buckets,
    minhash_signatures,
    simhash_groups,
    simhash_neardup_pairs,
)
from changedatacapture_spark.operators.joins import range_join_bucketed
from changedatacapture_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_neardup_pairs,
)

__all__ = [
    "apply_changes",
    "compact_latest",
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "curation_funnel",
    "derive_key",
    "embedding_neardup_pairs",
    "exact_dedup",
    "flatten_envelope",
    "lsh_candidate_pairs",
    "lsh_hot_buckets",
    "minhash_signatures",
    "op_split",
    "pack_sequences",
    "prune_columns",
    "range_join_bucketed",
    "simhash_groups",
    "simhash_neardup_pairs",
    "split_assign",
    "window_compact",
]
