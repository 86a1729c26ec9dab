"""Large-scale training-data-pipeline operators.

No counterpart in the reference (SURVEY.md §2.12 north-star additions):
deduplication, similarity search, text analysis, and multimodal column
handling, all designed for the 100 TB regime — built-in expressions in
the hot path, shuffles only on pre-shrunk keys (hashes/signatures), and
deterministic md5-based hashing so results are reproducible across
engines (and checkable against a DuckDB oracle).
"""

from scalecast_spark.datapipe import (  # noqa: F401
    artifacts,
    cluster,
    dedup,
    embed,
    multimodal,
    quality_model,
    sample,
    tokenizer,
    similarity,
    text,
)
