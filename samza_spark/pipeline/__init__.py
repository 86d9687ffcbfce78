"""Large-scale training-data pipeline operators.

Beyond Samza parity: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine), similarity search (brute-force + LSH-bucketed
ANN), text analysis (language-ID, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing. All designed for
100 TB inputs: hash-partitioned shuffles, broadcast-able small sides, no
driver-side loops, built-in-function hot paths.
"""

from samza_spark.pipeline import (  # noqa: F401
    boilerplate,
    bpe,
    decontam,
    dedup,
    embedding_stats,
    events,
    governance,
    linkage,
    multimodal,
    retrieval,
    sampling,
    similarity,
    stats,
    substring,
    text,
    versioning,
)

__all__ = [
    "boilerplate",
    "bpe",
    "decontam",
    "dedup",
    "embedding_stats",
    "events",
    "governance",
    "linkage",
    "multimodal",
    "retrieval",
    "sampling",
    "similarity",
    "stats",
    "substring",
    "text",
    "versioning",
]
