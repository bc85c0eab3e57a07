"""Operators: the engine's user-facing surface.

- ``mapreduce``   — the reference's API shape (map fn / partitioner / sorted
                    output) as a facade over Spark.
- ``relational``  — aggregation / join / window / set-op query builders
                    (capabilities the reference lacks; Spark built-ins).
- ``dedup``       — [EXT] exact + near-duplicate detection.
- ``similarity``  — [EXT] embedding similarity search.
- ``text``        — [EXT] text analysis (lang-id, quality, tokens, fingerprint).
- ``multimodal``  — [EXT] opaque binary columns + pandas-UDF plumbing.
"""
