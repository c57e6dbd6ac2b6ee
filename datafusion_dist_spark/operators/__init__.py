"""Engine operators beyond plain relational algebra.

Each module implements one family of large-scale training-data pipeline
operators as composable DataFrame transforms (built-in functions on the
hot path; Pandas UDFs only where semantics require Python):

- ``text``       — tokenization, quality scoring, language ID, winnowing
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard
- ``similarity`` — embedding cosine top-k (brute force + LSH-bucketed)
- ``multimodal`` — binary payload plumbing with stubbed decoders
"""
