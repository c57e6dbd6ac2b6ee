"""Shared scalar-function helpers (stable cross-engine hashing, money)."""

from datafusion_dist_spark.functions.hashing import hash_hex, shingle_array, tokens

__all__ = ["hash_hex", "shingle_array", "tokens"]
