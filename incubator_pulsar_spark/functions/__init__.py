"""Scalar/column function library.

The reference has no scalar-function surface (payloads are opaque bytes;
SURVEY §2.6) — this package is the engine's value-add: text analysis,
fuzzy dedup, embedding similarity, multimodal plumbing, all built from
``pyspark.sql.functions`` so they stay inside whole-stage codegen.
"""
