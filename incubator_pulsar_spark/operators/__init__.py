"""Operators re-expressing the reference's data-plane semantics
(SURVEY §2.3-2.5) as Spark DataFrame transforms."""
