"""Composed query plans: the correctness/bench harness surface."""
