"""Operator library: relational ops, ranking, dedup, similarity, text."""
