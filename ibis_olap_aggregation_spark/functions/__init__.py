"""Scalar function pack used across the engine."""
