"""Spark DataFrame operators (the engine's query surface)."""
