"""Declared-query plans and oracle SQL generation.

``oracle`` generates DuckDB SQL that mirrors the engine's bin math exactly
(SURVEY.md §2.4): since DDSketch is deterministic double arithmetic, the
oracle can reproduce sketch outputs — counts exactly, values to within a
float32 cast that absorbs libm-vs-JVM ulp differences.
"""
