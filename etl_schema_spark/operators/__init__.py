"""Operator library.

Each module exposes pure functions ``(spark, sf_dir) -> DataFrame`` (or
building blocks that such functions compose). Everything is declarative
DataFrame/SQL so Catalyst keeps pushdown, pruning, and join planning; no
collect-based driver loops.
"""
