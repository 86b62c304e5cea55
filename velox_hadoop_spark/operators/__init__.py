"""Operator library — pure DataFrame -> DataFrame transforms.

Modules: text, agg, join, sort, window, setops, graph (iterative),
dedup, similarity, textstats, multimodal. Each module also registers
its named queries (with DuckDB oracles) in ``plans.registry``.
"""
