"""Batch operators beyond stock Spark's surface.

The reference engine stops at projection/selection/aggregation
(``/root/reference/README.md:20``); everything here is the extension
surface a 100 TB training-data pipeline needs (BASELINE.json north
star): deduplication (:mod:`dedup`), similarity search
(:mod:`similarity`), as-of/range joins (:mod:`asof`), multimodal
column plumbing (:mod:`multimodal`), exact distributed quantiles
(:mod:`quantiles`), and exact distributed rank / running-sum / lag
over low-cardinality or global orderings (:mod:`ranks`).

All operators are shuffle-conscious compositions of DataFrame ops —
no collect()-based driver loops, no row-at-a-time Python.
"""
