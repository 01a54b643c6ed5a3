"""Property tests for the round-5 pure-Python kernels: the
Jaro-Winkler implementation must agree with DuckDB's independent
native kernel on ARBITRARY strings, not just the blocked part-name
dictionary the certified query sees."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_archive_spark.queries.pipeline17 import (
    _jaro,
    _jaro_winkler,
)

# ascii letters+digits+space: DuckDB's kernel is bytewise — stick to
# one-byte codepoints so "character" means the same thing in both
# implementations
_TXT = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789 ", max_size=24
)


@given(_TXT, _TXT)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_matches_duckdb(a, b):
    want = duckdb.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert math.isclose(_jaro_winkler(a, b), want, abs_tol=1e-12), (a, b)


@given(_TXT, _TXT)
@settings(max_examples=200, deadline=None)
def test_jaro_symmetric_and_bounded(a, b):
    j = _jaro(a, b)
    assert math.isclose(j, _jaro(b, a), abs_tol=1e-12)
    assert 0.0 <= j <= 1.0
    jw = _jaro_winkler(a, b)
    assert j - 1e-12 <= jw <= 1.0  # the boost never decreases jaro


@given(_TXT)
@settings(max_examples=100, deadline=None)
def test_jaro_identity(a):
    # DuckDB convention: identity is 1 for non-empty, 0 for ''-vs-''
    assert _jaro_winkler(a, a) == (1.0 if a else 0.0)
