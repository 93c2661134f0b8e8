"""Property-fuzzed pins for the cross-engine arithmetic rules every
integer-exact oracle relies on (no Spark session needed — DuckDB vs
Python references, so these run in milliseconds):

- the e09/x122 TRUNCATION rule: DuckDB BIGINT // truncates toward
  zero, exactly like Spark's DIV (measured in r9; fuzzed here);
- the x121/x109 DECIMAL/HUGEINT rule: DuckDB HUGEINT // on wide
  products equals exact integer floor-division on non-negatives
  (what Spark's DECIMAL(38,0) DIV compiles to);
- the shared md5-hash prefix: DuckDB's hex-prefix cast equals
  Python's int(md5[:15], 16) for arbitrary BIGINT keys (the root of
  every sketch/dedup oracle's determinism).
"""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


@settings(max_examples=300, deadline=None)
@given(
    a=st.integers(min_value=-(2**62), max_value=2**62),
    b=st.integers(min_value=-(2**31), max_value=2**31).filter(lambda x: x != 0),
)
def test_duckdb_bigint_intdiv_truncates_toward_zero(a, b):
    got = duckdb.sql(
        f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT)"
    ).fetchone()[0]
    assert got == _trunc_div(a, b), (a, b)


@settings(max_examples=200, deadline=None)
@given(
    num=st.integers(min_value=0, max_value=10**30),
    den=st.integers(min_value=1, max_value=10**18),
)
def test_duckdb_hugeint_floordiv_is_exact_on_nonnegatives(num, den):
    got = duckdb.sql(
        f"SELECT CAST({num} AS HUGEINT) // CAST({den} AS HUGEINT)"
    ).fetchone()[0]
    assert int(got) == num // den, (num, den)


@settings(max_examples=200, deadline=None)
@given(key=st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_md5_prefix_hash_matches_python(key):
    got = duckdb.sql(
        "SELECT ('0x' || substr(md5(CAST(? AS VARCHAR)), 1, 15))::BIGINT",
        params=[key],
    ).fetchone()[0]
    want = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
    assert got == want, key
