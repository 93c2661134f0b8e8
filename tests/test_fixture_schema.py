"""Fixture-schema guard.

The driver owns `/root/testdata` and has regenerated fixtures between
rounds with changed physical encodings (round 2: `events.ts` went from
int64-nanos to timestamp[us], silently breaking 45 tests). This module
pins the expected name→type mapping for every table so the next
regeneration fails ONE loud, diagnosable assertion instead.

Pure pyarrow footer reads — no Spark session, runs in milliseconds.

`events.ts` is allowed either known encoding; `etl_spark.tables.load`
branches on the actual footer type (see `events_ts_physical_type`).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

# canonical arrow type strings per table, from TESTDATA.md + driver output
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {
        "n_nationkey": "int32",
        "n_name": "string",
        "n_regionkey": "int32",
    },
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        "ts": ("timestamp[us]", "int64", "timestamp[ns]"),  # both known encodings
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_pinned(table):
    path = f"{SF_DIR}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"fixture {path} absent")
    actual = {f.name: str(f.type) for f in pq.read_schema(path)}
    expected = EXPECTED[table]
    assert set(actual) == set(expected), (
        f"FIXTURE DRIFT: {table} columns changed.\n"
        f"  expected: {sorted(expected)}\n  actual:   {sorted(actual)}\n"
        "The driver regenerated the fixture — update etl_spark/tables.py "
        "and this guard together."
    )
    for col, want in expected.items():
        allowed = want if isinstance(want, tuple) else (want,)
        assert actual[col] in allowed, (
            f"FIXTURE DRIFT: {table}.{col} is {actual[col]}, expected one of "
            f"{allowed}.\nThe driver re-encoded the fixture — check "
            "etl_spark/tables.py load() branches cover the new encoding."
        )
