"""e09 fixed-point EWMA: Spark and DuckDB must agree bit-for-bit even
when purchase values are NEGATIVE (refunds/chargebacks) — Spark's DIV
truncates toward zero while DuckDB's // floors, so the plan must use
an explicit floor division (ADVICE r9)."""

import datetime as dt

import duckdb

from etl_spark.operators.event_analytics import e09_ewma_spike
from etl_spark.registry import all_specs


def test_e09_negative_values_match_oracle(spark, tmp_path):
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    # user 1: purchases swinging negative (refund-heavy) so weighted
    # sums go negative; user 2: all positive control
    vals = {1: [5.0, -40.0, -3.25, 2.0, -17.5, 1.0], 2: [3.0, 8.0, 2.5]}
    eid = 0
    for uid, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append(
                (eid, t0 + dt.timedelta(minutes=i), uid, "purchase", v, "{}")
            )
            eid += 1
    # plus one non-purchase row that must be filtered out
    rows.append((eid, t0, 1, "view", -99.0, "{}"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    # plain pyarrow file with timestamp[us] — matches the fixture
    # encoding load() reads natively (Spark's own writer emits INT96,
    # which pyarrow reports as ns and misroutes the loader's branch)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(table, f"{sf_dir}/events.parquet")

    got = sorted(
        (r.event_id, r.user_id, r.cents, r.ewma_cents, r.spike)
        for r in e09_ewma_spike(spark, sf_dir).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            all_specs()["e09_ewma_spike"].oracle
        ).fetchall()
    )
    assert got == want and len(got) == sum(len(v) for v in vals.values())
    # sanity: the fixture really exercised a negative weighted sum
    assert any(r[3] < 0 for r in got)
