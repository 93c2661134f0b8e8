"""r11 warehouse KPI property tests: each distributed formulation is
checked against an independent driver-side reference (the
test_round10_stats convention) — oracle parity already proves DuckDB
agreement; these prove the MATH."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero division — what Spark DIV and DuckDB
    BIGINT // both do (the e09 measured rule); Python's // floors,
    which differs on negative numerators (the fixture ships some
    lines before the order date, so day sums CAN be negative)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q

from etl_spark.registry import all_specs
from etl_spark.tables import load

SPECS = all_specs()


def _order_spans(spark, sf_dir):
    """(yr, mo, cents, cycle_days) per order, computed naively."""
    o = {
        r["o_orderkey"]: r
        for r in load(spark, sf_dir, "orders").collect()
    }
    last_ship: dict = {}
    for r in load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        k = r["l_orderkey"]
        d = r["l_shipdate"].date() if hasattr(r["l_shipdate"], "date") else r["l_shipdate"]
        if k not in last_ship or d > last_ship[k]:
            last_ship[k] = d
    out = []
    for k, d1 in last_ship.items():
        row = o[k]
        d0 = row["o_orderdate"]
        d0 = d0.date() if hasattr(d0, "date") else d0
        out.append(
            (
                d0.year,
                d0.month,
                math.floor(row["o_totalprice"] * 100 + 0.5),
                (d1 - d0).days,
            )
        )
    return out


def test_order_to_cash_matches_reference(spark, sf_dir):
    spans = _order_spans(spark, sf_dir)
    got = {
        (r["yr"], r["mo"]): r
        for r in SPECS["x122_order_to_cash_cycle"].fn(spark, sf_dir).collect()
    }
    months: dict = {}
    for yr, mo, cents, cyc in spans:
        months.setdefault((yr, mo), []).append((cents, cyc))
    assert set(got) == set(months)
    for key, rows in months.items():
        n = len(rows)
        tot_c = sum(c for c, _ in rows)
        tot_d = sum(d for _, d in rows)
        wsum = sum(c * d for c, d in rows)
        r = got[key]
        assert r["n_orders"] == n
        assert r["total_cents"] == tot_c
        assert r["avg_cycle_days_x100"] == _trunc_div(100 * tot_d, n)
        assert r["cash_cycle_days_x100"] == _trunc_div(100 * wsum, tot_c)
        assert r["max_cycle_days"] == max(d for _, d in rows)


def test_otif_matches_reference(spark, sf_dir):
    from etl_spark.operators.analytics_ext import X124_SLA_DAYS

    o = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in load(spark, sf_dir, "orders").collect()
    }
    ok: dict = {}
    for r in load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        k = r["l_orderkey"]
        d0 = o[k].date() if hasattr(o[k], "date") else o[k]
        d1 = r["l_shipdate"].date() if hasattr(r["l_shipdate"], "date") else r["l_shipdate"]
        ok[k] = ok.get(k, True) and (d1 - d0).days <= X124_SLA_DAYS
    months: dict = {}
    for k, otif in ok.items():
        d0 = o[k].date() if hasattr(o[k], "date") else o[k]
        n, s = months.get((d0.year, d0.month), (0, 0))
        months[(d0.year, d0.month)] = (n + 1, s + (1 if otif else 0))
    got = {
        (r["yr"], r["mo"]): r
        for r in SPECS["x124_otif_fill_rate"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(months)
    for key, (n, s) in months.items():
        assert got[key]["n_orders"] == n
        assert got[key]["n_otif"] == s
        assert got[key]["otif_ppm"] == 1_000_000 * s // n


def test_mix_shift_shares_sum_and_lag(spark, sf_dir):
    rows = SPECS["x125_priority_mix_shift"].fn(spark, sf_dir).collect()
    by_month: dict = {}
    by_prio: dict = {}
    for r in rows:
        by_month.setdefault((r["yr"], r["mo"]), []).append(r)
        by_prio.setdefault(r["o_orderpriority"], []).append(r)
    for key, rs in by_month.items():
        tot = sum(r["n_orders"] for r in rs)
        ppm = sum(r["share_ppm"] for r in rs)
        # floored ppm shares under-sum by < one ppm per priority
        assert 1_000_000 - len(rs) < ppm <= 1_000_000, (key, ppm)
        for r in rs:
            assert r["share_ppm"] == 1_000_000 * r["n_orders"] // tot
    for prio, rs in by_prio.items():
        rs.sort(key=lambda r: (r["yr"], r["mo"]))
        assert rs[0]["delta_ppm"] is None
        for prev, cur in zip(rs, rs[1:]):
            assert cur["delta_ppm"] == cur["share_ppm"] - prev["share_ppm"]


def test_histogram_percentiles_are_type1(spark, sf_dir):
    """x126's inverted-CDF percentile equals the naive type-1
    definition on raw lag days (no general ordering holds vs x105's
    interpolated form — the two definitions index the same mass
    differently, so no cross-assertion is made)."""
    lag_rows = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .join(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("d"),
        )
        .collect()
    )
    months: dict = {}
    for r in lag_rows:
        months.setdefault((r["yr"], r["mo"]), []).append(r["d"])

    def type1(vals, pct):
        vals = sorted(vals)
        k = math.ceil(pct / 100 * len(vals))
        return vals[max(k - 1, 0)]

    got = {
        (r["yr"], r["mo"]): r
        for r in SPECS["x126_sla_histogram_percentiles"].fn(
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(months)
    for key, vals in months.items():
        r = got[key]
        assert r["n_lines"] == len(vals)
        for col, pct in (("p50_days", 50), ("p90_days", 90), ("p95_days", 95)):
            assert r[col] == type1(vals, pct), (key, col)
            assert r[col] in vals  # an actual observed day
        assert r["p50_days"] <= r["p90_days"] <= r["p95_days"] <= r["max_days"]
