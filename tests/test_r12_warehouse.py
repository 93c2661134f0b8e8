"""r12 warehouse KPI property tests: each distributed formulation is
checked against an independent driver-side reference (the
test_r11_warehouse convention) — oracle parity already proves DuckDB
agreement; these prove the MATH."""

from __future__ import annotations

import datetime
import math

import pyspark.sql.functions as F

from etl_spark.operators.analytics_ext import (
    X124_SLA_DAYS,
    X127_BUCKETS,
    X129_LOOKBACK_DAYS,
)
from etl_spark.registry import all_specs
from etl_spark.tables import load

SPECS = all_specs()


def _bucket(age_days: int) -> str:
    for thresh, label in X127_BUCKETS:
        if age_days <= thresh:
            return label
    return "churned"


def test_x129_matrix_matches_naive_reference(spark, sf_dir):
    """Replay the transition matrix customer-by-customer driver-side:
    same anchors, same conditional-last-order rule, same buckets."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_totalprice"
    ).collect()
    maxd = max(r["d"] for r in orders)
    prevd = maxd - datetime.timedelta(days=X129_LOOKBACK_DAYS)
    per: dict = {}
    for r in orders:
        c = per.setdefault(
            r["o_custkey"],
            {"last_all": None, "last_prev": None, "n": 0, "cents": 0},
        )
        c["n"] += 1
        # o_totalprice is a parquet double; mirror the engines'
        # floor(x * 100 + 0.5) in the same float64 arithmetic
        c["cents"] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
        if c["last_all"] is None or r["d"] > c["last_all"]:
            c["last_all"] = r["d"]
        if r["d"] <= prevd and (c["last_prev"] is None or r["d"] > c["last_prev"]):
            c["last_prev"] = r["d"]
    want: dict = {}
    for c in per.values():
        bp = (
            "new"
            if c["last_prev"] is None
            else _bucket((prevd - c["last_prev"]).days)
        )
        bn = _bucket((maxd - c["last_all"]).days)
        cell = want.setdefault((bp, bn), [0, 0, 0])
        cell[0] += 1
        cell[1] += c["n"]
        cell[2] += c["cents"]
    got = {
        (r["bucket_prev"], r["bucket_now"]): [
            r["n_customers"], r["n_orders"], r["lifetime_cents"]
        ]
        for r in SPECS["x129_churn_transition_matrix"].fn(spark, sf_dir).collect()
    }
    assert got == {k: list(v) for k, v in want.items()}
    # conservation: every customer lands in exactly one cell
    assert sum(v[0] for v in got.values()) == len(per)


def test_x130_invariants_and_spotcheck(spark, sf_dir):
    """Structural invariants plus one supplier replayed naively."""
    rows = SPECS["x130_supplier_otif_trend"].fn(spark, sf_dir).collect()
    assert rows
    by_supp: dict = {}
    for r in rows:
        assert 0 <= r["n_otif"] <= r["n_orders"]
        assert 0 <= r["otif_ppm"] <= 1_000_000
        assert r["otif_ppm"] == (1_000_000 * r["n_otif"]) // r["n_orders"]
        by_supp.setdefault(r["s_name"], []).append(r)
    # exactly one NULL delta per supplier — its first month
    for name, rs in by_supp.items():
        rs.sort(key=lambda r: (r["yr"], r["mo"]))
        assert rs[0]["delta_ppm"] is None
        for prev, cur in zip(rs, rs[1:]):
            assert cur["delta_ppm"] == cur["otif_ppm"] - prev["otif_ppm"]
    # naive replay of the busiest supplier
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    o = {
        r["o_orderkey"]: r["d"]
        for r in load(spark, sf_dir, "orders")
        .select("o_orderkey", F.to_date("o_orderdate").alias("d"))
        .collect()
    }
    target = max(
        by_supp, key=lambda n: sum(r["n_orders"] for r in by_supp[n])
    )
    skey = int(target.rsplit("#", 1)[1])
    per_order: dict = {}
    for r in li.filter(F.col("l_suppkey") == skey).collect():
        od = o[r["l_orderkey"]]
        ok = (r["sd"] - od).days <= X124_SLA_DAYS
        key = (r["l_orderkey"], od.year, od.month)
        per_order[key] = per_order.get(key, True) and ok
    want: dict = {}
    for (okey, yr, mo), otif in per_order.items():
        cell = want.setdefault((yr, mo), [0, 0])
        cell[0] += 1
        cell[1] += int(otif)
    got = {
        (r["yr"], r["mo"]): [r["n_orders"], r["n_otif"]]
        for r in by_supp[target]
    }
    assert got == {k: list(v) for k, v in want.items()}


def test_x131_bridge_is_exactly_additive(spark, sf_dir):
    """The waterfall must reconcile: per month, the four buckets sum
    to net_delta, and net_delta equals revenue(m) - revenue(m-1)
    computed independently from the raw orders."""
    rows = SPECS["x131_revenue_bridge"].fn(spark, sf_dir).collect()
    assert rows
    rev: dict = {}
    for r in load(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"), "o_totalprice"
    ).collect():
        mi = r["d"].year * 12 + r["d"].month - 1
        rev[mi] = rev.get(mi, 0) + int(
            math.floor(r["o_totalprice"] * 100 + 0.5)
        )
    months = {(r["yr"], r["mo"]) for r in rows}
    # every corpus month appears; a zero-revenue month can appear too
    # (as pure churn) but only directly after an active month
    active = {(mi // 12, mi % 12 + 1) for mi in rev}
    after = {((mi + 1) // 12, (mi + 1) % 12 + 1) for mi in rev}
    assert active <= months <= active | after
    for r in rows:
        mi = r["yr"] * 12 + r["mo"] - 1
        assert (
            r["new_cents"] - r["churned_cents"]
            + r["expansion_cents"] - r["contraction_cents"]
            == r["net_delta_cents"]
        )
        assert r["net_delta_cents"] == rev.get(mi, 0) - rev.get(mi - 1, 0)
        for c in ("n_new", "new_cents", "n_churned", "churned_cents",
                  "n_expanded", "expansion_cents", "n_contracted",
                  "contraction_cents"):
            assert r[c] >= 0
