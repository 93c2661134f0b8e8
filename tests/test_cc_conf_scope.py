"""parallelismFirst scoping around the CC fixpoint and x85 (r15).

connected_components runs its per-round shuffles under
coalescePartitions.parallelismFirst=false and must RESTORE the
caller's value; x85 pins false for its own collect and relies on
_SESSION_PINS to reset the default for the next registered query.
"""

from __future__ import annotations

from etl_spark.extensions.dedup import connected_components
from etl_spark.registry import _SESSION_PINS, all_specs

PF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def test_cc_restores_parallelism_first(spark):
    spark.conf.set(PF, "true")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    labels = {(r["doc_id"], r["lbl"]) for r in connected_components(pairs).collect()}
    assert labels == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert spark.conf.get(PF) == "true"


def test_cc_restores_nondefault_value_too(spark):
    spark.conf.set(PF, "false")
    pairs = spark.createDataFrame([(5, 6)], ["doc_a", "doc_b"])
    connected_components(pairs).collect()
    assert spark.conf.get(PF) == "false"
    spark.conf.set(PF, "true")


def test_session_pins_reset_covers_x85_pin(spark, sf_dir):
    specs = all_specs()
    assert PF in _SESSION_PINS and _SESSION_PINS[PF] == "true"
    # x85 leaves the conf at false for its own collect...
    specs["x85_pagerank_trade_graph"].fn(spark, sf_dir)
    assert spark.conf.get(PF) == "false"
    # ...and ANY registered query's entry re-pins the default
    specs["q01_pricing_summary"].fn(spark, sf_dir)
    assert spark.conf.get(PF) == "true"


def test_sketch_family_advisory_override(spark, sf_dir):
    """r16: sketch-family queries enter under advisory-size AQE
    coalescing (registry.ADVISORY_COALESCE); the next registered
    query's _SESSION_PINS restores the default — the x85 mechanism,
    now shared via register(session_confs=...)."""
    specs = all_specs()
    specs["x76_kmv_distinct_customers"].fn(spark, sf_dir)
    assert spark.conf.get(PF) == "false"
    specs["q01_pricing_summary"].fn(spark, sf_dir)
    assert spark.conf.get(PF) == "true"
    # queries the A/B rejected stay on the default
    specs["x89_substring_dup_coverage"].fn(spark, sf_dir)
    assert spark.conf.get(PF) == "true"
