"""bench.py name-resolution contract: every HEADLINE / frozen-set /
scale-section query must resolve to either a registered spec or an
entry in ``bench.DEMOTED_BASELINES``. Guards the r12 demotion
mechanism — without this, removing a query from the registry would
silently shrink FROZEN_SET_R9's sum (reading as a fake speedup) or
crash the bench the driver records for the round."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench
from etl_spark.registry import all_specs

# keys produced by _etl_bench, not registry queries
_ETL_KEYS = {"etl_ingest_overwrite", "etl_pipeline_e2e"}


def _resolvable(name: str, specs) -> bool:
    return name in specs or name in bench.DEMOTED_BASELINES


def test_headline_names_resolve():
    specs = all_specs()
    bad = [n for n in bench.HEADLINE if not _resolvable(n, specs)]
    assert not bad, (
        f"HEADLINE names neither registered nor in DEMOTED_BASELINES: {bad}"
    )


def test_frozen_r9_set_names_resolve():
    """The frozen comparison set must keep producing every row —
    that is the entire point of freezing it."""
    specs = all_specs()
    bad = [
        n for n in bench.FROZEN_SET_R9
        if n not in _ETL_KEYS and not _resolvable(n, specs)
    ]
    assert not bad, (
        f"FROZEN_SET_R9 names that would silently drop out of the "
        f"comparison sum: {bad}"
    )
    # and every frozen key must actually be timed, i.e. be in HEADLINE
    # (or produced by _etl_bench)
    timed = set(bench.HEADLINE) | _ETL_KEYS
    missing = [n for n in bench.FROZEN_SET_R9 if n not in timed]
    assert not missing, f"frozen keys no longer timed by the bench: {missing}"


def test_demoted_baselines_are_not_registered():
    """A name in both places would make _bench_fn silently prefer the
    registry — the demotion lists must stay disjoint from it."""
    specs = all_specs()
    overlap = [n for n in bench.DEMOTED_BASELINES if n in specs]
    assert not overlap, f"demoted baselines still registered: {overlap}"
