from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Two test tiers (VERDICT r15 "Next round" #2): the default run must
# fit the driver's pytest window (the r15 full suite took 33m49s and
# the driver's gate expired at 97% with ZERO failures — a budget
# overrun, not a test failure). Tests marked `slow` (the exhaustive
# oracle sweeps and other multi-minute batches) are SKIPPED by default
# and run with SPARK_GRAFT_FULL_TESTS=1 (or --full-tests). The fast
# tier keeps a deterministic sample of every sweep so local signal
# survives; the FULL tier is run and recorded before each round seal
# (see OPTIMIZATION_r16.md), and the driver's own oracle gate checks
# all 50 of its window queries regardless.
RUN_FULL = bool(os.environ.get("SPARK_GRAFT_FULL_TESTS"))


def pytest_addoption(parser):
    parser.addoption(
        "--full-tests",
        action="store_true",
        default=False,
        help="run the slow tier too (exhaustive oracle sweeps etc.)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: slow tier, skipped unless SPARK_GRAFT_FULL_TESTS=1 "
        "or --full-tests",
    )


def pytest_collection_modifyitems(config, items):
    if RUN_FULL or config.getoption("--full-tests"):
        return
    skip = pytest.mark.skip(
        reason="slow tier (set SPARK_GRAFT_FULL_TESTS=1 or --full-tests)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from etl_spark.session import get_spark

    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="etl_spark-tests",
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
