"""Round-4c operator tests: interval join, RANGE rolling frame."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from incubator_pulsar_spark.operators.interval import interval_join


def _ts(h, m=0, s=0, us=0):
    return dt.datetime(2001, 3, 5, h, m, s, us)


@pytest.fixture(scope="module")
def fixture(spark):
    points = spark.createDataFrame(
        [(i, _ts(h, m, s)) for i, (h, m, s) in enumerate([
            (0, 0, 0), (0, 59, 59), (1, 0, 0), (2, 30, 0),
            (5, 0, 0), (8, 15, 0), (23, 59, 59),
        ])],
        "pid long, ts timestamp_ntz")
    intervals = spark.createDataFrame(
        [
            (100, _ts(0, 0, 0), _ts(0, 59, 59)),    # exact closed bounds
            (101, _ts(0, 30), _ts(2, 30)),          # spans 3 buckets
            (102, _ts(2, 30), _ts(2, 30)),          # zero-length
            (103, _ts(3, 0), _ts(4, 0)),            # matches nothing
            (104, _ts(0, 0), _ts(23, 59, 59)),      # covers everything
        ],
        "iid long, start_ts timestamp_ntz, end_ts timestamp_ntz")
    return points, intervals


class TestIntervalJoin:
    def test_matches_naive_inequality_join(self, spark, fixture):
        points, intervals = fixture
        got = sorted(
            (r["iid"], r["pid"])
            for r in interval_join(points, intervals).collect())
        naive = sorted(
            (r["iid"], r["pid"])
            for r in points.join(
                intervals,
                (points["ts"] >= intervals["start_ts"])
                & (points["ts"] <= intervals["end_ts"])).collect())
        assert got == naive and len(got) > 0

    def test_no_duplicate_pairs_when_interval_spans_buckets(self, spark, fixture):
        """An interval exploded to N buckets must still emit each
        qualifying (point, interval) pair once — the point's single
        bucket intersects the interval's bucket list exactly once."""
        points, intervals = fixture
        rows = interval_join(points, intervals, bucket_seconds=60).collect()
        pairs = [(r["iid"], r["pid"]) for r in rows]
        assert len(pairs) == len(set(pairs))

    @pytest.mark.parametrize("bucket", [7, 61, 3600, 86_400 * 7])
    def test_bucket_width_never_changes_semantics(self, spark, fixture, bucket):
        points, intervals = fixture
        base = sorted((r["iid"], r["pid"])
                      for r in interval_join(points, intervals).collect())
        got = sorted((r["iid"], r["pid"])
                     for r in interval_join(points, intervals,
                                            bucket_seconds=bucket).collect())
        assert got == base

    def test_closed_bounds(self, spark, fixture):
        points, intervals = fixture
        rows = interval_join(points, intervals).collect()
        got = {(r["iid"], r["pid"]) for r in rows}
        assert (100, 0) in got and (100, 1) in got   # both endpoints in
        assert (102, 3) in got                        # zero-length == point
        assert all(iid != 103 for iid, _ in got)

    def test_rejects_bad_bucket(self, spark, fixture):
        points, intervals = fixture
        with pytest.raises(ValueError):
            interval_join(points, intervals, bucket_seconds=0)
