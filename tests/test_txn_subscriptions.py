"""Tests: transactions (atomic multi-topic produce, isolation, ack-in-txn)
and subscription semantics (seek, batch receive, cursors)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from incubator_pulsar_spark.operators import subscriptions as sub
from incubator_pulsar_spark.operators import transactions as tx


@pytest.fixture
def coord(tmp_path):
    return tx.TransactionCoordinator(staging_root=str(tmp_path / "txn"))


def test_txn_commit_atomic_multi_topic(spark, tmp_path, coord):
    t_a, t_b = str(tmp_path / "topicA"), str(tmp_path / "topicB")
    txn = coord.begin()
    txn.produce(spark.range(5), t_a)
    txn.produce(spark.range(3), t_b)
    # invisible before commit (READ_COMMITTED: dirs don't even exist)
    assert not os.path.exists(t_a) and not os.path.exists(t_b)
    txn.commit()
    assert tx.read_committed(spark, t_a).count() == 5
    assert tx.read_committed(spark, t_b).count() == 3
    with pytest.raises(ValueError):
        txn.commit()  # already terminal


def test_txn_abort_discards(spark, tmp_path, coord):
    t_a = str(tmp_path / "topicA")
    txn = coord.begin()
    txn.produce(spark.range(5), t_a)
    txn.abort()
    assert not os.path.exists(t_a)
    assert not os.path.exists(os.path.join(coord.staging_root, txn.txn_id))


def test_txn_isolation_levels(spark, tmp_path, coord):
    t_a = str(tmp_path / "topicA")
    committed = coord.begin()
    committed.produce(spark.range(2), t_a)
    committed.commit()
    open_txn = coord.begin()
    open_txn.produce(spark.range(10, 13), t_a)  # 3 rows staged
    assert tx.read_committed(spark, t_a).count() == 2
    assert tx.read_uncommitted(spark, t_a, coord).count() == 5
    open_txn.commit()
    assert tx.read_committed(spark, t_a).count() == 5


def test_txn_ack_cursor_advances_on_commit_only(spark, coord):
    txn = coord.begin()
    txn.ack_cumulative("subA", 41)
    assert coord.cursor("subA") == -1  # not yet
    txn.commit()
    assert coord.cursor("subA") == 41
    # aborted txn leaves cursor alone
    txn2 = coord.begin()
    txn2.ack_cumulative("subA", 99)
    txn2.abort()
    assert coord.cursor("subA") == 41


def test_txn_crash_recovery(spark, tmp_path, coord):
    """Commit marker written but process dies before publish: a fresh
    coordinator's recover() finishes the commit (files visible, cursor
    advanced); an unmarked staging dir is GC'd as an implicit abort."""
    t_a = str(tmp_path / "topicA")
    txn = coord.begin()
    txn.produce(spark.range(4), t_a)
    txn.ack_cumulative("subA", 7)
    txn._write_marker()  # commit point reached... then "crash"

    orphan = coord.begin()  # staged, never marked → implicit abort
    orphan.produce(spark.range(9), str(tmp_path / "topicB"))

    fresh = tx.TransactionCoordinator(staging_root=coord.staging_root)
    done = fresh.recover()
    assert done[txn.txn_id] == "committed"
    assert done[orphan.txn_id] == "aborted"
    assert tx.read_committed(spark, t_a).count() == 4
    assert fresh.cursor("subA") == 7
    assert not os.path.exists(str(tmp_path / "topicB"))
    # recovery is idempotent — a second pass changes nothing
    assert fresh.recover() == {}
    assert tx.read_committed(spark, t_a).count() == 4


def _topic(spark):
    rows = [Row(partition=i % 2, sequence=i, value=f"v{i:02d}") for i in range(10)]
    return spark.createDataFrame(
        rows, "partition INT, sequence LONG, value STRING")


def test_seek_sequence(spark):
    df = _topic(spark)
    assert sub.seek_sequence(df, 7).count() == 3
    assert sub.seek_sequence(df, 7, inclusive=False).count() == 2


def test_batch_receive_caps(spark):
    df = _topic(spark)
    got = sub.batch_receive(df, max_messages=4)
    assert sorted(r.sequence for r in got.collect()) == [0, 1, 2, 3]
    # each value is 3 bytes → byte cap 7 admits floor(7/3)=2 messages
    got_b = sub.batch_receive(df, max_bytes=7)
    assert sorted(r.sequence for r in got_b.collect()) == [0, 1]
    both = sub.batch_receive(df, max_messages=1, max_bytes=7)
    assert both.count() == 1


def test_subscription_cursor_backlog(spark):
    df = _topic(spark)
    cur = sub.SubscriptionCursor.fresh()
    assert cur.backlog_count(df) == 10
    cur.ack_cumulative(0, 4)  # partition 0: seqs 0,2,4 acked
    assert cur.backlog_count(df) == 7
    cur.ack_cumulative(1, 9)  # partition 1 fully acked
    assert cur.backlog_count(df) == 2  # 6, 8 remain
    remaining = sorted(r.sequence for r in cur.unacked(df).collect())
    assert remaining == [6, 8]


# ------------------------------------------------- producer access modes

class TestProducerAccessModes:
    def _df(self, spark, vals):
        return spark.createDataFrame(
            [Row(key="k", value=v, partition=0) for v in vals])

    def test_shared_producers_coexist(self, spark, tmp_path):
        from incubator_pulsar_spark.operators import producers as pr

        topic = str(tmp_path / "t")
        p1 = pr.create_producer(topic, name="p1")
        p2 = pr.create_producer(topic, name="p2")
        pr.send(p1, self._df(spark, [1]))
        pr.send(p2, self._df(spark, [2]))
        assert spark.read.parquet(topic).count() == 2
        pr.close_producer(p1)
        pr.close_producer(p2)

    def test_exclusive_fails_fast_when_busy(self, spark, tmp_path):
        from incubator_pulsar_spark.operators import producers as pr

        topic = str(tmp_path / "t")
        p1 = pr.create_producer(topic, name="p1")
        with pytest.raises(pr.ProducerBusyError):
            pr.create_producer(topic, name="p2",
                               mode=pr.ProducerAccessMode.EXCLUSIVE)
        pr.close_producer(p1)
        # free now → exclusive acquisition succeeds and blocks new shared
        p3 = pr.create_producer(topic, name="p3",
                                mode=pr.ProducerAccessMode.EXCLUSIVE)
        with pytest.raises(pr.ProducerBusyError):
            pr.create_producer(topic, name="p4")
        pr.close_producer(p3)

    def test_fencing_takeover_invalidates_old_producers(self, spark, tmp_path):
        from incubator_pulsar_spark.operators import producers as pr

        topic = str(tmp_path / "t")
        old_shared = pr.create_producer(topic, name="old-shared")
        usurper = pr.create_producer(
            topic, name="usurper",
            mode=pr.ProducerAccessMode.EXCLUSIVE_WITH_FENCING)
        with pytest.raises(pr.ProducerFencedError):
            pr.send(old_shared, self._df(spark, [1]))
        pr.send(usurper, self._df(spark, [2]))  # new owner publishes fine

        # a second fencing takeover bumps the epoch past the first owner's
        usurper2 = pr.create_producer(
            topic, name="usurper2",
            mode=pr.ProducerAccessMode.EXCLUSIVE_WITH_FENCING)
        assert usurper2.epoch > usurper.epoch
        with pytest.raises(pr.ProducerFencedError):
            pr.send(usurper, self._df(spark, [3]))

    def test_wait_for_exclusive_acquires_after_release(self, spark, tmp_path):
        from incubator_pulsar_spark.operators import producers as pr

        topic = str(tmp_path / "t")
        p1 = pr.create_producer(topic, name="p1")
        with pytest.raises(pr.ProducerBusyError):
            pr.create_producer(topic, name="p2",
                               mode=pr.ProducerAccessMode.WAIT_FOR_EXCLUSIVE,
                               wait_timeout_s=0.3)
        pr.close_producer(p1)
        p2 = pr.create_producer(topic, name="p2",
                                mode=pr.ProducerAccessMode.WAIT_FOR_EXCLUSIVE,
                                wait_timeout_s=0.3)
        assert p2.epoch == 0  # first exclusive acquisition on this topic
        pr.close_producer(p2)


def test_seek_by_function_per_topic(spark):
    """Consumer.seek(Function): each topic repositions independently —
    by sequence, by timestamp, or not at all."""
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(10):
        for t in ("t1", "t2", "t3"):
            rows.append(Row(topic=t, sequence=i, publish_time=t0 + dt.timedelta(minutes=i)))
    df = spark.createDataFrame(rows)

    out = sub.seek_by(df, lambda t: {
        "t1": 7,                                  # sequence seek
        "t2": t0 + dt.timedelta(minutes=5),       # timestamp seek
        "t3": None,                               # no seek
    }[t])
    got = {t: sorted(r.sequence for r in out.filter(F.col("topic") == t).collect())
           for t in ("t1", "t2", "t3")}
    assert got == {"t1": [7, 8, 9], "t2": [5, 6, 7, 8, 9], "t3": list(range(10))}

    with pytest.raises(TypeError):
        sub.seek_by(df, lambda t: "bad")


def test_seek_by_ignores_null_topics(spark):
    """A NULL topic row must not crash the driver-side sort or be fed to
    the resolver — it just passes through unseeked."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [Row(topic=t, sequence=i, publish_time=t0 + dt.timedelta(minutes=i))
            for t in ("t1", None) for i in range(4)]
    df = spark.createDataFrame(rows, "topic string, sequence long, publish_time timestamp")

    seen = []

    def resolver(t):
        seen.append(t)
        return 2

    out = sub.seek_by(df, resolver)
    assert seen == ["t1"]
    got_t1 = sorted(r.sequence for r in out.filter(F.col("topic") == "t1").collect())
    got_null = sorted(r.sequence for r in out.filter(F.col("topic").isNull()).collect())
    assert got_t1 == [2, 3]
    assert got_null == [0, 1, 2, 3]


def test_priority_dispatch_order_matches_reference_example():
    """The exact worked example from ConsumerBuilder.priorityLevel."""
    got = sub.priority_dispatch_order(
        [("C1", 0, 2), ("C2", 0, 1), ("C3", 0, 1), ("C4", 1, 2), ("C5", 1, 1)])
    assert got == ["C1", "C2", "C3", "C1", "C4", "C5", "C4"]


def test_failover_election_matches_reference_example():
    # same priority → lexicographic name
    assert sub.elect_active_consumer([("aaa", 0), ("bbb", 0)]) == "aaa"
    # higher priority (lower level) wins regardless of name
    assert sub.elect_active_consumer([("aaa", 1), ("bbb", 0)]) == "bbb"
    with pytest.raises(ValueError):
        sub.elect_active_consumer([])


def test_partition_assignment_goes_to_top_priority_group():
    got = sub.assign_partitions_by_priority(
        [0, 1, 2, 3], [("low", 2), ("b", 0), ("a", 0)])
    assert got == {0: "a", 1: "b", 2: "a", 3: "b"}  # 'low' gets nothing
