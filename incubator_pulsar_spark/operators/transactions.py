"""Transactions: atomic multi-topic produce + subscription ack.

Reference: client ``TransactionImpl.java:54-215`` (registerProducedTopic
:106, registerAckedTopic :145, commit :184, abort :215), coordinator
``pulsar-transaction/coordinator/.../TransactionMetadataStore.java``,
transaction buffer ``broker/transaction/buffer/*`` (uncommitted entries
are invisible until a commit marker lands), isolation
``TransactionIsolationLevel.java:28-30`` (READ_COMMITTED /
READ_UNCOMMITTED).

Spark-first: the transaction buffer is a staging directory per txn;
commit atomically moves staged files into the topic logs (rename is the
commit marker — a reader never sees a half-published txn because files
appear only on commit). Ack-in-txn = advancing the subscription cursor
in the same commit step. This is the idempotent-sink pattern Structured
Streaming's exactly-once guarantee is built on (foreachBatch +
overwrite-by-batchId), expressed as an explicit API.

READ_COMMITTED is therefore the default read path (`read_topic`);
``read_uncommitted`` unions the staging area in — matching the
reference's two isolation levels.

Scale: commit cost is O(#files) metadata renames, no data rewrite. On
object stores swap rename for a manifest write (Delta-style); the API
is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame, SparkSession


class TxnStatus(Enum):
    OPEN = "OPEN"
    COMMITTED = "COMMITTED"
    ABORTED = "ABORTED"


class IsolationLevel(Enum):
    """TransactionIsolationLevel.java:28-30."""
    READ_COMMITTED = "READ_COMMITTED"
    READ_UNCOMMITTED = "READ_UNCOMMITTED"


@dataclass
class Transaction:
    coordinator: "TransactionCoordinator"
    txn_id: str
    status: TxnStatus = TxnStatus.OPEN
    produced: dict[str, str] = field(default_factory=dict)  # topic path → staged dir
    acked: dict[str, int] = field(default_factory=dict)     # subscription → cursor seq

    def _staging(self, topic_path: str) -> str:
        safe = topic_path.strip("/").replace("/", "_")
        return os.path.join(self.coordinator.staging_root, self.txn_id, safe)

    def produce(self, df: DataFrame, topic_path: str) -> None:
        """registerProducedTopic + write: staged, invisible until commit."""
        self._check_open()
        staged = self._staging(topic_path)
        df.write.mode("append").parquet(staged)
        self.produced[topic_path] = staged

    def ack_cumulative(self, subscription: str, sequence: int) -> None:
        """registerAckedTopic: cursor advances only on commit."""
        self._check_open()
        self.acked[subscription] = max(sequence, self.acked.get(subscription, -1))

    def commit(self) -> None:
        """Crash-atomic commit via a marker file (the commit point).

        Protocol (mirrors the reference's commit-marker-in-the-log,
        ``TransactionImpl.java:184`` + transaction buffer):

        1. Write ``<staging_root>/_markers/<txn_id>.json`` atomically
           (tmp + ``os.replace``) recording produced topics + acks —
           this IS the commit; a txn with a marker is committed even if
           everything after crashes.
        2. Publish: move staged files into topic logs (``os.replace``,
           idempotent under replay) and advance cursors (max-merge,
           idempotent).
        3. Cleanup: remove staging dir, then the marker.

        Crash before (1): nothing published; ``recover()`` GCs the
        orphan staging dir (abort). Crash after (1): ``recover()``
        replays (2)+(3) to completion. READ_COMMITTED readers therefore
        never observe data from a txn without a marker; a committed
        txn's rows all become visible by the time commit()/recover()
        returns.
        """
        self._check_open()
        self._write_marker()
        self.coordinator._publish(self.txn_id, self.produced, self.acked)
        self.status = TxnStatus.COMMITTED
        self.coordinator._finish(self)
        self.coordinator._remove_marker(self.txn_id)

    def _write_marker(self) -> None:
        """Step 1 of commit — exposed separately so tests can simulate a
        crash between the commit point and publish."""
        self.coordinator._write_marker(self.txn_id, self.produced, self.acked)

    def abort(self) -> None:
        """Drop everything staged; cursors untouched."""
        self._check_open()
        self.status = TxnStatus.ABORTED
        self.coordinator._finish(self)

    def _check_open(self) -> None:
        if self.status is not TxnStatus.OPEN:
            raise ValueError(f"transaction {self.txn_id} is {self.status.value}")


@dataclass
class TransactionCoordinator:
    """TransactionMetadataStore: txn lifecycle + subscription cursors.

    Cursor state persists as JSON next to the staging root (the
    reference keeps cursors in the metadata store; a cluster deployment
    would use a small Delta/metadata table).
    """

    staging_root: str

    def __post_init__(self) -> None:
        os.makedirs(self.staging_root, exist_ok=True)
        os.makedirs(self._marker_dir, exist_ok=True)

    # -- txn lifecycle
    def begin(self) -> Transaction:
        return Transaction(self, uuid.uuid4().hex[:16])

    def _finish(self, txn: Transaction) -> None:
        d = os.path.join(self.staging_root, txn.txn_id)
        if os.path.exists(d):
            shutil.rmtree(d)

    # -- commit markers + publish + recovery
    @property
    def _marker_dir(self) -> str:
        return os.path.join(self.staging_root, "_markers")

    def _marker_path(self, txn_id: str) -> str:
        return os.path.join(self._marker_dir, f"{txn_id}.json")

    def _write_marker(self, txn_id: str, produced: dict[str, str],
                      acked: dict[str, int]) -> None:
        tmp = self._marker_path(txn_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"produced": produced, "acked": acked}, f)
        os.replace(tmp, self._marker_path(txn_id))

    def _remove_marker(self, txn_id: str) -> None:
        try:
            os.remove(self._marker_path(txn_id))
        except FileNotFoundError:
            pass

    def _publish(self, txn_id: str, produced: dict[str, str],
                 acked: dict[str, int]) -> None:
        """Idempotent step 2: replayable after a crash at any point."""
        for topic_path, staged in produced.items():
            os.makedirs(topic_path, exist_ok=True)
            if not os.path.isdir(staged):
                continue  # already fully moved on a previous attempt
            for f in os.listdir(staged):
                if f.startswith(("_", ".")):
                    continue
                os.replace(os.path.join(staged, f),
                           os.path.join(topic_path, f"{txn_id}-{f}"))
        for sub, seq in acked.items():
            self.advance_cursor(sub, seq)

    def recover(self) -> dict[str, str]:
        """Crash recovery: finish every marked (committed) txn, GC every
        unmarked (implicitly aborted) staging dir. Returns
        {txn_id: 'committed'|'aborted'} for what it did."""
        done: dict[str, str] = {}
        for m in os.listdir(self._marker_dir):
            if not m.endswith(".json"):
                continue
            txn_id = m[: -len(".json")]
            with open(self._marker_path(txn_id)) as f:
                rec = json.load(f)
            self._publish(txn_id, rec["produced"],
                          {k: int(v) for k, v in rec["acked"].items()})
            d = os.path.join(self.staging_root, txn_id)
            if os.path.exists(d):
                shutil.rmtree(d)
            self._remove_marker(txn_id)
            done[txn_id] = "committed"
        for entry in os.listdir(self.staging_root):
            d = os.path.join(self.staging_root, entry)
            if entry.startswith("_") or not os.path.isdir(d):
                continue
            shutil.rmtree(d)  # staged but never marked → abort + GC
            done.setdefault(entry, "aborted")
        return done

    # -- cursors
    @property
    def _cursor_file(self) -> str:
        return os.path.join(self.staging_root, "_cursors.json")

    def cursors(self) -> dict[str, int]:
        if os.path.exists(self._cursor_file):
            with open(self._cursor_file) as f:
                return json.load(f)
        return {}

    def cursor(self, subscription: str) -> int:
        return self.cursors().get(subscription, -1)

    def advance_cursor(self, subscription: str, sequence: int) -> None:
        c = self.cursors()
        c[subscription] = max(sequence, c.get(subscription, -1))
        tmp = self._cursor_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(c, f)
        os.replace(tmp, self._cursor_file)


def read_committed(spark: SparkSession, topic_path: str) -> DataFrame:
    """READ_COMMITTED: only files that a commit moved into the log exist
    here — the default visibility (TransactionIsolationLevel:28)."""
    return spark.read.parquet(topic_path)


def read_uncommitted(spark: SparkSession, topic_path: str,
                     coordinator: TransactionCoordinator) -> DataFrame:
    """READ_UNCOMMITTED: committed log ∪ every open txn's staged rows for
    this topic (TransactionIsolationLevel:30)."""
    dfs = []
    if os.path.exists(topic_path):
        dfs.append(spark.read.parquet(topic_path))
    safe = topic_path.strip("/").replace("/", "_")
    for txn_id in os.listdir(coordinator.staging_root):
        staged = os.path.join(coordinator.staging_root, txn_id, safe)
        if os.path.isdir(staged):
            dfs.append(spark.read.parquet(staged))
    if not dfs:
        raise ValueError(f"nothing readable at {topic_path}")
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
