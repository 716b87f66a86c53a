"""Versioned snapshots / time-travel over append-only parquet topics.

Reference parity: a Pulsar topic's managed ledger IS a manifest — an
ordered list of immutable, sealed ledgers (``ManagedLedgerImpl``'s
ledger list, /root/reference/managed-ledger/src/main/java/org/apache/
bookkeeper/mledger/impl/ManagedLedgerImpl.java); a reader positioned at
(ledgerId, entryId) replays the topic as of that moment, and retention
trimming (``internalTrimLedgers``) drops whole sealed ledgers once no
cursor or retention window needs them. The parquet-topic analogue:
parquet part-files are the sealed ledgers (immutable once written,
appends only add files), a SNAPSHOT is the list of files live at a
moment, and VACUUM is ledger trimming — delete files no retained
snapshot references.

Spark-first design:

- ``snapshot_topic(dir)`` writes ``_manifests/v{N}.json`` — the sorted
  relative paths + sizes of every data file currently in the topic.
  Write is tmp + ``os.rename`` (atomic on POSIX), so a crash never
  leaves a torn manifest; re-running after a crash simply writes the
  next version. O(listing) — no data is read or copied, snapshots of
  a 100 TB topic cost a directory walk.
- ``read_topic_asof(spark, dir, version)`` loads exactly that file
  set (``spark.read.parquet(*files)``) — partition-pruning and
  predicate pushdown work unchanged because the files are the same
  hive-layout files. Unreadable manifests or missing files raise with
  the likely cause named (vacuum / rewrite maintenance).
- ``vacuum_topic(dir, keep_last)`` retains the newest ``keep_last``
  manifests and deletes data files that (a) are referenced by at
  least one EXPIRED manifest and (b) are referenced by NO retained
  manifest. Files on disk but in no manifest at all are NEVER touched
  — they are fresh appends that haven't been snapshotted yet. Deletes
  are idempotent; a crash mid-vacuum just leaves fewer files to
  delete on the re-run.
- ``append_and_snapshot(df, dir)`` appends a batch and snapshots in
  one call — the foreachBatch-friendly "transactionally versioned
  sink" shape.

Contract: the topic is append-only between snapshots. Rewrite
maintenance (``compact_parquet_dir`` / ``merge_into_topic`` /
``zorder_write``) replaces files, which strands older manifests —
``read_topic_asof`` detects the missing files and says so. Run
``vacuum_topic(dir, keep_last=0)`` + a fresh snapshot after a rewrite,
exactly like ledger trimming follows compaction in the reference.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"


def _data_files(topic_dir: str) -> list[dict]:
    out = []
    for root, dirs, files in os.walk(topic_dir):
        dirs[:] = [d for d in dirs
                   if d != _MANIFEST_DIR and not d.startswith(".")
                   and not d.startswith("_")]
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                p = os.path.join(root, f)
                out.append({"path": os.path.relpath(p, topic_dir),
                            "bytes": os.path.getsize(p)})
    out.sort(key=lambda d: d["path"])
    return out


def _manifest_path(topic_dir: str, version: int) -> str:
    return os.path.join(topic_dir, _MANIFEST_DIR, f"v{version:08d}.json")


def list_snapshots(topic_dir: str) -> list[dict]:
    """All snapshot versions, oldest first: version, n_files, bytes."""
    mdir = os.path.join(topic_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in sorted(os.listdir(mdir)):
        if f.startswith("v") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            out.append({"version": m["version"],
                        "n_files": len(m["files"]),
                        "bytes": sum(d["bytes"] for d in m["files"])})
    return out


def _tombstones(topic_dir: str) -> set[str]:
    """Paths dropped by any copy-on-write rewrite still on record:
    stranded on disk for older snapshots, NOT live."""
    mdir = os.path.join(topic_dir, _MANIFEST_DIR)
    dead: set[str] = set()
    if not os.path.isdir(mdir):
        return dead
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                dead |= set(json.load(fh).get("rewrite_of", []))
    return dead


def snapshot_topic(topic_dir: str) -> int:
    """Record the current live file set as the next snapshot version.

    Live = files on disk MINUS files a copy-on-write rewrite dropped
    (those stay on disk for older snapshots but are not part of the
    current topic). Atomic (tmp + rename); returns the new version
    number. No data is read — cost is one directory walk regardless
    of topic size."""
    dead = _tombstones(topic_dir)
    files = [d for d in _data_files(topic_dir) if d["path"] not in dead]
    mdir = os.path.join(topic_dir, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    versions = [s["version"] for s in list_snapshots(topic_dir)]
    version = (max(versions) + 1) if versions else 1
    payload = {"version": version, "files": files}
    tmp = _manifest_path(topic_dir, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.rename(tmp, _manifest_path(topic_dir, version))
    return version


def read_topic_asof(spark: SparkSession, topic_dir: str,
                    version: int | None = None) -> DataFrame:
    """The topic exactly as it was at ``version`` (default: latest
    snapshot). Missing files raise with the likely cause named."""
    snaps = list_snapshots(topic_dir)
    if not snaps:
        raise ValueError(f"no snapshots under {topic_dir}")
    if version is None:
        version = snaps[-1]["version"]
    path = _manifest_path(topic_dir, version)
    if not os.path.exists(path):
        raise ValueError(f"snapshot v{version} not found (vacuumed?)")
    with open(path) as fh:
        m = json.load(fh)
    paths = [os.path.join(topic_dir, d["path"]) for d in m["files"]]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise ValueError(
            f"snapshot v{version} references {len(missing)} missing "
            f"file(s) (first: {missing[0]}) — a rewrite maintenance op "
            "(compact/merge/zorder) or vacuum removed them; older "
            "snapshots do not survive rewrites")
    if not paths:
        return spark.createDataFrame([], "unused string").limit(0)
    return spark.read.parquet(*paths)


def read_topic_incremental(spark: SparkSession, topic_dir: str,
                           v_from: int, v_to: int) -> DataFrame:
    """The rows ADDED between two snapshots — change-data-capture for
    append-only topics: files in v_to but not v_from, read as one
    batch. This is the reader-resumes-from-a-cursor pattern
    (``ManagedCursorImpl`` replaying from a mark-delete position) as a
    batch primitive: consumers process version ranges instead of
    tailing, each range exactly once, replayable forever (until
    vacuum). Raises if v_from saw a copy-on-write rewrite in between
    (file identity changed — a rewritten range has no file-level
    delta; fall back to an anti-join on keys)."""
    d = diff_snapshots(topic_dir, v_from, v_to)
    if d["removed"]:
        raise ValueError(
            f"snapshots v{v_from}..v{v_to} include a rewrite "
            f"({len(d['removed'])} file(s) dropped) — file-level "
            "increments only exist for append-only ranges")
    if not d["added"]:
        return read_topic_asof(spark, topic_dir, v_to).limit(0)
    paths = [os.path.join(topic_dir, p) for p in d["added"]]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise ValueError(f"incremental range references {len(missing)} "
                         f"missing file(s) (first: {missing[0]})")
    return spark.read.parquet(*paths)


def diff_snapshots(topic_dir: str, v_old: int, v_new: int) -> dict:
    """File-level diff between two snapshots: added / removed paths."""
    def load(v):
        with open(_manifest_path(topic_dir, v)) as fh:
            return {d["path"] for d in json.load(fh)["files"]}
    old, new = load(v_old), load(v_new)
    return {"added": sorted(new - old), "removed": sorted(old - new)}


def vacuum_topic(topic_dir: str, keep_last: int = 2) -> dict:
    """Expire all but the newest ``keep_last`` snapshots and delete the
    data files only expired snapshots reference.

    Never touches files absent from every manifest (unsnapshotted
    fresh appends). Returns {"expired": [versions], "deleted":
    [paths]}. Idempotent and crash-safe: deletes are re-runnable, and
    manifests are removed only after their files are gone."""
    snaps = list_snapshots(topic_dir)
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    expired = snaps[:-keep_last] if keep_last else snaps
    retained = snaps[len(expired):]

    def files_of(v):
        with open(_manifest_path(topic_dir, v)) as fh:
            return {d["path"] for d in json.load(fh)["files"]}

    keep: set[str] = set()
    for s in retained:
        keep |= files_of(s["version"])
    drop: set[str] = set()
    for s in expired:
        drop |= files_of(s["version"])
    drop -= keep
    deleted = []
    for rel in sorted(drop):
        p = os.path.join(topic_dir, rel)
        if os.path.exists(p):
            os.remove(p)
            deleted.append(rel)
    for s in expired:
        os.remove(_manifest_path(topic_dir, s["version"]))
    return {"expired": [s["version"] for s in expired], "deleted": deleted}


def rewrite_compact(spark: SparkSession, topic_dir: str,
                    n_files: int = 1) -> int:
    """Copy-on-write small-file compaction: consolidate the LATEST
    snapshot's live set into ``n_files`` new part-files written
    ALONGSIDE the old ones, then snapshot. Old files stay on disk, so
    every earlier snapshot still reads — time travel SURVIVES this
    compaction (unlike the eager in-place ``compact_parquet_dir``,
    which reclaims space immediately but strands older manifests).
    The stranded bytes are reclaimed later by :func:`vacuum_topic`,
    exactly like ledger trimming after compaction in the reference.

    Flat (non-hive-partitioned) topic dirs only — COW rewrite of a
    partitioned topic should go leaf-by-leaf through the same call.
    Crash-safe: new files land under a tmp dir and move in before the
    manifest is written; a crash leaves either orphan tmp files (never
    referenced, re-run overwrites) or moved-but-unsnapshotted files
    (picked up as live by the next snapshot — the rewrite is a no-op
    data-wise, duplicates are impossible because the old files are
    only dropped from the NEW manifest, written last)."""
    if not list_snapshots(topic_dir):
        snapshot_topic(topic_dir)
    snaps = list_snapshots(topic_dir)
    latest_v = snaps[-1]["version"]
    df = read_topic_asof(spark, topic_dir, latest_v)
    tmp = os.path.join(topic_dir, f".{_MANIFEST_DIR}-rewrite-tmp")
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    next_v = latest_v + 1
    # tombstone exactly what this rewrite consolidated — the latest
    # manifest's set, NOT a filesystem walk (a walk would tombstone
    # unsnapshotted fresh appends and lose them)
    with open(_manifest_path(topic_dir, latest_v)) as fh:
        old_live = {d["path"] for d in json.load(fh)["files"]}
    moved = []
    for f in sorted(os.listdir(tmp)):
        if f.endswith(".parquet") and not f.startswith((".", "_")):
            dst = f"cow{next_v:08d}-{f}"
            os.rename(os.path.join(tmp, f), os.path.join(topic_dir, dst))
            moved.append(dst)
    import shutil as _shutil
    _shutil.rmtree(tmp)
    # manifest = the new files ONLY (old live files are dropped from
    # this version but remain on disk for older snapshots)
    files = [{"path": p, "bytes": os.path.getsize(os.path.join(topic_dir, p))}
             for p in moved]
    files.sort(key=lambda d: d["path"])
    mdir = os.path.join(topic_dir, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    payload = {"version": next_v, "files": files,
               "rewrite_of": sorted(old_live)}
    tmp_m = _manifest_path(topic_dir, next_v) + ".tmp"
    with open(tmp_m, "w") as fh:
        json.dump(payload, fh)
    os.rename(tmp_m, _manifest_path(topic_dir, next_v))
    return next_v


def append_and_snapshot(df: DataFrame, topic_dir: str) -> int:
    """Append a batch and snapshot the result — one call per
    micro-batch gives a versioned, replayable sink (use inside
    foreachBatch; the file-sink's own exactly-once log still applies
    to the append)."""
    df.write.mode("append").parquet(topic_dir)
    return snapshot_topic(topic_dir)


def snapshot_sink(topic_dir: str):
    """Exactly-once versioned streaming sink for ``foreachBatch``:

        stream.writeStream.foreachBatch(snapshot_sink(dir)).start()

    Each micro-batch writes to a ``batch_id=N`` subdir with OVERWRITE
    (a crash-replayed batch rewrites the same subdir instead of
    appending duplicates — the same idempotence rule as the late-data
    router), then snapshots. A replayed batch therefore converges to
    the same bytes and the re-snapshot records an identical live set —
    downstream ``read_topic_asof``/``read_topic_incremental`` consumers
    never see a duplicate row. The batch_id column is not persisted;
    the subdir name carries it.

    Boundary: a snapshot taken BETWEEN a batch's first write and its
    crash-replay references the first write's part-files, which the
    replay's overwrite replaces — that one manifest strands (read_
    topic_asof says so), the same posture as rewrite maintenance.
    Converged state is exact."""
    def write(df: DataFrame, batch_id: int) -> None:
        (df.write.mode("overwrite")
         .parquet(os.path.join(topic_dir, f"batch_id={batch_id}")))
        snapshot_topic(topic_dir)
    return write
