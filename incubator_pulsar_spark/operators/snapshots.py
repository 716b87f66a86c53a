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
``read_topic_asof`` detects the missing files and says so. Recovery
after an in-place rewrite is SNAPSHOT-FIRST: take a fresh
``snapshot_topic`` of the post-rewrite state, THEN ``vacuum_topic``
(any ``keep_last``), exactly like ledger trimming follows — never
precedes — sealing the compacted ledger in the reference. Vacuum
additionally refuses to delete any file in the current on-disk live
set (what a fresh snapshot would record), so even the wrong order
cannot lose rows in partitions the rewrite never touched.
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


def _referenced(topic_dir: str) -> set[str]:
    """Every path any manifest on record references as live."""
    mdir = os.path.join(topic_dir, _MANIFEST_DIR)
    ref: set[str] = set()
    if not os.path.isdir(mdir):
        return ref
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                ref |= {d["path"] for d in json.load(fh)["files"]}
    return ref


def _live_files(topic_dir: str) -> list[dict]:
    """The files a fresh snapshot would record: on-disk data files
    MINUS copy-on-write tombstones MINUS orphan cow files.

    Orphan cow files — ``cow*``-prefixed files referenced by NO
    manifest — are the residue of a ``rewrite_compact`` that crashed
    after moving part-files in but before writing its manifest. They
    carry the same rows as the still-live originals, so counting them
    as live would duplicate every compacted row; they are only
    legitimized by the manifest written LAST in the rewrite protocol."""
    dead = _tombstones(topic_dir)
    ref = _referenced(topic_dir)
    out = []
    for d in _data_files(topic_dir):
        if d["path"] in dead:
            continue
        base = os.path.basename(d["path"])
        if base.startswith("cow") and d["path"] not in ref:
            continue
        out.append(d)
    return out


def snapshot_topic(topic_dir: str) -> int:
    """Record the current live file set as the next snapshot version.

    Live = files on disk MINUS files a copy-on-write rewrite dropped
    (those stay on disk for older snapshots but are not part of the
    current topic) MINUS orphan cow files from a crashed rewrite (see
    :func:`_live_files` — counting those would duplicate rows).
    Atomic (tmp + rename); returns the new version number. No data is
    read — cost is one directory walk regardless of topic size."""
    files = _live_files(topic_dir)
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
        # an empty snapshot still has the TOPIC's schema — derive it
        # from the nearest non-empty snapshot (newest first) or any
        # data file on disk, never fabricate one (a fabricated schema
        # breaks callers selecting expected columns or unionByName-ing
        # with real snapshots)
        for s in reversed(snaps):
            with open(_manifest_path(topic_dir, s["version"])) as fh:
                cand = [os.path.join(topic_dir, d["path"])
                        for d in json.load(fh)["files"]]
            cand = [p for p in cand if os.path.exists(p)]
            if cand:
                # all donor files + mergeSchema: with schema evolution
                # across part-files, one file can miss columns others
                # carry — the derived schema must be the union
                return (spark.read.option("basePath", topic_dir)
                        .option("mergeSchema", "true")
                        .parquet(*cand).limit(0))
        disk = _data_files(topic_dir)
        if disk:
            return (spark.read.option("basePath", topic_dir)
                    .option("mergeSchema", "true")
                    .parquet(*[os.path.join(topic_dir, d["path"])
                               for d in disk]).limit(0))
        raise ValueError(
            f"snapshot v{version} is empty and no data file exists "
            "under the topic to derive its schema from")
    # basePath keeps hive partition-column inference alive when the
    # read is an explicit leaf-file list (without it, part=a/ dirs in
    # the path contribute no column and partitioned topics lose data)
    return spark.read.option("basePath", topic_dir).parquet(*paths)


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
    return spark.read.option("basePath", topic_dir).parquet(*paths)


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
    fresh appends), and never touches files in the CURRENT on-disk
    live set (what a fresh :func:`snapshot_topic` would record) even
    when no retained manifest references them — that situation arises
    when an in-place rewrite (``merge_into_topic`` /
    ``compact_parquet_dir``) replaced some partitions' files while
    leaving untouched partitions' files live-but-referenced-only-by-
    expired-manifests; deleting those would permanently lose every row
    in the partitions the rewrite never touched. Returns {"expired":
    [versions], "deleted": [paths]}. Idempotent and crash-safe:
    deletes are re-runnable, and manifests are removed only after
    their files are gone.

    The newest manifest is NEVER expired (``keep_last`` is clamped to
    >= 1): after a completed ``rewrite_compact`` the latest manifest is
    the ONLY thing that legitimizes the live ``cow*`` files — expiring
    it would make :func:`snapshot_topic` classify them as orphan crash
    residue (empty live set) and the next rewrite physically delete
    them: total data loss. Ledger-trim in the reference has the same
    floor — the currently-open ledger is never trimmed
    (ManagedLedgerImpl#internalTrimLedgers skips the current ledger)."""
    snaps = list_snapshots(topic_dir)
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    keep_last = max(keep_last, 1)
    expired = snaps[:-keep_last]
    retained = snaps[len(expired):]

    def files_of(v):
        with open(_manifest_path(topic_dir, v)) as fh:
            return {d["path"] for d in json.load(fh)["files"]}

    keep: set[str] = set()
    for s in retained:
        keep |= files_of(s["version"])
    live_now = {d["path"] for d in _live_files(topic_dir)}
    drop: set[str] = set()
    for s in expired:
        drop |= files_of(s["version"])
    drop -= keep
    drop -= live_now
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
    Crash-safe: new files land under a tmp dir, move in as
    ``cow{v}-*``-prefixed files, and are legitimized ONLY by the
    manifest written LAST. A crash before the manifest leaves orphan
    cow files that carry the same rows as the still-live originals —
    :func:`snapshot_topic` and :func:`vacuum_topic` ignore any
    cow-prefixed file no manifest references, so the orphans can never
    surface as duplicate rows; this function deletes them on the next
    run before rewriting."""
    # clean orphan cow files from a previously crashed rewrite — they
    # are referenced by no manifest (the manifest write is the commit
    # point) and would otherwise accumulate forever
    ref = _referenced(topic_dir)
    for d in _data_files(topic_dir):
        base = os.path.basename(d["path"])
        if base.startswith("cow") and d["path"] not in ref:
            os.remove(os.path.join(topic_dir, d["path"]))
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
    """Append a batch and snapshot the result in one call.

    NOT exactly-once under crash replay: a plain ``mode("append")``
    inside ``foreachBatch`` has no commit log, so a crash-replayed
    micro-batch appends its rows AGAIN and the next snapshot records
    the duplicates as live. Use this for driver-side batch loads where
    the caller controls retries; for streaming ``foreachBatch`` use
    :func:`snapshot_sink`, whose batch_id-subdir OVERWRITE makes
    replays idempotent."""
    df.write.mode("append").parquet(topic_dir)
    return snapshot_topic(topic_dir)


def snapshot_sink(topic_dir: str):
    """Exactly-once versioned streaming sink for ``foreachBatch``:

        stream.writeStream.foreachBatch(snapshot_sink(dir)).start()

    Each micro-batch writes to a ``batch_id=N`` subdir with OVERWRITE
    (a crash-replayed batch rewrites the same subdir instead of
    appending duplicates — the same idempotence rule as the late-data
    router), then snapshots. No duplicate ROWS can survive a replay;
    downstream ``read_topic_asof`` consumers always see each batch's
    rows exactly once. The subdir name carries the batch id, and the
    read paths (:func:`read_topic_asof` / :func:`read_topic_incremental`)
    surface it as an inferred hive partition column ``batch_id`` — the
    ``basePath`` option they set makes partition-dir inference apply to
    explicit leaf-file lists, so consumers see one extra long column
    alongside the data columns (asserted in tests; drop it with
    ``.drop("batch_id")`` if unwanted).

    Replay boundary, stated exactly: Spark part-file NAMES embed a
    per-job UUID, so a replayed batch writes the same rows under NEW
    file names. The manifest snapshotted after the FIRST attempt
    references the first attempt's part-files, which the replay's
    overwrite deletes — that one manifest STRANDS (``read_topic_asof``
    on it raises and says so, same posture as rewrite maintenance),
    and ``read_topic_incremental`` across the replay boundary raises
    (file identity changed) instead of returning a row-level delta.
    The converged latest state is exact; only file-level history
    across the crashed batch is lost."""
    def write(df: DataFrame, batch_id: int) -> None:
        (df.write.mode("overwrite")
         .parquet(os.path.join(topic_dir, f"batch_id={batch_id}")))
        snapshot_topic(topic_dir)
    return write
