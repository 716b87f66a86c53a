"""Producer access modes + topic-epoch fencing.

Reference surface:
- ``pulsar-client-api/.../ProducerAccessMode.java:24-44`` — Shared,
  Exclusive (fail if a producer is already connected),
  ExclusiveWithFencing (take over, invalidating existing producers),
  WaitForExclusive (pend until the topic frees up).
- ``pulsar-broker/.../service/AbstractTopic.java:795-843`` — the broker
  keeps a monotone ``topicEpoch``; acquiring exclusive access increments
  it, and a producer whose epoch is older than the topic's is FENCED
  (its publishes rejected) because another exclusive producer has been
  present in between.

Spark-first model: the topic directory carries a one-file JSON control
record ``_producers.json`` (epoch, exclusive owner, shared producer
set). Acquisition and every ``send`` validate against it:

- acquisition of any exclusive mode increments the epoch (the fencing
  token); ``ExclusiveWithFencing`` additionally evicts the registered
  producers,
- ``send`` re-reads the record and raises ``ProducerFencedError`` when
  the topic epoch has moved past the handle's (or the handle was
  evicted) — exactly the stale-epoch check at AbstractTopic.java:817-823.

The state file is replaced atomically (write-temp + ``os.replace``), so
readers see the old or the new record, never a torn one. Validation
happens driver-side before the Spark write job launches — the same
place the broker checks (on connect/publish), with the same caveat as
any non-transactional sink: for atomic multi-topic publishes use
``operators.transactions``.

Concurrency model (honest limit): acquisition is read-modify-replace,
serialized only within one driver process. The reference serializes
producer registration through the single owning broker; here, two
SEPARATE drivers racing an acquisition can both believe they won (the
classic lost update). On shared storage, pair this with an external
mutex (object-store conditional put, a lock service) if multiple
drivers manage the same topic — the epoch check still fences any
producer that lost the race once the winner's record lands.

Scale note: this is control-plane metadata — one tiny JSON per topic,
read once per batch publish, never per row; nothing here touches the
data path's plan.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame

from ..envelope import write_topic


class ProducerAccessMode(Enum):
    """ProducerAccessMode.java:24-44."""
    SHARED = "Shared"
    EXCLUSIVE = "Exclusive"
    EXCLUSIVE_WITH_FENCING = "ExclusiveWithFencing"
    WAIT_FOR_EXCLUSIVE = "WaitForExclusive"


class ProducerBusyError(Exception):
    """Exclusive access denied: another producer is connected."""


class ProducerFencedError(Exception):
    """This producer's epoch is older than the topic's — a newer
    exclusive producer has been present in between (AbstractTopic.java:817)."""


_STATE_FILE = "_producers.json"


def _state_path(topic_path: str) -> str:
    return os.path.join(topic_path, _STATE_FILE)


def _read_state(topic_path: str) -> dict:
    try:
        with open(_state_path(topic_path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"epoch": -1, "exclusive_owner": None, "shared": []}


def _write_state(topic_path: str, state: dict) -> None:
    os.makedirs(topic_path, exist_ok=True)
    tmp = _state_path(topic_path) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(topic_path))  # atomic on POSIX


@dataclass(frozen=True)
class ProducerHandle:
    topic_path: str
    name: str
    mode: ProducerAccessMode
    epoch: int


def create_producer(
    topic_path: str, *, name: str | None = None,
    mode: ProducerAccessMode = ProducerAccessMode.SHARED,
    wait_timeout_s: float = 30.0, poll_interval_s: float = 0.1,
) -> ProducerHandle:
    """Register a producer on the topic under the given access mode.

    Raises ``ProducerBusyError`` when EXCLUSIVE access is requested while
    any producer is connected (ProducerAccessMode.java:32 — "fail
    immediately"). WAIT_FOR_EXCLUSIVE polls until the topic frees or
    ``wait_timeout_s`` elapses.
    """
    name = name or f"producer-{uuid.uuid4().hex[:8]}"
    deadline = time.monotonic() + wait_timeout_s
    while True:
        state = _read_state(topic_path)
        busy = state["exclusive_owner"] is not None or bool(state["shared"])
        if mode is ProducerAccessMode.SHARED:
            if state["exclusive_owner"] is not None:
                raise ProducerBusyError(
                    f"topic {topic_path!r} owned exclusively by "
                    f"{state['exclusive_owner']!r}")
            state["shared"] = sorted(set(state["shared"]) | {name})
            _write_state(topic_path, state)
            return ProducerHandle(topic_path, name, mode, state["epoch"])
        if mode is ProducerAccessMode.EXCLUSIVE and busy:
            raise ProducerBusyError(
                f"topic {topic_path!r} already has producers "
                f"(owner={state['exclusive_owner']!r}, shared={state['shared']})")
        if mode is ProducerAccessMode.WAIT_FOR_EXCLUSIVE and busy:
            if time.monotonic() >= deadline:
                raise ProducerBusyError(
                    f"timed out waiting for exclusive access to {topic_path!r}")
            time.sleep(poll_interval_s)
            continue
        # acquire exclusive (fencing mode evicts; plain modes found it free)
        epoch = state["epoch"] + 1  # incrementTopicEpoch — the fencing token
        _write_state(topic_path, {
            "epoch": epoch, "exclusive_owner": name, "shared": []})
        return ProducerHandle(topic_path, name, mode, epoch)


def close_producer(handle: ProducerHandle) -> None:
    """Deregister; idempotent (a fenced/evicted handle is already gone)."""
    state = _read_state(handle.topic_path)
    if state["exclusive_owner"] == handle.name and state["epoch"] == handle.epoch:
        state["exclusive_owner"] = None
    state["shared"] = [p for p in state["shared"] if p != handle.name]
    _write_state(handle.topic_path, state)


def _validate(handle: ProducerHandle) -> None:
    state = _read_state(handle.topic_path)
    if state["epoch"] > handle.epoch:
        raise ProducerFencedError(
            f"producer {handle.name!r} (epoch {handle.epoch}) fenced: topic "
            f"epoch is {state['epoch']} (a newer exclusive producer was present)")
    if handle.mode is ProducerAccessMode.SHARED and handle.name not in state["shared"]:
        raise ProducerFencedError(
            f"shared producer {handle.name!r} was evicted by an "
            "ExclusiveWithFencing takeover")
    if handle.mode is not ProducerAccessMode.SHARED \
            and state["exclusive_owner"] != handle.name:
        raise ProducerFencedError(
            f"producer {handle.name!r} no longer owns {handle.topic_path!r}")


def send(handle: ProducerHandle, df: DataFrame, **write_kwargs) -> None:
    """Publish a batch under the handle's access guarantee: validates
    the fencing token immediately before the write job launches."""
    _validate(handle)
    write_topic(df, handle.topic_path, **write_kwargs)
