"""Listener/event hooks (§2.9; api/.../events/ScanEvent.java,
IncrementalScanEvent.java, core Listeners): lightweight observability for
scans and commits.

    from incubator_iceberg_spark import events
    events.register(lambda e: print(e))
    ... run scans/commits ...

Events are plain dataclasses; listeners must be fast and never raise
(errors are swallowed, matching the reference's fire-and-forget
Listeners.notifyAll)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

_listeners: list = []


def register(listener: Callable) -> None:
    _listeners.append(listener)


def unregister(listener: Callable) -> None:
    try:
        _listeners.remove(listener)
    except ValueError:
        pass


def emit(event) -> None:
    for fn in list(_listeners):
        try:
            fn(event)
        except Exception:
            pass  # fire-and-forget (Listeners.java semantics)


@dataclass(frozen=True)
class ScanEvent:
    table_location: str
    snapshot_id: Optional[int]
    filter: str
    planned_data_files: int
    planned_delete_files: int
    incremental: bool = False
    timestamp_ms: int = field(default_factory=lambda: int(time.time() * 1000))


@dataclass(frozen=True)
class MaintenanceAdvisory:
    """Emitted when a read observes accrued delete debt past a healthy
    threshold (e.g. an eq-delete set too large to broadcast) — the scan
    still completes via the shuffle path, but the table wants the
    corresponding maintenance action run."""
    table_location: str
    kind: str          # e.g. "convert_equality_deletes"
    detail: str
    debt_tuples: Optional[int]
    timestamp_ms: int = field(default_factory=lambda: int(time.time() * 1000))


@dataclass(frozen=True)
class CommitEvent:
    table_location: str
    snapshot_id: int
    operation: str
    sequence_number: int
    summary: dict
    timestamp_ms: int = field(default_factory=lambda: int(time.time() * 1000))
