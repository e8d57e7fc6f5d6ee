"""Serving-consistency primitives shared by every live-state reader.

Spark evaluates a serving read's parquet scan at ACTION time, not when
the DataFrame is built, so build-time gates (the read-only in-flight
markers) leave a window in which a writer's bucket swap (rmtree+rename)
can tear the read.  The check-read-recheck protocol closes it: bracket
the materialization with a cheap filesystem fingerprint and retry when
the bracket moved.  One implementation serves all three consumers — the
serve CLI's collect, ann-search over a live (non-generation) index
root, and the lakehouse training export (which additionally un-commits
its torn snapshot via ``on_torn``).
"""

from __future__ import annotations

import os

from cdc_platform_spark.streaming.pipeline import StateInFlightError


def fs_fingerprint(roots, markers=()) -> tuple:
    """Cheap filesystem fingerprint of committed state: first-level entry
    mtimes per root + marker existence bits.

    A bucket replacement installs a different directory at the live path
    (distinct mtime_ns) and writers raise their marker before the first
    store commit, so any overlapping commit flips either an entry or a
    marker bit.  O(first-level entries) stat calls — independent of file
    count inside the buckets, so the probe stays cheap at any corpus
    size.

    A root vanishing between two syscalls (the writer's two-rename swap
    in flight) must fingerprint as a CHANGED state, never raise — this
    probe exists to survive exactly that window."""
    entries: list[tuple] = []
    for root in roots:
        try:
            names = sorted(os.listdir(root))
        except OSError:
            entries.append((root, None))
            continue
        for name in names:
            p = f"{root}/{name}"
            try:
                entries.append((p, os.stat(p).st_mtime_ns))
            except OSError:
                entries.append((p, None))
    for m in markers:
        entries.append((m, os.path.exists(m)))
    return tuple(entries)


def run_stable(action, fingerprint, *, on_torn=None, attempts: int = 4):
    """Run ``action()`` under check-read-recheck and return its result.

    Equal ``fingerprint()`` values bracketing the action prove no writer
    commit overlapped it.  :class:`StateInFlightError` from the action
    (a build-time gate firing) propagates untouched — it is already
    retriable.  Any other error retries only when the fingerprint moved
    (a swap broke the read mid-flight); with an UNCHANGED fingerprint it
    is a real failure and propagates.  A successful action whose bracket
    moved is torn: ``on_torn(result)`` lets a side-effecting caller undo
    it (the export un-commits its snapshot) before the retry.
    Persistent overlap exhausts into a retriable
    :class:`StateInFlightError` chained to the last swallowed error, so
    a permanently failing read under a busy writer is not silently
    misattributed to overlap."""
    last_exc = None
    for _ in range(attempts):
        before = fingerprint()
        try:
            result = action()
        except StateInFlightError:
            raise
        except Exception as exc:
            if fingerprint() != before:
                last_exc = exc
                continue
            raise
        if fingerprint() == before:
            return result
        if on_torn is not None:
            on_torn(result)
    raise StateInFlightError(
        f"read overlapped a writer commit on each of {attempts} attempts — "
        "retry after the writer idles"
    ) from last_exc
