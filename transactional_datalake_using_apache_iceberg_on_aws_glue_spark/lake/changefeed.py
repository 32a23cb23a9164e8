"""Incremental changelog consumption with a durable cursor — the
engine's analogue of Iceberg's Spark streaming read
(``spark.readStream.format("iceberg")``), built on snapshot diffs.

The reference's pipeline only ever WRITES the lake table; a real
deployment also has downstream consumers that want "every change since
I last looked" without re-scanning the table. Iceberg gives them a
streaming source over the snapshot log; here the same contract is a
:class:`ChangeFeed`: a checkpointed version cursor plus
``ParquetLakeTable.read_changes`` (one snapshot diff per poll, NOT a
per-commit log replay — diffing head against the cursor coalesces any
number of intervening commits into one incremental batch, which is
also why a slow consumer never falls behind on work, only on
freshness).

Delivery contract (same as foreachBatch): the batch function runs
BEFORE the cursor advances, so a crash between the two replays the
batch — at-least-once, upgraded to exactly-once by idempotent sinks
keyed on the batch's ``(from_version, to_version)``. The cursor swap
is the same tmp+replace atomic pointer the manifests use.

Scale notes: a poll costs one partition-pruned read per side of the
diff plus one key shuffle (read_changes docstring); the cursor file is
O(1) metadata. Consumers that only need appends can filter
``_change_type = 'insert'`` — the plan prunes the join's delete arm
only at the row level, matching Iceberg's changelog semantics.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .table import ParquetLakeTable


class CursorExpiredError(ValueError):
    """A feed/rollup cursor references a version manifest that
    ``expire_snapshots`` has reclaimed. The batch-side twin of the
    stream source's ``OffsetExpiredError`` (sources/lake_stream.py):
    the diff against an expired snapshot is unrecoverable by design —
    expiry is what reclaims space — so the consumer must re-bootstrap.
    Carries ``expired_version`` and ``oldest_available`` (version int
    or None) so callers can branch on them programmatically."""

    def __init__(self, message: str, expired_version: int,
                 oldest_available: int | None) -> None:
        super().__init__(message)
        self.expired_version = expired_version
        self.oldest_available = oldest_available


def _ensure_version_available(table: ParquetLakeTable, version: int,
                              remediation: str) -> None:
    """Raise :class:`CursorExpiredError` if ``version`` (a diff base a
    cursor points at) no longer has a manifest. Called BEFORE any
    side effect (intent write, plan build) so the failure is clean."""
    if version <= 0:
        return  # bootstrap base: diffs against the empty table
    try:
        table._manifest(version)
    except ValueError:
        oldest = None
        for m in table._iter_manifests():
            v = m["version"]
            oldest = v if oldest is None else min(oldest, v)
        raise CursorExpiredError(
            f"cursor version {version} of table {table.path!r} no longer "
            f"exists: expire_snapshots reclaimed it (oldest surviving "
            f"manifest: "
            f"{'v%06d' % oldest if oldest is not None else 'none'}). "
            + remediation
            + " To prevent this, keep snapshot retention "
            f"(expire_snapshots keep_last / older_than_ms) longer than "
            f"the consumer's maximum downtime.",
            expired_version=version, oldest_available=oldest,
        ) from None


class ChangeFeed:
    """Cursor-tracked incremental reader of a :class:`ParquetLakeTable`.

    ``poll()`` returns the changes between the checkpointed cursor and
    the table head (or None when caught up); ``commit(to)`` durably
    advances the cursor; ``process_available(fn)`` drives the two in a
    loop until caught up — the availableNow trigger shape.
    """

    def __init__(self, table: ParquetLakeTable, checkpoint_dir: str,
                 initial: str = "earliest") -> None:
        if initial not in ("earliest", "latest"):
            raise ValueError("initial must be 'earliest' or 'latest'")
        self.table = table
        self.fs = table.fs
        self.checkpoint_dir = checkpoint_dir
        self._cursor_file = os.path.join(checkpoint_dir, "CURSOR")
        self.fs.makedirs(checkpoint_dir)
        if not self.fs.exists(self._cursor_file):
            # 'earliest' replays history from the empty state (first
            # batch = current state as inserts); 'latest' starts at the
            # head, like Kafka's auto.offset.reset / Kinesis LATEST
            # (reference starting position, readers.py).
            start = 0 if initial == "earliest" else table.current_version()
            self._write_cursor(start)

    # -- cursor ----------------------------------------------------------

    def position(self) -> int:
        """Last table version this feed has fully delivered."""
        return int(self.fs.read_text(self._cursor_file).strip())

    def _write_cursor(self, version: int) -> None:
        tmp = self._cursor_file + ".tmp"
        self.fs.write_text(tmp, str(version))
        self.fs.replace(tmp, self._cursor_file)

    def commit(self, to_version: int) -> None:
        """Durably advance the cursor — call only AFTER the batch's
        side effects are safe (monotonic; never moves backwards)."""
        if to_version < self.position():
            raise ValueError(
                f"cursor may not move backwards ({to_version} < "
                f"{self.position()})"
            )
        self._write_cursor(to_version)

    # -- reads -----------------------------------------------------------

    def poll(self) -> tuple[DataFrame, int, int] | None:
        """(changes, from_version, to_version) for everything committed
        past the cursor, or None when caught up. Does NOT advance the
        cursor."""
        pos = self.position()
        head = self.table.current_version()
        if head <= pos:
            return None
        _ensure_version_available(
            self.table, pos,
            "Reset the checkpoint dir (bootstrap re-delivers the current "
            "state as one insert batch) and make the downstream sink "
            "idempotent to the replay.")
        if pos == 0:
            # bootstrap: the diff base is the empty table, so the whole
            # current state is one insert batch — cheaper as a direct
            # read than as a degenerate full-outer join
            df = self.table.read_data(as_of_version=head).withColumn(
                "_change_type", F.lit("insert")
            )
        else:
            df = self.table.read_changes(pos, head)
        return df, pos, head

    def process_available(
        self,
        fn: Callable[[DataFrame, int, int], None],
        max_batches: int | None = None,
    ) -> int:
        """Drain everything committed so far: poll -> fn(df, lo, hi) ->
        commit, until caught up (or ``max_batches``). Returns batches
        delivered. fn's effects must be idempotent per (lo, hi] for
        exactly-once across crashes."""
        n = 0
        while max_batches is None or n < max_batches:
            batch = self.poll()
            if batch is None:
                break
            df, lo, hi = batch
            fn(df, lo, hi)
            self.commit(hi)
            n += 1
        return n
