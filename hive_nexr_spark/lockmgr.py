"""Explicit table/partition lock manager (LOCK TABLE / UNLOCK TABLE /
SHOW LOCKS).

Hive-0.8 parity: `ql/lockmgr/HiveLockManager.java` (the interface),
`ql/lockmgr/zookeeper/ZooKeeperHiveLockManager.java` (the cross-client
implementation) and `exec/DDLTask.java` lockTable/unlockTable/showLocks
(the command surface and display format). The reference needs ZooKeeper
because many CLI processes contend; this engine is a single Spark
session, so the lock table is process-local — but the command surface,
conflict rules, display rows, and error messages are the reference's,
pinned by its own positive (lock1-4.q) and negative (lockneg1-5.q)
tests:

- ``LOCK TABLE t [PARTITION (spec)] SHARED|EXCLUSIVE`` acquires an
  EXPLICIT lock; re-acquiring SHARED over a held SHARED lock creates a
  SECOND lock node (lock1.q's golden lists two rows after two LOCK
  SHARED; lockneg1.q fails only on the subsequent EXCLUSIVE).
- EXCLUSIVE conflicts with any held lock, and any acquire conflicts
  with a held EXCLUSIVE: ``conflicting lock present for <obj> mode
  <MODE>`` (DDLTask lockTable error text).
- ``UNLOCK TABLE`` of an unlocked object: ``Table <t> is not locked``
  (lockneg2/3 — note the reference reports the TABLE name even for a
  partition unlock).
- ``SHOW LOCKS`` lists every lock sorted by object name; ``SHOW LOCKS
  t`` shows only the table-LEVEL lock (never its partitions' — lock2.q:
  the partition EXCLUSIVE row appears under ``SHOW LOCKS`` and ``SHOW
  LOCKS t PARTITION(...)`` but not under ``SHOW LOCKS t``); ``extended``
  appends the ``LOCK_QUERYID:.. LOCK_TIME:.. LOCK_MODE:EXPLICIT`` detail
  line after each lock row (golden transcripts canonicalize the
  query-id/time, which are run-dependent).

Implicit query-time locks (``hive.lock.numretries`` machinery around
Driver.acquireReadWriteLocks) are acquired and released WITHIN one
statement — a single-session transcript can never observe them
(lock3/lock4.q show empty SHOW LOCKS output after queries), so only
explicit locks are stored.
"""

from __future__ import annotations

SHARED = "SHARED"
EXCLUSIVE = "EXCLUSIVE"


class LockError(Exception):
    """Lock-command failure with the reference's error text."""


def object_name(table: str, part_spec: list[tuple[str, str]] | None = None,
                db: str = "default") -> str:
    """``db@table`` or ``db@table@k1=v1/k2=v2`` (ZooKeeperHiveLockManager
    getObjectName display form)."""
    base = f"{db}@{table}"
    if part_spec:
        return base + "@" + "/".join(f"{k}={v}" for k, v in part_spec)
    return base


class LockManager:
    def __init__(self) -> None:
        # object name -> stack of held modes: a repeated SHARED acquire
        # creates a SECOND lock (ZooKeeperHiveLockManager sequential
        # nodes — lock1.q's golden shows two rows after two LOCK SHARED)
        # stack entries are (mode, seq): the sequence number is assigned
        # at ACQUISITION time (ZooKeeper sequential-node semantics) so
        # show() is a pure read — repeated SHOW LOCKS EXTENDED must not
        # mutate state or renumber rows
        self._locks: dict[str, list[tuple[str, int]]] = {}
        self._seq = 0

    def lock(self, obj: str, mode: str) -> None:
        mode = mode.upper()
        held = [m for m, _ in self._locks.get(obj, [])]
        if (mode == EXCLUSIVE and held) or EXCLUSIVE in held:
            # exclusive conflicts with anything held; anything conflicts
            # with a held exclusive (lockneg1.q)
            raise LockError(
                f"conflicting lock present for {obj} mode {mode}")
        self._seq += 1
        self._locks.setdefault(obj, []).append((mode, self._seq))

    def unlock(self, obj: str, table: str) -> None:
        if obj not in self._locks:
            # reference text has a trailing space and names the TABLE
            # even when a partition spec was given (lockneg3.q)
            raise LockError(f"Table {table} is not locked ")
        # releases every lock node on the object (lock1.q: one UNLOCK
        # clears both stacked SHARED locks)
        del self._locks[obj]

    def show(self, obj: str | None = None,
             extended: bool = False) -> list[tuple[str, str]]:
        """Rows for SHOW LOCKS as (col1, col2) pairs matching the CLI's
        tab-separated display: the lock row is (object, mode); the
        extended detail row is (``LOCK_QUERYID:<id> LOCK_TIME:<ms>
        LOCK_MODE:EXPLICIT ``, `` ``) — id/time are run-dependent in the
        reference's goldens and canonicalized by the differ."""
        if obj is None:
            items = sorted(self._locks.items())
        else:
            items = [(obj, self._locks[obj])] if obj in self._locks else []
        rows: list[tuple[str, str]] = []
        for name, modes in items:
            for mode, seq in modes:
                rows.append((name, mode))
                if extended:
                    rows.append((
                        f"LOCK_QUERYID:engine_{seq:020d} LOCK_TIME:0 "
                        f"LOCK_MODE:EXPLICIT ", " "))
        return rows

    def clear(self) -> None:
        self._locks.clear()
