"""Global singleton lock per namespace (reference T7).

The reference refuses to start two replication handlers for the same
namespace: ``ZKLock("replication_handler", namespace)`` is acquired
before the stream starts and held for the process lifetime
(replication_handler/batch/base_parse_replication_stream.py:126-131) —
two concurrent instances would double-publish and corrupt positions.

Spark enforces one *in-session* query per checkpoint directory, but
nothing stops a SECOND driver process (a mis-deployed duplicate job, a
zombie from a bad rollout) from starting against the same checkpoint +
sink lineage — exactly the failure ZK arbitration exists for. This
module is the same arbitration on the storage the checkpoint already
lives on: a kernel-arbitrated ``flock`` on a lock file inside the
namespace directory.

Why flock and not create/unlink dances: an exclusive-create protocol
needs stale-owner detection, and every unlink-based takeover has a
TOCTOU window where a breaker can delete a FRESH lock another process
just acquired (two instances then run — the split-brain this class
exists to prevent). ``flock`` gives both properties natively: the
kernel serializes acquisition, and — the ZK-ephemeral property — the
lock vanishes the instant the owner dies, kill -9 included, with no
pid-liveness guessing. The lock file itself carries owner metadata
purely for the error message and operator forensics.

Shared-storage note: on NFSv4 ``flock`` maps to server-side byte-range
locks and remains correct across hosts; on object stores without POSIX
lock semantics, namespace arbitration belongs to the cluster manager
(run one driver per app id) and this lock still protects the
single-host/multi-process case the tests pin.
"""

from __future__ import annotations

import fcntl
import json
import os
import socket
import time

LOCK_FILENAME = "_singleton.lock"


class SingletonLockHeld(RuntimeError):
    """Another live instance owns this namespace."""


class NamespaceLock:
    """At-most-one-instance lock for a streaming namespace directory.

    Usage::

        with NamespaceLock(checkpoint_dir):
            ...  # run the query; a second process raises SingletonLockHeld
    """

    def __init__(self, namespace_dir: str):
        self.namespace_dir = namespace_dir
        self.path = os.path.join(namespace_dir, LOCK_FILENAME)
        self._fd: int | None = None

    @property
    def held(self) -> bool:
        return self._fd is not None

    def _read_owner(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def acquire(self) -> "NamespaceLock":
        if self._fd is not None:
            return self
        os.makedirs(self.namespace_dir, exist_ok=True)
        while True:
            fd = os.open(self.path, os.O_CREAT | os.O_RDWR)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:
                os.close(fd)
                raise SingletonLockHeld(
                    f"namespace {self.namespace_dir!r} is locked by "
                    f"{self._read_owner()!r}"
                ) from None
            # We flocked SOME inode; re-check it is still the inode at
            # ``path``. A releasing holder unlinks before closing, so a
            # lock on an already-unlinked (or since-replaced) inode
            # guards nothing — retry on the current file.
            try:
                if os.stat(self.path).st_ino == os.fstat(fd).st_ino:
                    os.ftruncate(fd, 0)
                    os.write(
                        fd,
                        json.dumps(
                            {
                                "pid": os.getpid(),
                                "host": socket.gethostname(),
                                "acquired_at": time.time(),
                            }
                        ).encode(),
                    )
                    self._fd = fd
                    return self
            except FileNotFoundError:
                pass
            os.close(fd)  # releases the stale-inode flock

    def release(self) -> None:
        if self._fd is None:
            return
        fd, self._fd = self._fd, None
        # unlink BEFORE closing, but only if ``path`` is still OUR inode:
        # after a break_lock + re-acquire by another process, the path
        # belongs to the new holder and must survive our exit. For our
        # own inode, unlink-then-close means new acquirers either see no
        # file (create fresh) or flock the still-locked inode and fail
        # the acquire-side inode re-check — never an unlocked current
        # file.
        try:
            if os.stat(self.path).st_ino == os.fstat(fd).st_ino:
                os.unlink(self.path)
        except FileNotFoundError:
            pass
        os.close(fd)

    def break_lock(self) -> None:
        """Operator override: unlink the lock file (the 'rmr the ZK node'
        runbook step). The current holder's flock survives on the
        unlinked inode — breaking does not crash it — but the namespace
        becomes acquirable, so the operator owns the consequences.
        Never called implicitly."""
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass

    def __enter__(self) -> "NamespaceLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
