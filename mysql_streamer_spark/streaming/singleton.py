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
lives on: an O_CREAT|O_EXCL lock file inside the namespace directory.
On a real cluster that directory is on the shared filesystem (HDFS/
object store with a consistent view), so the exclusive-create is
cluster-global the same way the checkpoint's own WAL is.

Liveness: the lock records owner pid + host + acquire time. A lock
whose owner pid is provably dead ON THE SAME HOST is stale and may be
broken by the next acquirer (the reference gets this for free from ZK
ephemeral nodes; a lock file needs the explicit check). A lock held by
another HOST is never presumed dead — refusing to guess is what keeps
split-brain impossible; operators break it explicitly via
``break_lock``.
"""

from __future__ import annotations

import json
import os
import socket
import time

LOCK_FILENAME = "_singleton.lock"


class SingletonLockHeld(RuntimeError):
    """Another live instance owns this namespace."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # exists, owned by someone else
        return True
    return True


class NamespaceLock:
    """At-most-one-instance lock for a streaming namespace directory.

    Usage::

        with NamespaceLock(checkpoint_dir):
            ...  # run the query; a second process raises SingletonLockHeld
    """

    def __init__(self, namespace_dir: str):
        self.namespace_dir = namespace_dir
        self.path = os.path.join(namespace_dir, LOCK_FILENAME)
        self._held = False

    def _read_owner(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None
        except ValueError:
            # torn write from a crashed acquirer: unparseable = unverifiable
            # liveness; treat like a foreign-host lock (explicit break only)
            return {}

    def _owner_is_stale(self) -> bool:
        owner = self._read_owner()
        if owner is None:
            return False  # vanished: racing release; retry the create
        pid, host = owner.get("pid"), owner.get("host")
        if not isinstance(pid, int) or host != socket.gethostname():
            return False  # foreign/unverifiable: never presume dead
        return not _pid_alive(pid)

    def acquire(self) -> "NamespaceLock":
        os.makedirs(self.namespace_dir, exist_ok=True)
        for _ in range(2):  # second pass after clearing a stale lock
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                if self._owner_is_stale():
                    # dead same-host owner: break and re-contend (the
                    # exclusive create arbitrates concurrent breakers)
                    try:
                        os.unlink(self.path)
                    except FileNotFoundError:
                        pass
                    continue
                owner = self._read_owner()
                raise SingletonLockHeld(
                    f"namespace {self.namespace_dir!r} is locked by {owner!r}"
                ) from None
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {
                        "pid": os.getpid(),
                        "host": socket.gethostname(),
                        "acquired_at": time.time(),
                    },
                    f,
                )
            self._held = True
            return self
        owner = self._read_owner()
        raise SingletonLockHeld(
            f"namespace {self.namespace_dir!r} is locked by {owner!r}"
        )

    def release(self) -> None:
        if self._held:
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass
            self._held = False

    def break_lock(self) -> None:
        """Operator override: remove the lock regardless of owner (the
        'rmr the ZK node' runbook step). Never called implicitly."""
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass

    def __enter__(self) -> "NamespaceLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
