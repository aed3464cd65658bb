"""T7 namespace singleton lock (streaming/singleton.py): the reference's
ZKLock semantics — at most one live instance per namespace, ephemeral on
owner death — re-expressed as an exclusive-create lock file on the
checkpoint's storage."""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

from mysql_streamer_spark.streaming.singleton import (
    LOCK_FILENAME,
    NamespaceLock,
    SingletonLockHeld,
)


def test_second_acquire_fails_while_held(tmp_path):
    ns = str(tmp_path / "ckpt")
    with NamespaceLock(ns):
        with pytest.raises(SingletonLockHeld):
            NamespaceLock(ns).acquire()
    # released on exit: acquirable again
    with NamespaceLock(ns):
        pass


def test_release_is_idempotent_and_scoped(tmp_path):
    ns = str(tmp_path / "ckpt")
    lock = NamespaceLock(ns).acquire()
    lock.release()
    lock.release()  # no-op
    # a lock object that never acquired must not delete someone else's file
    holder = NamespaceLock(ns).acquire()
    NamespaceLock(ns).release()
    assert os.path.exists(holder.path)
    holder.release()


def test_exception_inside_context_releases(tmp_path):
    ns = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="boom"):
        with NamespaceLock(ns):
            raise RuntimeError("boom")
    with NamespaceLock(ns):
        pass


def test_stale_dead_pid_lock_is_broken(tmp_path):
    ns = str(tmp_path / "ckpt")
    os.makedirs(ns)
    # forge a lock owned by a dead pid on THIS host
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()
    with open(os.path.join(ns, LOCK_FILENAME), "w") as f:
        json.dump(
            {"pid": proc.pid, "host": socket.gethostname(), "acquired_at": 0},
            f,
        )
    with NamespaceLock(ns):  # takeover succeeds
        pass


def test_foreign_host_lock_is_respected(tmp_path):
    ns = str(tmp_path / "ckpt")
    os.makedirs(ns)
    with open(os.path.join(ns, LOCK_FILENAME), "w") as f:
        json.dump({"pid": 1, "host": "some-other-host", "acquired_at": 0}, f)
    with pytest.raises(SingletonLockHeld):
        NamespaceLock(ns).acquire()
    # explicit operator break is the only way through
    lock = NamespaceLock(ns)
    lock.break_lock()
    with NamespaceLock(ns):
        pass


def test_torn_lock_file_is_respected_not_broken(tmp_path):
    ns = str(tmp_path / "ckpt")
    os.makedirs(ns)
    with open(os.path.join(ns, LOCK_FILENAME), "w") as f:
        f.write("{half a json")
    with pytest.raises(SingletonLockHeld):
        NamespaceLock(ns).acquire()


def test_hard_killed_holder_is_stale_across_processes(tmp_path):
    """The ZK-ephemeral property: a kill -9'd owner's lock is breakable by
    the next real process."""
    ns = str(tmp_path / "ckpt")
    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import sys, time; sys.path.insert(0, %r); "
            "from mysql_streamer_spark.streaming.singleton import NamespaceLock; "
            "NamespaceLock(%r).acquire(); print('held', flush=True); time.sleep(60)"
            % (os.getcwd(), ns),
        ],
    stdout=subprocess.PIPE,
    )
    assert holder.stdout is not None
    assert holder.stdout.readline().strip() == b"held"
    # live holder blocks us
    with pytest.raises(SingletonLockHeld):
        NamespaceLock(ns).acquire()
    holder.send_signal(signal.SIGKILL)
    holder.wait()
    deadline = time.time() + 5
    while True:  # pid table settles asynchronously after SIGKILL
        try:
            with NamespaceLock(ns):
                break
        except SingletonLockHeld:
            if time.time() > deadline:
                raise
            time.sleep(0.1)


def test_envelope_stream_runs_under_the_lock(spark, sf_dir, tmp_path):
    """Integration: a foreign live lock on the checkpoint namespace stops
    run_envelope_stream before it writes anything."""
    from mysql_streamer_spark.streaming.runner import run_envelope_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(src, "events.parquet")
    )
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    with open(os.path.join(ckpt, LOCK_FILENAME), "w") as f:
        json.dump({"pid": 1, "host": "other-host", "acquired_at": 0}, f)
    with pytest.raises(SingletonLockHeld):
        run_envelope_stream(spark, src, str(tmp_path / "out"), ckpt)
    assert not os.path.exists(str(tmp_path / "out"))
    # break + run: completes and leaves no lock behind
    NamespaceLock(ckpt).break_lock()
    n = run_envelope_stream(spark, src, str(tmp_path / "out"), ckpt)
    assert n >= 1
    assert not os.path.exists(os.path.join(ckpt, LOCK_FILENAME))
