"""Signal-toggled profiler (reference R7).

The reference toggles a statistical profiler on the LIVE replication
process with SIGUSR2 — flip it on mid-incident, flip it off, read the
dump — without restarting the stream
(replication_handler/batch/parse_replication_stream_internal.py:90-132).

The Spark translation has two halves, matching where Python code
actually runs:

- **Driver half** (``ProfilerToggle``): SIGUSR2 toggles ``cProfile`` on
  the driver process — the planning/control-plane loop the reference's
  toggle covered. First signal starts collection; second stops it and
  writes a ``pstats`` dump plus a human-readable top-N text file. Also
  callable programmatically (``start()`` / ``stop_and_dump()``) for
  harnesses that cannot signal.
- **Executor half** (``udf_profiling``): the JVM side is already
  covered by the Spark UI / event log, but PYTHON running on executors
  (Pandas UDFs, mapInArrow kernels) is invisible to both cProfile and
  the UI. Spark 4's built-in UDF profiler is the public API for exactly
  that: ``spark.sql.pyspark.udf.profiler = perf`` collects per-UDF
  cProfile stats Arrow-batch-wise and aggregates them on the driver
  (``spark.profile.show()`` / ``dump()``). The context manager scopes
  it to a block and restores the previous setting — profiling overhead
  never leaks into production runs.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import signal
import time
from contextlib import contextmanager

from pyspark.sql import SparkSession


class ProfilerToggle:
    """SIGUSR2-toggled cProfile on the current (driver) process.

    ``install()`` registers the handler; each ODD signal starts a fresh
    collection, each EVEN one stops it and writes
    ``<out_dir>/profile_<n>.pstats`` (binary, for ``pstats``/snakeviz)
    and ``profile_<n>.txt`` (top ``top_n`` by cumulative time). The
    dump does real I/O from handler context (there is no main-loop tick
    to defer to in a Spark driver), so the handler CONTAINS failures: a
    bad out_dir / full disk is reported to stderr, never propagated into
    whatever main-thread statement the signal interrupted — toggling a
    profiler must not be able to crash the live process it observes.
    """

    def __init__(self, out_dir: str, top_n: int = 40):
        self.out_dir = out_dir
        self.top_n = top_n
        self._profile: cProfile.Profile | None = None
        self._dumps = 0
        self._prev_handler = None

    @property
    def active(self) -> bool:
        return self._profile is not None

    def install(self) -> "ProfilerToggle":
        self._prev_handler = signal.signal(signal.SIGUSR2, self._on_signal)
        return self

    def uninstall(self) -> None:
        if self._prev_handler is not None:
            signal.signal(signal.SIGUSR2, self._prev_handler)
            self._prev_handler = None

    def _on_signal(self, signum, frame) -> None:
        import sys
        import traceback

        try:
            self.toggle()
        except Exception:  # noqa: BLE001 - containment is the contract
            print(
                "ProfilerToggle: dump failed (profiling state reset):\n"
                + traceback.format_exc(),
                file=sys.stderr,
            )

    def toggle(self) -> str | None:
        """Start if stopped; stop-and-dump if running. Returns the dump
        path when a dump was written."""
        if self._profile is None:
            self.start()
            return None
        return self.stop_and_dump()

    def start(self) -> None:
        if self._profile is not None:
            return
        prof = cProfile.Profile()
        prof.enable()
        self._profile = prof

    def stop_and_dump(self) -> str:
        if self._profile is None:
            raise RuntimeError("profiler is not running")
        prof = self._profile
        self._profile = None
        prof.disable()
        os.makedirs(self.out_dir, exist_ok=True)
        self._dumps += 1
        base = os.path.join(self.out_dir, f"profile_{self._dumps}")
        prof.dump_stats(base + ".pstats")
        stats = pstats.Stats(prof, stream=io.StringIO())
        stats.sort_stats("cumulative")
        buf = io.StringIO()
        stats.stream = buf
        stats.print_stats(self.top_n)
        with open(base + ".txt", "w") as f:
            f.write(f"# dumped at {time.strftime('%Y-%m-%dT%H:%M:%S')}\n")
            f.write(buf.getvalue())
        return base + ".pstats"

    def __enter__(self) -> "ProfilerToggle":
        return self.install()

    def __exit__(self, *exc) -> None:
        if self.active:
            self.stop_and_dump()
        self.uninstall()


_UDF_PROFILER_CONF = "spark.sql.pyspark.udf.profiler"


@contextmanager
def udf_profiling(spark: SparkSession, mode: str = "perf"):
    """Scope Spark's executor-side Python-UDF profiler to a block.

    Usage::

        with udf_profiling(spark):
            df.select(my_pandas_udf("x")).collect()
        spark.profile.show(type="perf")      # or .dump(dir)

    ``mode`` is ``perf`` (cProfile) or ``memory`` (tracemalloc), the two
    collectors the public API defines. The previous conf value is
    restored on exit even if the block raises.
    """
    if mode not in ("perf", "memory"):
        raise ValueError(f"unknown profiler mode {mode!r}")
    try:
        prev = spark.conf.get(_UDF_PROFILER_CONF)
    except Exception:
        prev = None
    spark.conf.set(_UDF_PROFILER_CONF, mode)
    try:
        yield spark.profile
    finally:
        if prev is None:
            spark.conf.unset(_UDF_PROFILER_CONF)
        else:
            spark.conf.set(_UDF_PROFILER_CONF, prev)
