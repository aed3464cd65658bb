"""R7 profiler toggle (profiling.py): SIGUSR2-toggled driver cProfile and
the scoped executor-side UDF profiler.

(No ``from __future__ import annotations`` here: pandas_udf resolves the
type hints at decoration time and deferred-string annotations defeat it.)
"""

import os
import pstats
import signal

import pytest

from mysql_streamer_spark.profiling import ProfilerToggle, udf_profiling


def _busy():
    return sum(i * i for i in range(20000))


def test_signal_toggle_starts_then_dumps(tmp_path):
    with ProfilerToggle(str(tmp_path)) as toggle:
        os.kill(os.getpid(), signal.SIGUSR2)  # on
        assert toggle.active
        _busy()
        os.kill(os.getpid(), signal.SIGUSR2)  # off + dump
        assert not toggle.active
    dump = tmp_path / "profile_1.pstats"
    txt = tmp_path / "profile_1.txt"
    assert dump.exists() and txt.exists()
    stats = pstats.Stats(str(dump))
    assert stats.total_calls > 0
    assert "cumulative" in txt.read_text() or "cumtime" in txt.read_text()


def test_programmatic_start_stop_and_sequential_dumps(tmp_path):
    t = ProfilerToggle(str(tmp_path), top_n=5)
    t.start()
    _busy()
    p1 = t.stop_and_dump()
    t.start()
    _busy()
    p2 = t.stop_and_dump()
    assert p1.endswith("profile_1.pstats") and p2.endswith("profile_2.pstats")
    with pytest.raises(RuntimeError):
        t.stop_and_dump()


def test_start_is_idempotent_and_exit_dumps_active_profile(tmp_path):
    with ProfilerToggle(str(tmp_path)) as t:
        t.start()
        t.start()  # no-op, not a restart
        _busy()
    # exiting with an active profile flushes it
    assert (tmp_path / "profile_1.pstats").exists()


def test_signal_handler_contains_dump_failures(tmp_path, capsys):
    """A bad out_dir must not let the toggle crash the process it
    observes: the handler reports to stderr and resets state."""
    bad = tmp_path / "file_not_dir"
    bad.write_text("x")
    with ProfilerToggle(str(bad)) as t:
        os.kill(os.getpid(), signal.SIGUSR2)  # on
        _busy()
        os.kill(os.getpid(), signal.SIGUSR2)  # off -> dump fails, contained
        assert not t.active
        err = capsys.readouterr().err
        assert "dump failed" in err
        os.kill(os.getpid(), signal.SIGUSR2)  # still toggleable afterwards
        assert t.active
        t._profile = None  # drop so __exit__ doesn't re-dump into the bad dir


def test_uninstall_restores_previous_handler(tmp_path):
    prev = signal.getsignal(signal.SIGUSR2)
    t = ProfilerToggle(str(tmp_path)).install()
    assert signal.getsignal(signal.SIGUSR2) != prev
    t.uninstall()
    assert signal.getsignal(signal.SIGUSR2) == prev


def test_udf_profiling_collects_executor_python_stats(spark, tmp_path):
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def slow_square(v: pd.Series) -> pd.Series:
        return v * v

    spark.profile.clear()
    with udf_profiling(spark) as profile:
        df = spark.range(1000).select(slow_square(col("id").cast("double")))
        df.collect()
    # conf restored after the block
    assert spark.conf.get("spark.sql.pyspark.udf.profiler", None) in (None, "")
    out = str(tmp_path / "udfprof")
    profile.dump(out, type="perf")
    dumped = os.listdir(out)
    assert dumped, "expected at least one per-UDF perf dump"
    st = pstats.Stats(os.path.join(out, dumped[0]))
    assert st.total_calls > 0


def test_udf_profiling_rejects_unknown_mode(spark):
    with pytest.raises(ValueError):
        with udf_profiling(spark, mode="flamegraph"):
            pass
