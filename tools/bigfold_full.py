"""Full-registry big-fold gate (VERDICT r9 #2): run EVERY registered
query through tools/check_correctness.py at a materialized k-fold sf_dir,
in isolated chunks, and aggregate one JSON verdict per query.

Chunking matters at the fold: one 300-query process would accumulate JVM
broadcast/codegen state for hours and a single crash would void the whole
run. Each chunk is a fresh Spark + DuckDB process; results merge into the
output JSON after every chunk, so the run is resumable (already-recorded
queries are skipped on restart).

Usage:
  python tools/scale_probe.py --materialize 10 /tmp/bigfold \
      /root/testdata/sf0.1 --relational
  python tools/bigfold_full.py /tmp/bigfold CORRECTNESS_BIGFOLD_FULL.json \
      [chunk_size] [timeout_sec]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OK_RE = re.compile(r"^\s*OK (\S+)\s+rows=\s*(\d+)\s+([\d.]+)s")
_ROWS_ONLY_RE = re.compile(r"^\s*(\S+)\s+rows=\s*(\d+)\s+\(rows-only")
_FAIL_RE = re.compile(r"^FAIL (\S+): (.*)")


def run_chunk(sf_dir: str, names: list[str], timeout: int) -> dict[str, dict]:
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_correctness.py"),
        sf_dir,
        *names,
    ]
    res: dict[str, dict] = {}
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout
        )
        out = proc.stdout
    except subprocess.TimeoutExpired as ex:
        out = (ex.stdout or b"").decode() if isinstance(ex.stdout, bytes) else (ex.stdout or "")
        for line in out.splitlines():
            _absorb(line, res)
        for n in names:
            res.setdefault(n, {"status": "timeout", "err": f"chunk timeout {timeout}s"})
        return res
    for line in out.splitlines():
        _absorb(line, res)
    missing = [n for n in names if n not in res]
    if missing:
        tail = "\n".join((proc.stderr or "").splitlines()[-12:])
        for n in missing:
            res[n] = {"status": "crashed", "err": tail[-1500:]}
    return res


def _absorb(line: str, res: dict[str, dict]) -> None:
    m = _OK_RE.match(line)
    if m:
        res[m.group(1)] = {
            "status": "ok",
            "rows": int(m.group(2)),
            "secs": float(m.group(3)),
        }
        return
    m = _ROWS_ONLY_RE.match(line)
    if m and not line.lstrip().startswith("OK"):
        res[m.group(1)] = {
            "status": "rows_only_ok",
            "rows": int(m.group(2)),
        }
        return
    m = _FAIL_RE.match(line)
    if m:
        res[m.group(1)] = {"status": "fail", "err": m.group(2)[:500]}


def main() -> int:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    chunk_size = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 3600

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    done: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            done = json.load(f).get("results", {})
    todo = [n for n in names if n not in done or done[n]["status"] in ("timeout", "crashed")]
    print(f"{len(names)} registered, {len(names) - len(todo)} recorded, {len(todo)} to run")
    t_start = time.time()
    for i in range(0, len(todo), chunk_size):
        chunk = todo[i : i + chunk_size]
        t0 = time.time()
        res = run_chunk(sf_dir, chunk, timeout)
        done.update(res)
        n_bad = sum(1 for r in done.values() if r["status"] not in ("ok", "rows_only_ok"))
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_registered": len(names),
                    "n_recorded": len(done),
                    "n_not_green": n_bad,
                    "results": done,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(
            f"chunk {i // chunk_size + 1}: {len(chunk)} queries in "
            f"{time.time() - t0:.0f}s  (total {len(done)}/{len(names)}, "
            f"not-green {n_bad}, elapsed {time.time() - t_start:.0f}s)",
            flush=True,
        )
    n_bad = sum(1 for r in done.values() if r["status"] not in ("ok", "rows_only_ok"))
    print("ALL GREEN" if n_bad == 0 else f"{n_bad} NOT GREEN")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
