#!/usr/bin/env python
"""Run the fast test suite sharded per-file in subprocesses.

Why this exists: the full single-process suite compiles hundreds of
distinct XLA step graphs; the accumulated in-process compilation state
crashed 3/3 full-suite runs on a 2-vCPU host in round 4 (segfault at ~80%
progress, every subset green in isolation).  Two mitigations ship:

  1. tests/conftest.py drops jax caches between modules (fixes the
     accumulation in-process, so plain `pytest tests/ -q` works too);
  2. this runner isolates each test FILE in its own interpreter, so no
     state can accumulate across files at all — the CI-grade gate.

Usage:  python tests/run_suite.py [-m MARKEXPR] [extra pytest args...]
Exit code: 0 iff every file's pytest run exits 0.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import time


def main() -> int:
    here = pathlib.Path(__file__).parent
    files = sorted(p for p in here.glob("test_*.py"))
    extra = sys.argv[1:]
    failures: list[str] = []
    t0 = time.time()
    # two shards in flight (subprocesses are fully isolated; the host's
    # vCPUs overlap one shard's compile phases with another's BLAS work —
    # measured 1772 s serial -> well under half overlapped).  Longest
    # files first so the tail isn't one straggler.
    order = {"test_sparse_engine.py": 0, "test_pars_live.py": 1,
             "test_examples.py": 2, "test_panels.py": 3,
             "test_parallel.py": 4, "test_hybrid.py": 5}
    files.sort(key=lambda p: order.get(p.name, 99))
    import concurrent.futures as cf

    def run_one(f):
        t1 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", str(f), "-q", *extra],
            cwd=str(here.parent), capture_output=True, text=True,
        )
        return f, proc, time.time() - t1

    workers = int(__import__("os").environ.get("RUN_SUITE_JOBS", "2"))
    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        for f, proc, dt in ex.map(run_one, files):
            status = ("ok" if proc.returncode == 0
                      else f"FAIL rc={proc.returncode}")
            print(f"[run_suite] {f.name}: {status} ({dt:.1f}s)", flush=True)
            if proc.returncode not in (0, 5):  # 5 = no tests collected
                failures.append(f.name)
                sys.stdout.write(proc.stdout[-4000:])
                sys.stderr.write(proc.stderr[-2000:])
    print(f"[run_suite] total {time.time() - t0:.1f}s; "
          f"{len(files) - len(failures)}/{len(files)} files green")
    if failures:
        print(f"[run_suite] failing files: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
