"""Official full-suite entry point: per-file pytest subprocesses.

A single-process `pytest tests/` run of the whole suite segfaults
sporadically inside XLA-CPU's LLVM JIT after dozens of large compilations
(always under `backend_compile_and_load`, at a different test each run —
reproduced with a 256 MB stack limit, so it is not stack exhaustion, and
the host has >100 GB free, so not system OOM; the crash surface is
process-cumulative state in the CPU compiler). Until that upstream issue
is fixed, this runner executes each test file in its own interpreter:
every batch passes reliably, crashes are isolated and reported per file,
and the shared persistent compilation cache (set up in conftest.py) keeps
repeat compiles across batches near-free.

Usage:
    python tests/run_suite.py              # everything
    python tests/run_suite.py -m "not slow"  # extra pytest args forwarded
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "test_*.py")))
    extra = sys.argv[1:]
    failures: list[tuple[str, int]] = []
    total = 0
    t0 = time.time()
    for f in files:
        name = os.path.basename(f)
        print(f"=== {name}", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", f, "-q", *extra],
            cwd=os.path.dirname(here),
        )
        total += 1
        if rc == 5:  # no tests collected under this filter
            continue
        if rc != 0:
            failures.append((name, rc))
    dt = time.time() - t0
    print(f"\n=== suite: {total} files in {dt:.0f}s, "
          f"{len(failures)} failing file(s)", flush=True)
    for name, rc in failures:
        print(f"  FAIL rc={rc}: {name}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
