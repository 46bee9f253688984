#!/usr/bin/env python
"""Run the test suite with per-file process isolation.

One pytest process per test file: a single process accumulating dozens
of large jitted XLA:CPU programs runs out of headroom and can segfault
inside `backend_compile_and_load` (observed on
`tests/test_rank_deficient.py` when run after the rest of the suite,
while the same file passes in isolation). Process isolation bounds the
per-process program count; files run in parallel workers to keep the
wall time comparable to one big run.

Usage: python run_tests.py [-jN] [pytest args...]
Exit code 0 iff every file passed. A summary table goes to stdout.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor


def main() -> int:
    args = sys.argv[1:]
    jobs = 3
    passthrough = []
    for a in args:
        if a.startswith("-j") and a[2:].isdigit():
            jobs = int(a[2:])
        else:
            passthrough.append(a)

    files = sorted(glob.glob("tests/test_*.py"))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2

    # stagger heavy files first so the long pole starts early
    sizes = {f: os.path.getsize(f) for f in files}
    files.sort(key=lambda f: -sizes[f])

    results = {}

    def run(f):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-m", "pytest", f, "-q", "--tb=short"]
            + passthrough,
            capture_output=True,
            text=True,
        )
        return f, p.returncode, time.time() - t0, p.stdout + p.stderr

    with ThreadPoolExecutor(max_workers=jobs) as ex:
        for f, rc, dt, out in ex.map(run, files):
            results[f] = (rc, dt, out)
            tail = out.strip().splitlines()[-1] if out.strip() else ""
            status = "PASS" if rc == 0 else f"FAIL(rc={rc})"
            print(f"{status:10s} {dt:6.1f}s  {f}: {tail}", flush=True)

    failed = [f for f, (rc, _, _) in results.items() if rc != 0]
    print()
    if failed:
        for f in failed:
            print(f"=== FAILURES in {f} ===")
            print(results[f][2][-4000:])
        print(f"\n{len(failed)}/{len(files)} files FAILED: {failed}")
        return 1
    total = sum(dt for _, dt, _ in results.values())
    print(f"all {len(files)} files passed (cumulative {total:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
