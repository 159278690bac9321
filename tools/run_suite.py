"""Full-suite runner that sidesteps the XLA-CPU compiler segfault.

A single-process full-suite run segfaults the XLA CPU compiler at ~test
118 (per-process compiler memory growth; reproduced 3x in round 4, see
CLAUDE.md). This runner keeps full green runnable by ONE documented
command: it splits tests/test_*.py into --chunks contiguous groups and
runs each group in a FRESH pytest process, so no process ever approaches
the compiler-memory cliff, then aggregates the results.

Usage:
    python tools/run_suite.py            # 3 chunks, the safe default
    python tools/run_suite.py --chunks 4 --pytest-args "-x -q"

Exit code 0 iff every chunk exits 0. Per-chunk logs land next to
--log-dir (default /tmp/qppvm_suite) for grepping.
"""
import argparse
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--pytest-args", default="-q")
    ap.add_argument("--log-dir", default="/tmp/qppvm_suite")
    args = ap.parse_args()

    files = sorted((REPO / "tests").glob("test_*.py"))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    n = max(1, min(args.chunks, len(files)))
    # contiguous split, sizes as even as file count allows
    per = len(files) / n
    chunks = [files[round(i * per):round((i + 1) * per)] for i in range(n)]

    log_dir = pathlib.Path(args.log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    totals = {"passed": 0, "failed": 0, "error": 0, "skipped": 0,
              "xfailed": 0, "xpassed": 0}
    rc_all = 0
    t_start = time.time()
    for i, chunk in enumerate(chunks):
        log = log_dir / f"chunk{i}.log"
        cmd = [sys.executable, "-m", "pytest",
               *args.pytest_args.split(), *[str(f) for f in chunk]]
        print(f"[chunk {i + 1}/{n}] {len(chunk)} files -> {log}",
              flush=True)
        t0 = time.time()
        with open(log, "w") as fh:
            rc = subprocess.run(cmd, cwd=REPO, stdout=fh,
                                stderr=subprocess.STDOUT).returncode
        tail = log.read_text().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        print(f"[chunk {i + 1}/{n}] rc={rc} {time.time() - t0:.0f}s "
              f"{summary}", flush=True)
        if rc != 0:
            rc_all = 1
        for key in totals:
            m = re.search(rf"(\d+) {key}", summary)
            if m:
                totals[key] += int(m.group(1))

    agg = ", ".join(f"{v} {k}" for k, v in totals.items() if v)
    print(f"TOTAL: {agg}  ({time.time() - t_start:.0f}s, "
          f"{'GREEN' if rc_all == 0 else 'RED'})")
    return rc_all


if __name__ == "__main__":
    sys.exit(main())
