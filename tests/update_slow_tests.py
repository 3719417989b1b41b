"""Regenerate tests/slow_tests.json — the measured `slow` test tier.

Runs the full suite once with ``--durations=0``, parses the per-test call
durations, and writes every nodeid slower than THRESHOLD_S to
``slow_tests.json``. ``tests/conftest.py`` applies the ``slow`` marker
from that file at collection time, so ``pytest -m "not slow"`` is a fast
change-audit tier (~2 min on one CPU) while the default full run is
unchanged.

Usage (from the repo root; takes the full-suite time, ~20-30 min):

    python tests/update_slow_tests.py [--threshold 2.0]

Or, to reuse an existing report instead of re-running the suite:

    python -m pytest tests/ -q --durations=0 | tee /tmp/dur.log
    python tests/update_slow_tests.py --from_log /tmp/dur.log
"""

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "slow_tests.json")
# "  12.34s call     tests/test_x.py::test_y[param]"
LINE = re.compile(r"^\s*([0-9.]+)s\s+call\s+(\S+)\s*$")


def parse(lines, threshold: float):
    slow = {}
    for line in lines:
        m = LINE.match(line)
        if not m:
            continue
        dur, nodeid = float(m.group(1)), m.group(2)
        if dur > threshold:
            # strip the tests/ prefix variance: conftest matches nodeids
            # as pytest reports them from the repo root
            slow[nodeid] = max(dur, slow.get(nodeid, 0.0))
    return slow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--from_log", default=None,
                    help="parse an existing `--durations=0` log instead "
                    "of running the suite")
    args = ap.parse_args()
    if args.from_log:
        with open(args.from_log) as f:
            lines = f.readlines()
    else:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q",
             "--durations=0", "-p", "no:cacheprovider"],
            cwd=os.path.dirname(HERE), capture_output=True, text=True)
        lines = proc.stdout.splitlines()
        if proc.returncode != 0:
            sys.stderr.write(proc.stdout[-4000:])
            raise SystemExit("suite failed — fix it before regenerating")
    slow = parse(lines, args.threshold)
    if not slow:
        raise SystemExit("no durations parsed — was --durations=0 set?")
    with open(OUT, "w") as f:
        json.dump(sorted(slow), f, indent=1)
        f.write("\n")
    total = sum(slow.values())
    print(f"{len(slow)} nodeids > {args.threshold}s "
          f"({total:.0f}s of measured call time) -> {OUT}")


if __name__ == "__main__":
    main()
