"""One-command release check — wires the repo's three gates together and
prints ONE PASS/FAIL JSON line:

    python tools/release_gate.py            # driver_sim + pytest + bench
    python tools/release_gate.py --no-bench # skip the timing gate

Gates:
- driver_sim: the external-driver contract (entry smoke + every queries()
  vs oracle_sql() with the order-insensitive value hash) — exit 0 means
  ALL MATCH;
- pytest: the full test suite (-x -q);
- bench: bench.py at $SPARK_GRAFT_SF_DIR; only VALID when the host was
  quiet (bench.py's own `quiet` key — the sandbox is shared, and numbers
  taken above ambient load ~6 measure co-tenants, not code). A noisy
  bench is reported as "bench_valid": false, not as a failure: the
  correctness gates are load-independent, the timing gate is not.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], timeout: int) -> tuple[int, str, str, float]:
    t0 = time.monotonic()
    try:
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
        rc, out, err = p.returncode, p.stdout, p.stderr
    except subprocess.TimeoutExpired as e:
        # a hung gate must still yield the one-line JSON contract
        rc = 124
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = f"TIMEOUT after {timeout}s"
    return rc, out, err, round(time.monotonic() - t0, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-bench", action="store_true")
    args = ap.parse_args()

    report: dict = {}

    rc, out, err, secs = _run([sys.executable, "tools/driver_sim.py"], 3600)
    n_match = out.count('"match": true')
    report["driver_sim"] = {"pass": rc == 0, "queries_match": n_match,
                           "secs": secs}

    rc, out, err, secs = _run(
        [sys.executable, "-m", "pytest", "tests/", "-x", "-q"], 7200
    )
    tail = (out.strip().splitlines() or [""])[-1]
    report["pytest"] = {"pass": rc == 0, "summary": tail[-120:], "secs": secs}

    if not args.no_bench:
        rc, out, err, secs = _run([sys.executable, "bench.py"], 3600)
        bench = None
        for line in out.strip().splitlines():
            if line.startswith("{"):
                bench = json.loads(line)
        if rc == 0 and bench:
            report["bench"] = {
                "suite_sec": bench["value"],
                "load": bench.get("load"),
                "cpu_s": bench.get("cpu_s"),
                "bench_valid": bool(bench.get("quiet", False)),
                "secs": secs,
            }
        else:
            report["bench"] = {"suite_sec": None, "bench_valid": False,
                               "error": (err or out)[-300:], "secs": secs}

    report["pass"] = report["driver_sim"]["pass"] and report["pytest"]["pass"]
    print(json.dumps(report))
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
