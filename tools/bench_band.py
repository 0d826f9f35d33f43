#!/usr/bin/env python3
"""Adjudicate bench deltas against the machine band (dev tool).

The suite number moves with JVM context and machine drift (BENCH_HISTORY:
±5-10% uniform bands dominate round-over-round deltas). This tool removes
both: it re-times the N slowest queries of a bench run rep-2 in a FRESH
JVM each (rep 1 = plan/JIT warmup, rep 2 = steady state) and prints the
steady-state beside the suite number — one command to tell "regression"
from "band".

Usage:
  python3 tools/bench_band.py BENCH_LOCAL_rN.json \
      [--sf /root/testdata/sf0.1] [--top 20] [--prev BENCH_LOCAL_rM.json]

--prev adds the previous run's suite seconds as a third column, so a
suspect query shows all three numbers at once: prev suite, curr suite,
curr steady-state. A query whose steady-state sits at or below its prev
suite time is band noise, not a regression.
"""
import argparse
import json
import re
import subprocess
import sys


def load(path):
    raw = open(path).read()
    try:
        doc = json.loads(raw)
        if isinstance(doc, dict) and "queries" in doc:
            return doc
        raw = doc.get("tail", raw) if isinstance(doc, dict) else raw
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{?"metric":.*\}', raw)
    if not m:
        raise SystemExit(f"no bench line found in {path}")
    line = m.group(0)
    if not line.startswith("{"):
        line = "{" + line
    return json.loads(line)


def time_fresh(name, sf, reps=2):
    """One fresh JVM, rep-`reps` — returns [rep1_s, rep2_s, ...]."""
    cmd = ["sbt", "-batch", f"runMain graft.tools.TimeQuery {sf} {name} {reps}"]
    out = subprocess.run(cmd, capture_output=True, text=True).stdout
    times = []
    for rep in range(1, reps + 1):
        m = re.search(rf"\[time\] rep{rep} {re.escape(name)}\s+([0-9.]+) s", out)
        times.append(float(m.group(1)) if m else None)
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", help="BENCH_LOCAL_r*.json / BENCH_r*.json of the run to adjudicate")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--prev", help="previous round's bench json (optional third column)")
    args = ap.parse_args()

    cur = load(args.bench)
    prev_q = load(args.prev)["queries"] if args.prev else {}
    slowest = sorted(cur["queries"].items(), key=lambda kv: -kv[1])[: args.top]

    print(f"suite: {cur['value']:.1f} s / {len(cur['queries'])} queries "
          f"({cur['value'] / len(cur['queries']):.3f} s/q) at sf={cur.get('sf', '?')}")
    print(f"re-timing the {len(slowest)} slowest, rep-2 fresh-JVM each "
          f"(~30 s JVM startup per query)...\n")
    hdr = "| query | prev suite | suite | fresh rep1 | steady (rep2) | steady/suite |"
    print(hdr)
    print("|---|---|---|---|---|---|")
    sys.stdout.flush()
    for name, suite_s in slowest:
        t = time_fresh(name, args.sf)
        r1 = f"{t[0]:.2f}" if t[0] is not None else "ERR"
        r2 = f"{t[1]:.2f}" if t[1] is not None else "ERR"
        ratio = f"{t[1] / suite_s:.2f}x" if t[1] is not None and suite_s > 0 else "n/a"
        pv = f"{prev_q[name]:.2f}" if name in prev_q else "—"
        print(f"| {name} | {pv} | {suite_s:.2f} | {r1} | {r2} | {ratio} |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
