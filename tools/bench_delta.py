#!/usr/bin/env python3
"""Round-over-round bench comparison (dev tool, driver-side python).

Usage: python3 tools/bench_delta.py BENCH_r01.json BENCH_r02.json
Accepts either the driver's wrapper JSON (with the bench line inside
"tail") or a raw one-line Bench output. Prints the per-query delta table
used in BENCH_HISTORY.md.
"""
import json
import re
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


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    print("| query | prev (s) | curr (s) | delta |")
    print("|---|---|---|---|")
    for name in sorted(set(qa) | set(qb)):
        x, y = qa.get(name), qb.get(name)
        if x is not None and y is not None:
            d = f"{(y - x) / x * 100:+.0f}%" if x > 0 else "n/a"
        elif y is not None:
            d = "new"
        else:
            d = "removed"
        fx = f"{x:.2f}" if x is not None else "—"
        fy = f"{y:.2f}" if y is not None else "—"
        print(f"| {name} | {fx} | {fy} | {d} |")
    print(f"\ntotals: prev {a['value']:.2f} s ({len(qa)} queries), "
          f"curr {b['value']:.2f} s ({len(qb)} queries)")


if __name__ == "__main__":
    main()
