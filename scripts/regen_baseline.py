#!/usr/bin/env python3
"""Rebuild BASELINE.md's main per-query table from fresh sweep data
(r16 judge item #8: the old table mixed pins from different rounds —
its duckdb column summed to 128.5 s while the gate's fresh sweep said
120.9 s).

Usage: regen_baseline.py <duckdb.json> <bench1.json> [bench2.json ...]

Prints the replacement table body (sorted by query name) and the
totals line; spark_sec = min across the given bench sweeps, '—' for
bench-excluded keys. The caller splices it into BASELINE.md.
"""
import json, sys


def main():
    duck = json.load(open(sys.argv[1]))
    sparks = [json.load(open(p))['queries'] for p in sys.argv[2:]]
    merged = {}
    for s in sparks:
        for k, v in s.items():
            merged[k] = min(merged.get(k, 1e18), v)
    rows = []
    dtot = stot = 0.0
    n = 0
    for q in sorted(duck):
        d = duck[q]
        s = merged.get(q)
        if s is None:
            rows.append(f"| {q} | {d:.3f} | — | — |")
            continue
        rows.append(f"| {q} | {d:.3f} | {s:.3f} | {s / d:.2f} |")
        dtot += d
        stot += s
        n += 1
    print("| query | duckdb_sec | spark_sec | ratio |")
    print("|---|---|---|---|")
    print("\n".join(rows))
    print()
    print(f"TOTALS: {n} oracle-paired timed queries, "
          f"duckdb {dtot:.1f} s, spark {stot:.1f} s, "
          f"ratio {stot / dtot:.2f}x")


if __name__ == '__main__':
    main()
