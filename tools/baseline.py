#!/usr/bin/env python3
"""Generate BASELINE.md: DuckDB single-node wall-times for every oracle
query at a given scale factor, next to the Spark engine's Bench times.

Usage: python3 tools/baseline.py SF_DIR ORACLE_JSON BENCH_JSON > BASELINE.md

DuckDB executing the oracle SQL is the single-node columnar baseline
the brief's 2x gate compares against (the reference repo itself ships
no engine — its pandas/GX stages have no comparable query surface).
Each query runs 6 times; the min is reported (same 6-sample min
estimator as the two 3-pass Bench runs).
"""
import sys, json, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, oracle_path, bench_path = sys.argv[1:4]
    oracle = json.load(open(oracle_path))
    bench = json.load(open(bench_path)).get("queries", {})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    rows = []
    for name, sql in sorted(oracle.items()):
        ts = []
        err = None
        for _ in range(6):
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                err = str(e).split("\n")[0][:80]
                break
            ts.append(time.monotonic() - t0)
        rows.append((name, min(ts) if ts else None, err))

    print(f"# BASELINE — DuckDB oracle wall-times at `{sfdir}`")
    print()
    print("Single-node columnar baseline: each `oracleSql` entry executed in")
    print("DuckDB (all cores, min of 6 runs) on the same parquet the engine")
    print("reads. `spark_sec` is the per-query min over two independent")
    print("min-of-3 Bench runs at `local[32]` (6 timed passes; per-pass")
    print("times plus loadavg are in bench.json) — steady state: warmed")
    print("JVM, codegen compiled.")
    print("`ratio` = spark/duckdb; the brief's gate is ratio <= 2x on the")
    print("whole-workload total. Queries without an oracle (rows-only checks)")
    print("are absent here; Bench still times them.")
    print()
    print("| query | duckdb_sec | spark_sec | ratio |")
    print("|---|---|---|---|")
    tot_d = tot_s = 0.0
    n = 0
    for name, d, err in rows:
        if err is not None:
            print(f"| {name} | ERROR: {err} | | |")
            continue
        s = bench.get(name)
        if s is not None and s >= 0 and d is not None:
            tot_d += d
            tot_s += s
            n += 1
            print(f"| {name} | {d:.3f} | {s:.3f} | {s / max(d, 1e-9):.2f} |")
        else:
            print(f"| {name} | {d:.3f} | — | — |")
    print()
    print(f"**Totals over {n} oracle-paired queries: duckdb {tot_d:.1f} s, "
          f"spark {tot_s:.1f} s, ratio {tot_s / max(tot_d, 1e-9):.2f}x.**")
    print()
    print("Caveats: DuckDB runs one query at a time with no scheduler or")
    print("shuffle layer — it is the throughput target, not a distributed")
    print("equivalent. Spark's fixed ~0.1-0.3 s per-query driver overhead")
    print("dominates the many sub-second queries; the informative numbers")
    print("are the heavy queries and the total.")


if __name__ == "__main__":
    main()
