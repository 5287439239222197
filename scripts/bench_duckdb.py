#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query DuckDB column (r16 judge item #8:
the table had drifted across rounds — pins from r12-r14 mixed with
fresh headline sweeps). Times every oracleSql entry in DuckDB on the
same parquet the engine reads, min over N runs (N=6, dropped to 2 for
queries slower than 5 s — their variance is far below the gate's
resolution and a 70 s query at 6 runs is 7 minutes of wall for one
row).

Usage: python3 scripts/bench_duckdb.py <sfDir> <oracle_sql.json> <out.json>
"""
import json, sys, time
import duckdb


def main():
    sf_dir, oracle_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part',
              'orders', 'lineitem', 'events', 'documents', 'embeddings']:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_path))
    out = {}
    for name, sql in sorted(oracles.items()):
        times = []
        runs = 6
        i = 0
        while i < runs:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            times.append(dt)
            if dt > 5.0:
                runs = min(runs, 2)
            i += 1
        out[name] = min(times)
        print(f"{name}\t{out[name]:.3f}", flush=True)
    json.dump(out, open(out_path, 'w'), indent=0, sort_keys=True)
    print(f"== {len(out)} queries -> {out_path} ==")


if __name__ == '__main__':
    main()
