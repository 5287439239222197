#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Loads each <outDir>/<name> parquet dir (Spark output) and the matching
oracle SQL from <outDir>/oracle_sql.json via DuckDB over the same
parquet tables; compares after sorting columns by name and rows by all
columns. Reports PASS/FAIL per query.
"""
import json, sys, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps/dates -> iso strings, floats stay
    for c in df.columns:
        if str(df[c].dtype).startswith(('datetime', 'object')):
            df[c] = df[c].astype(str)
        elif str(df[c].dtype) in ('uint8','int8','int16','int32','uint32','uint64'):
            df[c] = df[c].astype('int64')
        elif str(df[c].dtype) == 'float32':
            df[c] = df[c].astype('float64')
        elif str(df[c].dtype) == 'bool':
            df[c] = df[c].astype('int64')
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ['region','nation','customer','supplier','part','orders',
              'lineitem','events','documents','embeddings']:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f'{out_dir}/oracle_sql.json'))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f'{out_dir}/{name}/*.parquet')
        if not files:
            print(f'FAIL {name}: no spark output'); n_fail += 1; continue
        try:
            got = norm(pd.read_parquet(f'{out_dir}/{name}'))
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f'FAIL {name}: {e}'); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f'FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}')
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f'FAIL {name}: rows {len(got)} vs {len(exp)}'); n_fail += 1; continue
        try:
            # check_dtype=True mirrors the driver: its hash is
            # representation-sensitive, so int64 vs float64 (e.g. DuckDB
            # HUGEINT promotion) must fail here too, not just on the driver.
            pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                          check_exact=True)
            print(f'PASS {name} ({len(got)} rows)'); n_pass += 1
        except AssertionError as e:
            # retry with tolerance to distinguish near-miss from wrong
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              rtol=1e-6, atol=1e-6)
                print(f'NEAR {name}: exact hash may fail! {str(e).splitlines()[0]}')
                n_fail += 1
            except AssertionError:
                print(f'FAIL {name}: {str(e).splitlines()[:3]}')
                n_fail += 1
    print(f'== {n_pass} pass, {n_fail} fail ==')
    sys.exit(1 if n_fail else 0)

if __name__ == '__main__':
    main()
