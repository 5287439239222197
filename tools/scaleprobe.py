#!/usr/bin/env python3
"""Generate a 10x-scaled copy of the relational test tables for the
sf0.1 -> sf1 scaling probe (BASELINE.md "survives 100x" evidence).

Usage: python3 tools/scaleprobe.py /root/testdata/sf0.1 .scale/sf1

Each fact/dimension table is replicated 10x with per-replica key
offsets large enough to keep every key namespace disjoint (join
fan-outs stay 1:1, exactly like real growth), and continuous value
columns get an i*1e-4 per-replica jitter so DISTINCT value counts
grow with the data — without it the exact-percentile family's
distinct-value pre-aggregation would hide the scale-up entirely.
nation/region stay fixed (dimensions don't grow with volume).
Timing-only data: no oracle runs against it.
"""
import os
import sys

import duckdb

REPLICAS = 10
OK, CK, SK, PK, UK = 10_000_000, 10_000_000, 10_000_000, 10_000_000, 10_000_000


def main():
    src, dst = sys.argv[1:3]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 8")

    def emit(table, select):
        out = f"{dst}/{table}.parquet"
        con.execute(
            f"COPY ({select}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows")

    def rep(table, exprs):
        cols = ", ".join(exprs)
        return (f"SELECT {cols} FROM read_parquet('{src}/{table}.parquet'), "
                f"range({REPLICAS}) t(i)")

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")

    cust_cols = [c for c in _cols(con, src, "customer")]
    emit("customer", rep("customer",
        [f"c_custkey + i*{CK} AS c_custkey" if c == "c_custkey" else c
         for c in cust_cols]))

    supp_cols = _cols(con, src, "supplier")
    emit("supplier", rep("supplier",
        [f"s_suppkey + i*{SK} AS s_suppkey" if c == "s_suppkey" else c
         for c in supp_cols]))

    part_cols = _cols(con, src, "part")
    emit("part", rep("part",
        [f"p_partkey + i*{PK} AS p_partkey" if c == "p_partkey" else c
         for c in part_cols]))

    ord_cols = _cols(con, src, "orders")
    emit("orders", rep("orders", [
        {"o_orderkey": f"o_orderkey + i*{OK} AS o_orderkey",
         "o_custkey": f"o_custkey + i*{CK} AS o_custkey",
         "o_totalprice": "o_totalprice + i*0.0001 AS o_totalprice",
         }.get(c, c) for c in ord_cols]))

    li_cols = _cols(con, src, "lineitem")
    emit("lineitem", rep("lineitem", [
        {"l_orderkey": f"l_orderkey + i*{OK} AS l_orderkey",
         "l_suppkey": f"l_suppkey + i*{SK} AS l_suppkey",
         "l_partkey": f"l_partkey + i*{PK} AS l_partkey",
         "l_extendedprice": "l_extendedprice + i*0.0001 AS l_extendedprice",
         }.get(c, c) for c in li_cols]))

    ev_cols = _cols(con, src, "events")
    emit("events", rep("events", [
        {"user_id": f"user_id + i*{UK} AS user_id",
         "event_id": f"event_id + i*{UK} AS event_id",
         "value": "value + i*0.0001 AS value",
         # source stores int64 nanos; DuckDB reads TIMESTAMP(NANOS) as
         # TIMESTAMP_NTZ and would re-type the column on write
         "ts": "epoch_ns(ts) AS ts",
         }.get(c, c) for c in ev_cols]))

    # documents: per-replica alphabet ROTATION (a bijection on texts).
    # Every token of every replica differs from every other replica's,
    # so shingle sets are fully decorrelated ACROSS replicas (a naive
    # 10x copy would make each doc 9 near-dups, exploding LSH buckets
    # quadratically — synthetic correlation real growth doesn't have),
    # while WITHIN a replica the dup/near-dup structure, token
    # frequencies, lengths and language signals are preserved exactly.
    az = "abcdefghijklmnopqrstuvwxyz"
    rot_cases = " ".join(
        f"WHEN {i} THEN translate(text, '{az}{az.upper()}', "
        f"'{az[i:]+az[:i]}{(az[i:]+az[:i]).upper()}')"
        for i in range(1, REPLICAS))
    doc_cols = _cols(con, src, "documents")
    emit("documents", rep("documents", [
        {"doc_id": f"doc_id + i*{UK} AS doc_id",
         "text": f"CASE i {rot_cases} ELSE text END AS text",
         }.get(c, c) for c in doc_cols]))

    # embeddings: deterministic per-replica, per-value jitter that
    # DECORRELATES replica copies (a constant shift would keep
    # cosine ~1 and explode similarity joins quadratically).
    emb_cols = _cols(con, src, "embeddings")
    emit("embeddings", rep("embeddings", [
        {"vec_id": f"vec_id + i*{UK} AS vec_id",
         "embedding": ("list_transform(embedding, x -> "
                       "CAST(x + 0.2*sin(37.0*x + i) AS FLOAT)) AS embedding"),
         }.get(c, c) for c in emb_cols]))


def _cols(con, src, table):
    return [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')").fetchall()]


if __name__ == "__main__":
    main()
