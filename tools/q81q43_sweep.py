#!/usr/bin/env python3
"""DuckDB half of the q81/q43 scale sweep: runs the committed oracle SQL
for q81_token_budget and q43_contamination against the K-replicated
parquet dirs Q81Q43Sweep wrote (warmup + min-of-2, fetchall action —
the bench_oracle.py methodology).

Usage: q81q43_sweep.py <verifyOutDir-with-oracle_sql.json> [K...]
"""
import json
import sys
import time

import duckdb

outdir = sys.argv[1]
ks = [int(k) for k in sys.argv[2:]] or [1, 4, 16]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

print("| K | docs | duckdb q81 s | duckdb q43 s |")
print("|---|---|---|---|")
for k in ks:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('/tmp/graftsweep/k{k}/documents.parquet/*.parquet')"
    )

    def run_once(sql):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return time.perf_counter() - t0

    times = {}
    for name in ("q81_token_budget", "q43_contamination"):
        sql = oracle[name]
        run_once(sql)  # warmup
        times[name] = min(run_once(sql), run_once(sql))
    print(
        f"| {k} | {5000 * k} | {times['q81_token_budget']:.2f} "
        f"| {times['q43_contamination']:.2f} |"
    )
    con.close()
